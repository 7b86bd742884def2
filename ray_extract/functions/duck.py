"""A per-worker-process DuckDB connection for vectorized SQL kernels.

Some kernels (minhash signatures) need millions of md5 digests of SHORT
strings per batch; hashlib pays ~1 us of Python overhead per call, which made
minhash the second-slowest bench stage. DuckDB computes the same md5() over an
Arrow table in C++ at memory speed — and because the oracle SQL uses DuckDB's
md5() too, value parity is definitional.

The connection is created lazily once per worker process (module cache) and
pinned to ONE thread: parallelism comes from Ray's task/actor scheduling, and
an unpinned DuckDB would oversubscribe the node (32 tasks x 32 threads).
"""

from __future__ import annotations

_CON = None


def duck():
    global _CON
    if _CON is None:
        import duckdb

        _CON = duckdb.connect()
        _CON.execute("SET threads=1")
    return _CON
