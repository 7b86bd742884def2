"""Deterministic hashing primitives shared by dedup / fingerprint pipelines.

Every hash here is reproducible in ANSI SQL (DuckDB) so the corresponding
pipelines keep exact oracles:

- ``rolling31`` / ``hash62``: polynomial rolling hash over character codes,
  modulus 2^31-1 (keeps every intermediate product < 2^51, safe in int64 on
  both sides). hash62 combines two multipliers into a 62-bit value.
- ``md5_str``: hex md5 (DuckDB ``md5()``); minhash signatures compare md5 hex
  strings lexicographically, which is identical in Python and SQL.
"""

from __future__ import annotations

import hashlib
from typing import Sequence

import numpy as np

MOD31 = (1 << 31) - 1
MULT_A = 1000003
MULT_B = 999983


def rolling31(s: str, mult: int) -> int:
    h = 0
    for ch in s:
        h = (h * mult + ord(ch)) % MOD31
    return h


def hash62(s: str) -> int:
    return rolling31(s, MULT_A) * (1 << 31) + rolling31(s, MULT_B)


def md5_str(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


# ------------------------------------------------------- vectorized kernels
# The scalar forms above are the SPECIFICATION (and what the DuckDB oracles
# mirror); the batch forms below compute identical values with numpy — the
# per-character/per-token Python loops were the dominant cost of the dedup
# and fingerprint stages (hypothesis parity tests pin scalar == batch).

_POW_CACHE: dict[int, np.ndarray] = {}


def _pows(mult: int, n: int) -> np.ndarray:
    """[mult^0, mult^1, ..., mult^(n-1)] mod 2^31-1 (cached, grown on demand)."""
    cur = _POW_CACHE.get(mult)
    if cur is None or len(cur) < n:
        size = max(n, 1024, 0 if cur is None else 2 * len(cur))
        out = np.empty(size, dtype=np.int64)
        out[0] = 1
        start = 1
        if cur is not None:
            out[: len(cur)] = cur
            start = len(cur)
        for i in range(start, size):
            out[i] = (out[i - 1] * mult) % MOD31
        _POW_CACHE[mult] = out
        cur = out
    return cur


def _codes_segments(strs: Sequence[str]) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Concatenated UTF-32 codepoints + per-string (start, length) segments."""
    n = len(strs)
    lens = np.fromiter((len(s) for s in strs), dtype=np.int64, count=n)
    joined = "".join(strs)
    codes = np.frombuffer(joined.encode("utf-32-le"), dtype="<u4").astype(np.int64)
    starts = np.zeros(n, dtype=np.int64)
    if n > 1:
        np.cumsum(lens[:-1], out=starts[1:])
    return codes, starts, lens


def _rolling31_segments(
    codes: np.ndarray, starts: np.ndarray, lens: np.ndarray, mult: int
) -> np.ndarray:
    """rolling31 of each segment: h_i = sum_j code_j * mult^(end_i-1-j) mod p.

    Every product is < 2^21 * 2^31 = 2^52 (int64-safe); terms are reduced mod
    p BEFORE the segment sum so sums of arbitrarily long documents stay exact.
    """
    n = len(starts)
    if codes.size == 0:
        return np.zeros(n, dtype=np.int64)
    ends = starts + lens
    exp = np.repeat(ends - 1, lens) - np.arange(codes.size, dtype=np.int64)
    terms = (codes * _pows(mult, int(lens.max()))[exp]) % MOD31
    # sentinel-extended reduceat: empty segments index the appended 0
    terms = np.append(terms, np.int64(0))
    sums = np.add.reduceat(terms, np.minimum(starts, terms.size - 1))
    sums[lens == 0] = 0
    return sums % MOD31


def rolling31_batch(strs: Sequence[str], mult: int) -> np.ndarray:
    """Vectorized ``rolling31`` over a batch of strings (int64 array)."""
    return _rolling31_segments(*_codes_segments(strs), mult)


def hash62_batch(strs: Sequence[str]) -> np.ndarray:
    """Vectorized ``hash62``: one codepoint pass, both multipliers."""
    codes, starts, lens = _codes_segments(strs)
    a = _rolling31_segments(codes, starts, lens, MULT_A)
    b = _rolling31_segments(codes, starts, lens, MULT_B)
    return a * (1 << 31) + b


def simhash32_batch(texts: Sequence[str]) -> np.ndarray:
    """Vectorized ``simhash32``: one flat token array for the whole batch,
    hash62 on the DISTINCT tokens only, then per-document per-bit vote sums
    via a single 2D segment reduction (tf weighting falls out of summing over
    occurrences)."""
    ndoc = len(texts)
    if ndoc == 0:
        return np.zeros(0, dtype=np.int64)
    tok_lists = [t.split(" ") for t in texts]
    counts = np.fromiter((len(tl) for tl in tok_lists), dtype=np.int64, count=ndoc)
    flat: list[str] = []
    for tl in tok_lists:
        flat.extend(tl)
    uniq, inv = np.unique(np.array(flat, dtype=object), return_inverse=True)
    h_occ = hash62_batch(list(uniq))[inv]
    signs = (((h_occ[:, None] >> np.arange(32, dtype=np.int64)) & 1) * 2 - 1)
    starts = np.zeros(ndoc, dtype=np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    # str.split(" ") never returns an empty list, so every segment is nonempty
    votes = np.add.reduceat(signs, starts, axis=0)
    return ((votes > 0) * (np.int64(1) << np.arange(32, dtype=np.int64))).sum(axis=1)


def simhash32(text: str) -> int:
    """32-bit simhash over whitespace tokens weighted by term frequency.

    Bit k of the signature is set when the tf-weighted majority of token-hash
    bits k is positive (strictly greater than zero).
    """
    counts: dict[str, int] = {}
    for w in text.split(" "):
        counts[w] = counts.get(w, 0) + 1
    votes = [0] * 32
    for w, c in counts.items():
        h = hash62(w)
        for k in range(32):
            votes[k] += c if (h >> k) & 1 else -c
    sig = 0
    for k in range(32):
        if votes[k] > 0:
            sig |= 1 << k
    return sig


def word_shingles(text: str, k: int = 3) -> set[str]:
    """Distinct k-word shingles (space-joined)."""
    ws = text.split(" ")
    return {" ".join(ws[i : i + k]) for i in range(len(ws) - k + 1)}


def minhash_signature(shingles: set[str], num_perm: int = 16) -> list[str]:
    """num_perm md5-based min-hashes, compared as lowercase hex STRINGS
    (lexicographic min == DuckDB ``min(md5(...))``)."""
    return [
        min(md5_str(f"{j}:{s}") for s in shingles) if shingles else ""
        for j in range(num_perm)
    ]


def lsh_bands(sig: list[str], band_rows: int = 4) -> list[str]:
    """Band signatures: md5 of the '|'-joined row hashes of each band."""
    return [
        md5_str("|".join(sig[b : b + band_rows]))
        for b in range(0, len(sig), band_rows)
    ]
