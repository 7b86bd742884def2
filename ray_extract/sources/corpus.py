"""Corpus source abstraction: Lance in production, parquet in this sandbox.

The target deployment reads the interleaved text+media document table with
``ray.data.read_lance`` (column projection + fragment-level parallelism, and
fragment ids become checkpoint-partition lineage). The ``lance`` package is
not installed in this container, so the reader falls back to parquet with the
same interface; everything downstream is format-agnostic (a Dataset of
``doc_id, payload, n_pages``).
"""

from __future__ import annotations

from typing import Optional


def have_lance() -> bool:
    try:
        import lance  # noqa: F401

        return True
    except ImportError:
        return False


def read_corpus(
    path: str,
    columns: Optional[list[str]] = None,
    filter_expr=None,
):
    """Read a document corpus (Lance dataset dir or parquet dir/files)."""
    import ray.data as rd

    columns = columns or ["doc_id", "payload", "n_pages"]
    if path.endswith(".lance") or _is_lance_dir(path):
        # BEST-EFFORT branch: `lance` is not installed in this sandbox, so
        # this path has never run against a real Lance dataset. The contract
        # it must honor is pinned by tests/test_io_and_entry.py's
        # read_corpus contract tests on the parquet backend: same column
        # projection, same filter semantics, same output schema.
        if not have_lance():
            raise RuntimeError(
                f"{path!r} looks like a Lance dataset but the 'lance' "
                "package is not installed — install pylance, or convert "
                "the corpus to parquet"
            )
        ds = rd.read_lance(path, columns=columns)
        if filter_expr is not None:
            # lance pushdown goes through scanner options; post-filter here
            ds = ds.filter(expr=str(filter_expr))
        return ds
    return rd.read_parquet(path, columns=columns, filter=filter_expr)


def _is_lance_dir(path: str) -> bool:
    import os

    return os.path.isdir(path) and any(
        name.endswith(".lance") or name == "_versions" for name in os.listdir(path)
    )
