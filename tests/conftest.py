"""Session-scoped Ray fixture: init ONCE per pytest session."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray
    from ray.data import DataContext

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    # keep nested list columns as plain objects in pandas conversions
    ctx.enable_tensor_extension_casting = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def edge_payloads():
    from ray_extract.fixtures import edge_corpus

    return edge_corpus()


@pytest.fixture(scope="session")
def sf_docs():
    """(doc_id, source, text) rows from the smallest driver table."""
    import duckdb

    return duckdb.sql(
        "select doc_id, source, text from '/root/testdata/sf0.001/documents.parquet' order by doc_id"
    ).fetchall()
