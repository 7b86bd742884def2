"""S2: URL-list source — fetch documents by URL into (doc_id, payload) rows.

Reference surface: ``run.py:131-137`` (parse --input-urls list) +
``azure_wrapper.py:74-81`` (per-document fetch with an injectable, mockable
HTTP client; e2e-tested with mocks at ``tests/test_cli.py:46-90``).

Ray-Data-native shape: the URL list is a small manifest Dataset
(``from_items`` or a parquet manifest read); the fetch is a stateful
actor-pool ``map_batches`` stage — the warm HTTP session/connection pool is
built once per actor in ``__init__`` (the reference's client-reuse pattern),
and each fetch is wrapped in the bounded retry policy
(``functions/retry.call_with_retries``). A URL whose fetch exhausts its
retries yields an EMPTY payload row, which the downstream decode stage
dead-letters (status="error") — documents are never silently dropped.

The default fetcher uses stdlib urllib (no third-party HTTP dependency); in
network-less environments inject a ``fetcher_factory`` (tests do exactly what
the reference's mocked client does).
"""

from __future__ import annotations

from typing import Callable, Iterable, Optional

import pyarrow as pa

from ..functions.retry import call_with_retries


def default_fetcher_factory() -> Callable[[str], bytes]:
    """Build a warm urllib-based fetcher (one opener per actor)."""
    import urllib.request

    opener = urllib.request.build_opener()

    def fetch(url: str) -> bytes:
        with opener.open(url, timeout=30) as resp:
            if getattr(resp, "status", 200) >= 400:
                raise RuntimeError(f"HTTP {resp.status} for {url}")
            return resp.read()

    return fetch


class UrlFetcher:
    """Actor-pool fetch stage: (doc_id, url) batches -> (doc_id, payload)."""

    def __init__(self, fetcher_factory=None, max_retries: int = 3):
        # warm per-actor state: the HTTP session/opener, built once
        self.fetch = (fetcher_factory or default_fetcher_factory)()
        self.max_retries = max_retries

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads: list[bytes] = []
        for url in batch.column("url").to_pylist():
            try:
                payloads.append(
                    call_with_retries(self.fetch, url, max_retries=self.max_retries)
                )
            except Exception:
                # retries exhausted: empty payload -> decode dead-letters it
                payloads.append(b"")
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "payload": pa.array(payloads, type=pa.large_binary()),
            }
        )


def read_url_list(
    urls: Iterable[tuple[str, str]],
    fetcher_factory: Optional[Callable[[], Callable[[str], bytes]]] = None,
    concurrency: int = 2,
    max_retries: int = 3,
    batch_size: int = 64,
):
    """URL manifest -> Dataset[(doc_id, payload)].

    ``urls``: iterable of (doc_id, url) pairs (the reference's --input-urls
    list). For very large manifests, build the manifest Dataset with
    ``read_parquet`` and apply ``UrlFetcher`` with ``map_batches`` directly.
    """
    import ray.data as rd

    ds = rd.from_items([{"doc_id": d, "url": u} for d, u in urls])
    return ds.map_batches(
        UrlFetcher,
        fn_constructor_kwargs={
            "fetcher_factory": fetcher_factory,
            "max_retries": max_retries,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
