"""S2 URL-list source with a mocked fetcher (reference tests/test_cli.py:46-90
mocks its HTTP client the same way)."""

import pyarrow as pa

from ray_extract import payload as P
from ray_extract.derive import derive_flat


def _corpus() -> dict[str, bytes]:
    return {
        f"https://cdn.example.org/{d}.spdf": P.encode(
            derive_flat(d, " ".join(f"w{d}_{j}" for j in range(30)))
        )
        for d in ("a", "b", "c")
    }


def test_read_url_list_fetches_and_extracts(ray_session):
    from ray_extract.pipelines.extract import ExtractConfig, extract_from_payloads
    from ray_extract.sources.urls import read_url_list

    corpus = _corpus()

    def factory():
        return lambda url: corpus[url]

    ds = read_url_list(
        [(d, f"https://cdn.example.org/{d}.spdf") for d in ("a", "b", "c")],
        fetcher_factory=factory,
    )
    out = extract_from_payloads(ds, ExtractConfig()).to_pandas()
    assert sorted(out.doc_id) == ["a", "b", "c"]
    assert (out.status == "ok").all()
    assert (out.n_text_blocks > 0).all()


def test_url_fetch_transient_faults_retry(ray_session):
    from ray_extract.sources.urls import read_url_list

    corpus = _corpus()

    def flaky_factory():
        attempts: dict[str, int] = {}

        def fetch(url: str) -> bytes:
            attempts[url] = attempts.get(url, 0) + 1
            if attempts[url] < 3:
                raise ConnectionError("transient")
            return corpus[url]

        return fetch

    ds = read_url_list(
        [("a", "https://cdn.example.org/a.spdf")],
        fetcher_factory=flaky_factory,
        max_retries=3,
        concurrency=1,
    )
    rows = ds.take_all()
    assert rows[0]["payload"] == corpus["https://cdn.example.org/a.spdf"]


def test_url_fetch_permanent_failure_dead_letters_downstream(ray_session):
    from ray_extract.pipelines.extract import ExtractConfig, extract_from_payloads
    from ray_extract.sources.urls import read_url_list

    corpus = _corpus()

    def factory():
        def fetch(url: str) -> bytes:
            if url.endswith("b.spdf"):
                raise ConnectionError("404")
            return corpus[url]

        return fetch

    ds = read_url_list(
        [(d, f"https://cdn.example.org/{d}.spdf") for d in ("a", "b")],
        fetcher_factory=factory,
        concurrency=1,
    )
    out = extract_from_payloads(ds, ExtractConfig()).to_pandas().set_index("doc_id")
    assert out.loc["a", "status"] == "ok"
    assert out.loc["b", "status"] == "error"
