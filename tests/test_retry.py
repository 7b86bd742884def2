"""Retry policy (reference F5: utils.py:18-32, tests/test_utils.py:19-48).

Fault-injection: a parser that fails transiently must, under the bounded
retry, produce byte-identical output to a healthy parser; a parser that
fails permanently must dead-letter the document (the reference silently
drops it) without poisoning the batch.
"""

import hashlib

import pyarrow as pa
import pytest

from ray_extract import payload as P
from ray_extract.derive import derive_flat
from ray_extract.functions.retry import call_with_retries
from ray_extract.stages.decode import decode_stage
from ray_extract.stages.parse import LayoutParser
from ray_extract.stages.split import make_split_stage


def test_call_with_retries_first_try():
    calls = []
    assert call_with_retries(lambda: calls.append(1) or 7) == 7
    assert len(calls) == 1


def test_call_with_retries_succeeds_after_transient_failures():
    # reference tests/test_utils.py:19-48: mock fails twice, succeeds third
    attempts = []

    def flaky():
        attempts.append(1)
        if len(attempts) < 3:
            raise RuntimeError("transient")
        return "ok"

    assert call_with_retries(flaky, max_retries=3) == "ok"
    assert len(attempts) == 3


def test_call_with_retries_exhausted_reraises():
    attempts = []

    def dead():
        attempts.append(1)
        raise ValueError("permanent")

    with pytest.raises(ValueError, match="permanent"):
        call_with_retries(dead, max_retries=3)
    assert len(attempts) == 3


def test_call_with_retries_non_retryable_propagates_immediately():
    attempts = []

    def typed():
        attempts.append(1)
        raise KeyError("not transient")

    with pytest.raises(KeyError):
        call_with_retries(typed, max_retries=3, retry_exceptions=(ValueError,))
    assert len(attempts) == 1


def _front_batch(n_docs: int = 4) -> pa.Table:
    docs = [
        (f"d{i}", " ".join(f"w{i}_{j}" for j in range(40 + 10 * i)))
        for i in range(n_docs)
    ]
    batch = pa.table(
        {
            "doc_id": pa.array([d for d, _ in docs]),
            "payload": pa.array(
                [P.encode(derive_flat(d, t)) for d, t in docs], type=pa.large_binary()
            ),
        }
    )
    return make_split_stage(2, 2)(decode_stage(batch))


def test_parser_transient_faults_yield_identical_output():
    """Kill the parse attempt twice per document; the retried output must be
    byte-identical to a healthy parser's."""
    front = _front_batch()
    healthy = LayoutParser()(front)

    counts: dict[str, int] = {}

    def flaky(raw: bytes):
        key = hashlib.md5(raw).hexdigest()
        counts[key] = counts.get(key, 0) + 1
        if counts[key] <= 2:
            raise RuntimeError("simulated transient fault")
        return P.decode(raw)

    retried = LayoutParser(max_retries=3, parse_fn=flaky)(front)
    assert retried.equals(healthy)
    assert all(v == 3 for v in counts.values())


def test_parser_permanent_failure_dead_letters_not_poisons():
    front = _front_batch()

    def dead(raw: bytes):
        raise RuntimeError("permanently broken")

    out = LayoutParser(max_retries=3, parse_fn=dead)(front)
    assert set(out.column("status").to_pylist()) == {"error"}
    assert all(
        "parse failed after 3 attempts" in e for e in out.column("error").to_pylist()
    )
    # dead-letter rows still flow through merge + convert without crashing
    from ray_extract.stages.convert import make_convert_stage
    from ray_extract.stages.merge import merge_group

    final = make_convert_stage(True)(merge_group(out))
    assert set(final.column("status").to_pylist()) == {"error"}


def test_error_driven_split_fallback_matches_healthy_output():
    """F4 (reference run.py:27-39): a kernel with a page limit fails the
    WHOLE document but succeeds per page-range shard. The fallback must
    slice in-kernel, parse each shard, and after merge + convert produce
    the same document the healthy whole parse produces."""
    from ray_extract.stages.convert import make_convert_stage
    from ray_extract.stages.merge import merge_bucket

    docs = [
        ("big", " ".join(f"alpha{j} beta{j}" for j in range(300))),
        ("small", "tiny document with a few words only"),
    ]
    batch = pa.table(
        {
            "doc_id": pa.array([d for d, _ in docs]),
            "payload": pa.array(
                [P.encode(derive_flat(d, t)) for d, t in docs],
                type=pa.large_binary(),
            ),
        }
    )
    big_pages = len(derive_flat("big", docs[0][1])["pages"])
    assert big_pages >= 3  # must exceed the kernel's 2-page limit
    # threshold high enough that NO doc is metadata-split: the only way the
    # big doc parses is the error-driven fallback
    front = make_split_stage(99, 99)(decode_stage(batch))
    assert front.column("n_shards").to_pylist() == [1, 1]

    attempts = {"whole": 0}

    def size_limited(raw: bytes):
        flat = P.decode(raw)
        if len(flat["pages"]) > 2:
            attempts["whole"] += 1
            raise RuntimeError("payload exceeds page limit")
        return flat

    parser = LayoutParser(max_retries=2, parse_fn=size_limited,
                          fallback_batch_pages=2)
    out = parser(front)
    # the big doc expanded into ceil(P/2) shard rows, every one parsed ok
    assert set(out.column("status").to_pylist()) == {"ok"}
    by_doc = dict(
        zip(out.column("doc_id").to_pylist(), out.column("n_shards").to_pylist())
    )
    assert by_doc["small"] == 1
    assert by_doc["big"] == -(-big_pages // 2)
    assert attempts["whole"] == 2  # whole parse was retried, then gave up

    got = make_convert_stage(True)(merge_bucket(out)).sort_by("doc_id")
    healthy = make_convert_stage(True)(
        merge_bucket(LayoutParser()(front))
    ).sort_by("doc_id")
    assert got.equals(healthy)


def test_split_fallback_disabled_dead_letters():
    """With split_fallback off, the same size-limited kernel dead-letters the
    big document instead of recovering it."""
    docs = [("big", " ".join(f"alpha{j} beta{j}" for j in range(300)))]
    batch = pa.table(
        {
            "doc_id": pa.array([d for d, _ in docs]),
            "payload": pa.array(
                [P.encode(derive_flat(d, t)) for d, t in docs],
                type=pa.large_binary(),
            ),
        }
    )
    front = make_split_stage(99, 99)(decode_stage(batch))

    def size_limited(raw: bytes):
        flat = P.decode(raw)
        if len(flat["pages"]) > 2:
            raise RuntimeError("payload exceeds page limit")
        return flat

    out = LayoutParser(max_retries=2, parse_fn=size_limited,
                       split_fallback=False)(front)
    assert out.column("status").to_pylist() == ["error"]
    assert "page limit" in out.column("error").to_pylist()[0]


def test_parser_partial_failure_affects_only_the_broken_doc():
    front = _front_batch()

    def selective(raw: bytes):
        flat = P.decode(raw)
        if len(flat["paras"]) % 2 == 1:
            raise RuntimeError("bad doc")
        return flat

    out = LayoutParser(max_retries=2, parse_fn=selective)(front)
    statuses = set(out.column("status").to_pylist())
    assert statuses == {"ok", "error"}
