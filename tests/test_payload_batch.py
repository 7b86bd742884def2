"""validate_batch (the vectorized decode-stage validator) must agree with
validate_deep (the per-document reference form) on arbitrary corruption."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from ray_extract import payload as P
from ray_extract.derive import derive_flat


def _base(tag: str, n_words: int = 60) -> bytes:
    return P.encode(derive_flat(tag, " ".join(f"w{i}" for i in range(n_words))))


def test_batch_matches_deep_on_valid_docs():
    raws = [_base(f"d{i}", 30 + 7 * i) for i in range(5)]
    reasons, n_pages = P.validate_batch(raws)
    assert reasons == [""] * 5
    for r, npg in zip(raws, n_pages):
        assert P.validate_deep(r) == ""
        assert npg == P.peek_counts(r)[0]


@settings(max_examples=120, deadline=None)
@given(
    st.integers(min_value=0, max_value=4000),
    st.binary(min_size=1, max_size=16),
    st.integers(min_value=0, max_value=4),
)
def test_batch_matches_deep_on_fuzzed(pos, junk, slot):
    """Corrupt one document in a 5-doc batch: validity verdicts (and the
    clean documents' reasons) must match validate_deep exactly."""
    raws = [_base(f"d{i}", 40 + 9 * i) for i in range(5)]
    base = bytearray(raws[slot])
    pos = pos % len(base)
    raws[slot] = bytes(base[:pos]) + junk + bytes(base[pos + len(junk):])
    reasons, n_pages = P.validate_batch(raws)
    for i, raw in enumerate(raws):
        deep = P.validate_deep(raw)
        assert (reasons[i] == "") == (deep == ""), (i, reasons[i], deep)
        if reasons[i] == "":
            assert n_pages[i] == P.peek_counts(raw)[0]


@settings(max_examples=40, deadline=None)
@given(st.data())
def test_batch_matches_deep_all_corrupted(data):
    raws = []
    for i in range(3):
        b = bytearray(_base(f"c{i}", 50))
        pos = data.draw(st.integers(min_value=0, max_value=len(b) - 1))
        junk = data.draw(st.binary(min_size=1, max_size=8))
        raws.append(bytes(b[:pos]) + junk + bytes(b[pos + len(junk):]))
    reasons, _ = P.validate_batch(raws)
    for raw, reason in zip(raws, reasons):
        assert (reason == "") == (P.validate_deep(raw) == "")
