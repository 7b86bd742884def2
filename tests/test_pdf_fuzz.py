"""Adversarial real-PDF hardening: every mutated byte string must flow
through decode -> split/parse -> convert and come out as a STATUS ROW
(ok or dead-lettered with a reason) — never an exception escaping the
stages. Reference semantics are silently-drop on any parse failure
(/root/reference/src/azure_pdf_parser/run.py:38-39); this engine keeps the
document as an error row with an actionable reason instead.

23 mutation classes x the reference's two committed PDFs, all run through
ONE extract_from_payloads pass (plus per-row decode_stage checks)."""

import pytest

PDFS = {
    "one": "/root/reference/tests/data/sample-one-page.pdf",
    "two": "/root/reference/tests/data/sample-two-page.pdf",
}


def _read(path):
    with open(path, "rb") as f:
        return f.read()


def _replace_first(data, old, new):
    i = data.find(old)
    return data if i < 0 else data[:i] + new + data[i + len(old):]


# name -> (mutator, must_dead_letter). must_dead_letter=None means the
# variant MAY legitimately still parse (e.g. trailing garbage — readers
# resolve startxref from the tail); the invariant is then only "no crash,
# status is ok|error and error rows carry a reason".
MUTATIONS = {
    "truncate_half": (lambda d: d[: len(d) // 2], True),
    "truncate_tail": (lambda d: d[:-20], None),
    "empty": (lambda d: b"", True),
    "magic_only": (lambda d: b"%PDF-1.7\n", True),
    "bad_magic": (lambda d: b"\xff" + d[1:], True),
    "version_2": (lambda d: b"%PDF-2.0" + d[8:], True),  # sniff wants %PDF-1.
    "zero_startxref": (
        lambda d: d[: d.rfind(b"startxref")] + b"startxref\n0\n%%EOF\n",
        None,
    ),
    "huge_startxref": (
        lambda d: d[: d.rfind(b"startxref")]
        + b"startxref\n99999999\n%%EOF\n",
        True,
    ),
    "strip_eof": (lambda d: d.replace(b"%%EOF", b"     "), None),
    "corrupt_stream_body": (
        lambda d: _corrupt_after(d, b"stream", 64),
        None,
    ),
    # pdfio.PdfReader refuses encrypted PDFs up front (substring check), so
    # injecting the marker anywhere guarantees a clean dead-letter reason
    "encrypt_marker": (
        lambda d: _replace_first(d, b"obj", b"obj/Encrypt"),
        True,
    ),
    # readers may recover the page tree via fallback scans, so this one is
    # allowed to parse — the invariant is no-crash either way
    "no_pages_type": (lambda d: d.replace(b"/Pages", b"/Pagez"), None),
    "bitflip_sparse": (
        lambda d: bytes(
            b ^ (0x40 if i % 997 == 0 else 0) for i, b in enumerate(d)
        ),
        None,
    ),
    "null_block_mid": (
        lambda d: d[: len(d) // 2] + b"\x00" * 50 + d[len(d) // 2 + 50:],
        None,
    ),
    "doubled_body": (lambda d: d + d, None),
    "leading_garbage": (lambda d: b"GARBAGEGARBAGE" + d, True),  # magic sniff
    "trailing_garbage": (lambda d: d + b"\x00garbage" * 64, None),
    "halves_swapped": (
        lambda d: d[len(d) // 2:] + d[: len(d) // 2],
        True,
    ),
    "corrupt_first_obj": (lambda d: _corrupt_after(d, b" obj", 16), None),
    "negative_count": (
        lambda d: _replace_first(
            _replace_first(d, b"/Count 2", b"/Count -5"),
            b"/Count 1", b"/Count -5",
        ),
        None,
    ),
    "huge_count": (
        lambda d: _replace_first(
            _replace_first(d, b"/Count 2", b"/Count 999999"),
            b"/Count 1", b"/Count 999999",
        ),
        None,
    ),
    "xref_word_gone": (lambda d: d.replace(b"xref", b"xrof"), None),
    "obj_to_endobj": (lambda d: _replace_first(d, b" obj", b" endobj"), None),
}


def _corrupt_after(data, marker, n):
    i = data.find(marker)
    if i < 0:
        return data
    j = i + len(marker) + 2
    return data[:j] + bytes((b ^ 0xA5) for b in data[j : j + n]) + data[j + n:]


def _mutants():
    out = []
    for pname, path in PDFS.items():
        base = _read(path)
        for mname, (fn, must_fail) in MUTATIONS.items():
            out.append((f"{pname}:{mname}", fn(base), must_fail))
    return out


def test_mutation_classes_cover_requirement():
    assert len(MUTATIONS) >= 20


@pytest.mark.parametrize("doc_id,payload,must_fail",
                         _mutants(),
                         ids=[m[0] for m in _mutants()])
def test_decode_stage_never_raises(doc_id, payload, must_fail):
    """Stage-level: decode_stage classifies every mutant without raising."""
    import pyarrow as pa

    from ray_extract.stages.decode import decode_stage

    batch = pa.table(
        {
            "doc_id": pa.array([doc_id]),
            "payload": pa.array([payload], type=pa.large_binary()),
        }
    )
    out = decode_stage(batch)
    status = out.column("status").to_pylist()[0]
    error = out.column("error").to_pylist()[0]
    assert status in ("ok", "error")
    if status == "error":
        assert error  # dead-letter carries a reason
    if must_fail:
        assert status == "error", f"{doc_id} should have dead-lettered"


@pytest.mark.usefixtures("ray_session")
def test_full_pipeline_dead_letters_all_mutants():
    """End-to-end: every mutant through extract_from_payloads in one run —
    no exception out of LayoutParser.__call__ or any stage; every row
    lands ok or dead-lettered with a reason; the guaranteed-invalid
    classes are all dead-lettered; the two pristine controls still parse."""
    import pyarrow as pa

    from ray_extract.pipelines.extract import ExtractConfig, extract_from_payloads

    rows = _mutants()
    ids = [r[0] for r in rows] + ["control:one", "control:two"]
    payloads = [r[1] for r in rows] + [_read(PDFS["one"]), _read(PDFS["two"])]
    must_fail = {r[0] for r in rows if r[2]}

    import ray.data as rd

    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(ids),
                "payload": pa.array(payloads, type=pa.large_binary()),
            }
        )
    )
    out = extract_from_payloads(ds, ExtractConfig()).to_pandas()
    assert set(out["doc_id"]) == set(ids)  # nothing silently vanished
    assert set(out["status"]) <= {"ok", "error"}
    bad = out[out["status"] == "error"]
    assert (bad["error"].str.len() > 0).all()
    for did in must_fail:
        assert (
            out.loc[out["doc_id"] == did, "status"] == "error"
        ).all(), f"{did} should have dead-lettered"
    for did in ("control:one", "control:two"):
        assert (out.loc[out["doc_id"] == did, "status"] == "ok").all()
