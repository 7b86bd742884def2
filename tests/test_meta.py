"""ParserOutput identity/metadata surface (M7: reference run.py:51-79,
convert.py:261-268,302-324)."""

import pyarrow as pa

from ray_extract import payload as P
from ray_extract.derive import derive_flat, derive_metadata
from ray_extract.stages.convert import make_convert_stage
from ray_extract.stages.decode import decode_stage
from ray_extract.stages.merge import merge_group
from ray_extract.stages.parse import LayoutParser
from ray_extract.stages.split import make_split_stage


def _run(batch: pa.Table) -> pa.Table:
    out = LayoutParser()(make_split_stage(2, 2)(decode_stage(batch)))
    return make_convert_stage(True)(merge_group(out))


def _one_doc_batch(meta_overrides: dict | None = None) -> pa.Table:
    text = " ".join(f"w{j}" for j in range(50))
    meta = derive_metadata("src", 1)
    meta.update(meta_overrides or {})
    cols = {
        "doc_id": pa.array(["src.1"]),
        "payload": pa.array([P.encode(derive_flat("src.1", text))], type=pa.large_binary()),
    }
    for k, v in meta.items():
        cols[k] = pa.array([v], type=pa.string())
    return pa.table(cols)


def test_metadata_passthrough():
    out = _run(_one_doc_batch())
    row = out.to_pylist()[0]
    assert row["status"] == "ok"
    assert row["document_name"] == "Document src.1"
    assert row["document_description"] == "Synthetic document src.1"
    assert row["source_url"] == "https://docs.example.org/src/1"
    assert row["cdn_object"] == "corpus/src.1.pdf"
    assert row["content_type"] == "application/pdf"
    assert row["slug"] == "src-1"
    assert row["translated"] is False
    assert row["html_data"] is None
    assert row["n_text_blocks"] > 0


def test_invalid_cdn_object_dead_letters():
    # reference convert.py:261-268: cdn_object must end in .pdf
    out = _run(_one_doc_batch({"cdn_object": "corpus/src.1.docx"}))
    row = out.to_pylist()[0]
    assert row["status"] == "error"
    assert "invalid document_cdn_object" in row["error"]
    assert row["n_text_blocks"] == 0
    assert row["text_blocks"] == []
    # metadata still rides the dead-letter row (error metrics keep identity)
    assert row["document_name"] == "Document src.1"


def test_missing_metadata_is_nulls_not_failure():
    text = " ".join(f"w{j}" for j in range(30))
    batch = pa.table(
        {
            "doc_id": pa.array(["d"]),
            "payload": pa.array([P.encode(derive_flat("d", text))], type=pa.large_binary()),
        }
    )
    out = _run(batch)
    row = out.to_pylist()[0]
    assert row["status"] == "ok"
    assert row["cdn_object"] is None
    assert row["document_name"] is None


def test_null_cdn_passes_payload_only_mode():
    """A null cdn_object (payload-only pipeline) is not an error — only a
    PRESENT non-.pdf value trips the conversion check."""
    batch = _one_doc_batch()
    batch = batch.set_column(
        batch.schema.get_field_index("cdn_object"),
        "cdn_object",
        pa.nulls(1, type=pa.string()),
    )
    out = _run(batch)
    assert out.to_pylist()[0]["status"] == "ok"
