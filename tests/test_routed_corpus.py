"""Pre-routed corpus layout (small/ + large/ subdirs) must produce output
identical to the flat layout's filtered-read topology."""

import glob
import os

import pandas as pd


def _run_job(corpus, out, tmp_path):
    from ray_extract.job import run_extract_job
    from ray_extract.pipelines.extract import ExtractConfig

    cfg = ExtractConfig(split_threshold_pages=4, split_batch_pages=4)
    run_extract_job(str(corpus), str(out), cfg, partitions_per_branch=1, resume=False)
    import pyarrow.dataset as pads

    files = [
        f for f in glob.glob(os.path.join(str(out), "**", "*.parquet"), recursive=True)
    ]
    t = pads.dataset(files).to_table(columns=["doc_id", "status", "n_text_blocks"])
    return (
        t.to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def test_pre_routed_layout_matches_flat(ray_session, tmp_path):
    from ray_extract.sources.synth import materialize_corpus

    docs = "/root/testdata/sf0.001/documents.parquet"
    flat = tmp_path / "flat"
    routed = tmp_path / "routed"
    materialize_corpus(docs, str(flat), num_files=4)
    materialize_corpus(docs, str(routed), num_files=4, route_threshold_pages=4)

    assert os.path.isdir(routed / "small") and os.path.isdir(routed / "large")
    out_flat = _run_job(flat, tmp_path / "out_flat", tmp_path)
    out_routed = _run_job(routed, tmp_path / "out_routed", tmp_path)
    pd.testing.assert_frame_equal(out_flat, out_routed)
    assert len(out_flat) == 500


def test_extract_routed_agrees_with_streaming_job(ray_session, tmp_path):
    """extract_routed (materializing, gate/test entrypoint) and
    run_extract_job (streaming production entrypoint) must produce the same
    rows over the same corpus."""
    from ray_extract.pipelines.extract import ExtractConfig, extract_routed
    from ray_extract.sources.synth import materialize_corpus

    docs = "/root/testdata/sf0.001/documents.parquet"
    corpus = tmp_path / "corpus"
    materialize_corpus(docs, str(corpus), num_files=4)
    cfg = ExtractConfig(split_threshold_pages=4, split_batch_pages=4,
                        parse_concurrency=(1, 2))

    routed = (
        extract_routed(str(corpus), cfg)
        .to_pandas()[["doc_id", "status", "n_text_blocks", "md5sum"]]
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    job = _run_job(corpus, tmp_path / "out_job", tmp_path)
    pd.testing.assert_frame_equal(
        routed[["doc_id", "status", "n_text_blocks"]], job
    )
