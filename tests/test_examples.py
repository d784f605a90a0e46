"""Smoke tests for the executable examples — both demos must run
end-to-end in-process (get_session getOrCreate reuses the test JVM)."""

from __future__ import annotations

import importlib.util
import sys


def _load(path: str, name: str):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_reference_pipeline_demo(spark, tmp_path):
    mod = _load("/root/repo/examples/run_reference_pipeline.py", "ref_demo")
    old = sys.argv
    sys.argv = ["run_reference_pipeline.py", str(tmp_path / "ref_out")]
    try:
        mod.main()
    finally:
        sys.argv = old
    out = spark.read.parquet(str(tmp_path / "ref_out" / "companies_unified"))
    assert out.count() > 0


def test_llm_data_pipeline_demo(spark, tmp_path):
    mod = _load("/root/repo/examples/run_llm_data_pipeline.py", "llm_demo")
    old = sys.argv
    sys.argv = [
        "run_llm_data_pipeline.py",
        "/root/testdata/sf0.001",
        str(tmp_path / "llm_out"),
    ]
    try:
        mod.main()
    finally:
        sys.argv = old
    clean = spark.read.parquet(str(tmp_path / "llm_out" / "clean_documents"))
    ann = spark.read.parquet(str(tmp_path / "llm_out" / "ann_neighbors"))
    assert 0 < clean.count() <= 500
    assert ann.count() > 0
    merges = spark.read.parquet(str(tmp_path / "llm_out" / "bpe_merges"))
    budget = spark.read.parquet(str(tmp_path / "llm_out" / "token_budget"))
    assert merges.count() == 16
    assert budget.count() > 0 and all(r.total_tokens > 0 for r in budget.collect())


def test_streaming_pipeline_demo(spark, tmp_path):
    mod = _load("/root/repo/examples/run_streaming_pipeline.py", "stream_demo")
    old = sys.argv
    work = str(tmp_path / "stream_out")
    sys.argv = ["run_streaming_pipeline.py", "/root/testdata/sf0.001", work]
    try:
        mod.main()
    finally:
        sys.argv = old
    seen = spark.read.parquet(f"{work}/corpus_state/sig_store").select(
        "doc_id"
    ).distinct().count()
    kept = spark.read.parquet(f"{work}/corpus_state/corpus").count()
    assert seen == 500 and 0 < kept <= seen
    from firmable_aus_etl_spark.streaming.incremental import read_agg_view

    assert read_agg_view(spark, f"{work}/agg_state").count() > 0


def test_pandas_api_flow_matches_native_pipeline(spark):
    from examples.run_pandas_api import clean_abr_pandas_api
    from firmable_aus_etl_spark.pipelines import clean_abr_companies

    raw = spark.createDataFrame(
        [
            ("12345678901", " Acme Pty Ltd ", "active", "2000"),
            ("12345678901", "Acme Pty Ltd", "active", "2000"),
            ("bad-abn", "Shady Co", "active", "2000"),
            ("98765432109", "Closed Shop", "cancelled", "3000"),
            ("11111111111", "Blank Post", "ACTIVE", ""),
            (None, "No Abn", "active", "2000"),
        ],
        "abn string, entity_name string, entity_status string, postcode string",
    )
    a = sorted(map(tuple, clean_abr_pandas_api(raw).collect()))
    b = sorted(map(tuple, clean_abr_companies(raw).collect()))
    assert a == b and len(a) >= 2


def test_multimodal_pipeline_demo(spark, tmp_path):
    mod = _load("/root/repo/examples/run_multimodal_pipeline.py", "mm_demo")
    old = sys.argv
    sys.argv = ["run_multimodal_pipeline.py", str(tmp_path / "mm")]
    try:
        mod.main()
    finally:
        sys.argv = old
    # fixture on disk: 5 png, 1 real jpeg, 1 gif, 1 mjpeg avi, 2 wav
    import os

    files = os.listdir(tmp_path / "mm" / "media")
    assert len([f for f in files if f.endswith(".png")]) == 5
    assert len([f for f in files if f.endswith(".jpg")]) == 1
    assert len([f for f in files if f.endswith(".gif")]) == 1
    assert len([f for f in files if f.endswith(".avi")]) == 1


def test_webdataset_loader_demo(spark, tmp_path):
    mod = _load("/root/repo/examples/run_webdataset_loader.py", "wds_demo")
    old = sys.argv
    sys.argv = [
        "run_webdataset_loader.py",
        "/root/testdata/sf0.001",
        str(tmp_path / "wds_out"),
    ]
    try:
        mod.main()  # asserts loader/spark-reader sample-set equality
    finally:
        sys.argv = old


def test_multimodal_webdataset_pipeline_demo(tmp_path):
    """Round-10 composed pipeline: decode -> metadata filter ->
    exact + perceptual dedup -> resize -> WebDataset sink -> Spark
    reader vs public-rule loader parity. The example itself asserts
    round-trip key/byte equality AND the planted dedup effect
    (12 files -> 10 filtered -> 9 exact -> 7 survivors); main() raising
    on any divergence is the test."""
    mod = _load(
        "/root/repo/examples/run_multimodal_webdataset.py", "mm_wds_demo"
    )
    old = sys.argv
    sys.argv = ["run_multimodal_webdataset.py", str(tmp_path / "mm")]
    try:
        mod.main()
    finally:
        sys.argv = old
    import os

    out = tmp_path / "mm" / "train_wds"
    names = [
        ln
        for ln in (out / "_SUCCESS").read_text().splitlines()
        if ln
    ]
    assert names and all(os.path.exists(out / n) for n in names)
