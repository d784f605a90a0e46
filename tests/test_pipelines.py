"""Reference-parity pipeline tests on planted-dirt fixtures
(FIXTURES.md §B): clean -> match -> unify -> incremental merge."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from firmable_aus_etl_spark import pipelines
from firmable_aus_etl_spark.schemas import ABR_CLEAN_COLUMNS


def abr_raw(spark):
    rows = [
        # (abn, entity_name, entity_type, entity_status, postcode, state)
        ("11111111111", "  Acme   Pty Ltd ", "PRV", "Active", "2000", "NSW"),
        ("11111111111", "Acme Pty Ltd", "PRV", "Active", "2000", "NSW"),   # dup
        ("999", "Bad Abn Co", "PRV", "Active", "2000", "NSW"),             # bad abn
        ("22222222222", "Beta Industries", "PRV", "ACTIVE", "3000", "VIC"),
        ("33333333333", "Gone Pty Ltd", "PRV", "Cancelled", "4000", "QLD"),
        ("44444444444", "Bad Postcode Co", "PRV", "Active", "12", "NSW"),  # bad pc
        ("55555555555", "No Postcode Co", "PRV", "Active", "", "WA"),      # blank ok
    ]
    return spark.createDataFrame(
        rows,
        "ABN string, `Entity Name` string, entity_type string, entity_status string, postcode string, state string",
    )


def cc_raw(spark):
    rows = [
        ("https://acme.com.au", "acme   pty ltd", "mining"),
        ("https://acme.com.au", "acme   pty ltd", "mining"),   # dup
        ("https://beta.com.au", "BETA INDUSTRIES", None),
        (None, "Ghost Co", None),                              # null url
        ("https://" + "x" * 600 + ".au", "Long Url Co", None),  # >500 chars
    ]
    return spark.createDataFrame(rows, "website_url string, company_name string, industry string")


def test_clean_abr_pipeline(spark):
    out = pipelines.clean_abr_companies(abr_raw(spark))
    assert out.columns == ABR_CLEAN_COLUMNS
    abns = {r.abn for r in out.collect()}
    # dups collapsed, bad abn/postcode and cancelled dropped, blank pc kept
    assert abns == {"11111111111", "22222222222", "55555555555"}
    acme = [r for r in out.collect() if r.abn == "11111111111"]
    assert len(acme) == 1


def test_clean_common_crawl_pipeline(spark):
    out = pipelines.clean_common_crawl_companies(cc_raw(spark))
    rows = {r.company_name: r for r in out.collect()}
    assert "Acme Pty Ltd" in rows            # collapsed spaces + Title Case
    assert "Beta Industries" in rows         # upper -> Title Case
    assert all(r.website_url is not None for r in out.collect())
    assert max(len(r.website_url) for r in out.collect()) <= 500
    assert out.count() == 3                  # dup and null-url dropped


def test_match_entities_end_to_end(spark):
    abr = pipelines.clean_abr_companies(abr_raw(spark))
    cc = pipelines.clean_common_crawl_companies(cc_raw(spark))
    matches = pipelines.match_entities(cc, abr, threshold=80.0)
    got = {(r.company_name, r.abn) for r in matches.collect()}
    assert ("Acme Pty Ltd", "11111111111") in got
    assert ("Beta Industries", "22222222222") in got
    m = matches.first()
    assert 0.0 <= m.match_confidence <= 1.0


def test_unify_companies_types(spark):
    abr = pipelines.clean_abr_companies(abr_raw(spark))
    cc = pipelines.clean_common_crawl_companies(cc_raw(spark))
    unified = pipelines.unify_companies(pipelines.match_entities(cc, abr, threshold=80.0))
    row = unified.filter(F.col("abn") == "11111111111").first()
    assert '"state":"NSW"' in row.address.replace(" ", "")
    assert row.data_sources == ["abr", "common_crawl"]
    assert str(unified.schema["confidence_score"].dataType) == "DecimalType(4,3)"


def test_merge_matches_confidence_wins(spark):
    schema = "abn string, website_url string, company_name string, match_confidence double"
    existing = spark.createDataFrame(
        [("1", "u1", "old name", 0.90), ("2", "u2", "keep", 0.80)], schema
    )
    new = spark.createDataFrame(
        [("1", "u1", "better", 0.95), ("2", "u2", "worse", 0.50), ("3", "u3", "new", 0.70)],
        schema,
    )
    out = pipelines.merge_matches(existing, new, keys=("abn", "website_url"))
    got = {r.abn: (r.company_name, r.match_confidence) for r in out.collect()}
    assert got == {"1": ("better", 0.95), "2": ("keep", 0.80), "3": ("new", 0.70)}


def test_llm_adjudication_injected(spark):
    pairs = spark.createDataFrame(
        [("Acme Pty Ltd", "Acme Pty Limited"), ("Acme Pty Ltd", "Zebra Inc")],
        "entity_name string, company_name string",
    )

    def fake_model(a, b):
        same = a.split()[0] == b.split()[0]
        return same, 0.9 if same else 0.1, "prefix match" if same else "different"

    out = pipelines.llm_adjudicate_pairs(pairs, call_model=fake_model)
    rows = {r.company_name: r for r in out.collect()}
    assert rows["Acme Pty Limited"].is_match is True
    assert rows["Zebra Inc"].is_match is False


def test_llm_adjudication_gated(spark):
    pairs = spark.createDataFrame([("a", "b")], "entity_name string, company_name string")
    with pytest.raises(Exception):
        pipelines.llm_adjudicate_pairs(pairs).collect()
