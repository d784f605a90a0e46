"""Cleaning-family unit tests on reference-domain fixtures with planted
dirt (FIXTURES.md §B1/§B2)."""

from __future__ import annotations

from pyspark.sql import functions as F

from firmable_aus_etl_spark.operators import cleaning
from firmable_aus_etl_spark.schemas import ABR_CLEAN_COLUMNS


def abr_raw(spark):
    # planted dirt per FIXTURES.md §B1: bad ABNs, bad postcodes, dup
    # ABNs, mixed-case status, whitespace.
    rows = [
        ("12345678901", "  Acme Pty Ltd ", "Active", "2000"),
        ("12345678901", "Acme Pty Ltd", "Active", "2000"),   # dup abn
        ("999", "Short Abn Co", "Active", "2000"),           # bad abn
        ("abcdefghijk", "Alpha Abn Co", "Active", "2000"),   # alpha abn
        ("98765432109", "Cancelled Co", "Cancelled", "3000"),
        ("11111111111", "Bad Postcode Co", "ACTIVE", "300"),  # bad postcode
        ("22222222222", "Upper Status Co", "ACTIVE", "4000"),
        (None, "Null Abn Co", "Active", "5000"),
    ]
    return spark.createDataFrame(rows, "abn string, entity_name string, entity_status string, postcode string")


def test_normalize_column_names(spark):
    df = spark.createDataFrame([(1,)], ["  Entity Name  "])
    assert cleaning.normalize_column_names(df).columns == ["entity_name"]


def test_trim_all_strings(spark):
    df = spark.createDataFrame([("  x  ", 1)], "a string, b int")
    row = cleaning.trim_all_strings(df).first()
    assert row.a == "x" and row.b == 1


def test_regex_filter_abn(spark):
    # reference: clean_abr.py:26-27 — keep ^\d{11}$ only
    out = cleaning.regex_filter(abr_raw(spark), "abn", r"^[0-9]{11}$")
    abns = {r.abn for r in out.collect()}
    assert abns == {"12345678901", "98765432109", "11111111111", "22222222222"}


def test_regex_filter_postcode(spark):
    out = cleaning.regex_filter(abr_raw(spark), "postcode", r"^[0-9]{4}$")
    assert "300" not in {r.postcode for r in out.collect()}


def test_eq_filter_ci(spark):
    # reference: clean_abr.py:38-39 — lower(status) == 'active'
    out = cleaning.eq_filter_ci(abr_raw(spark), "entity_status", "Active")
    assert {r.entity_status for r in out.collect()} == {"Active", "ACTIVE"}


def test_drop_null_required(spark):
    out = cleaning.drop_null_required(abr_raw(spark), ["abn"])
    assert out.filter(F.col("abn").isNull()).count() == 0


def test_conform_schema_adds_missing_drops_extra(spark):
    # reference: clean_abr.py:42-51
    df = spark.createDataFrame(
        [("1", "A", "junk")], "abn string, entity_name string, extra string"
    )
    out = cleaning.conform_schema(df, ABR_CLEAN_COLUMNS)
    assert out.columns == ABR_CLEAN_COLUMNS
    row = out.first()
    assert row.suburb == "" and row.state == ""


def test_truncate_strings(spark):
    df = spark.createDataFrame([("x" * 600,)], "website_url string")
    out = cleaning.truncate_strings(df, {"website_url": 500})
    assert len(out.first().website_url) == 500


def test_titlecase_clean(spark):
    # reference: clean_common_crawl.py:10-13
    df = spark.createDataFrame([("  acme   PTY   ltd ",)], "name string")
    out = df.select(cleaning.titlecase_clean("name").alias("name"))
    assert out.first().name == "Acme Pty Ltd"


def test_blocking_key_prefix_and_suffix(spark):
    df = spark.createDataFrame([("Acme Pty Ltd",), ("ZZ Top#42",)], ["name"])
    pre = cleaning.with_blocking_key(df, "name", block_size=2)
    assert {r.block for r in pre.collect()} == {"ac", "zz"}
    suf = cleaning.with_blocking_key(df, "name", block_size=2, from_end=True)
    assert {r.block for r in suf.collect()} == {"td", "42"}


def test_unicode_and_empty_rows(spark):
    df = spark.createDataFrame([("Çömpañy Ünïted",), ("",), (None,)], ["name"])
    out = df.select(cleaning.titlecase_clean("name").alias("t"))
    vals = [r.t for r in out.collect()]
    assert "Çömpañy Ünïted" in vals  # initcap keeps unicode letters


def test_abn_checksum_valid(spark):
    from firmable_aus_etl_spark.operators.cleaning import abn_checksum_valid

    rows = [
        ("51824753556", True),   # ATO's published example ABN
        ("51824753557", False),  # last digit off
        ("15824753556", False),  # transposed leading pair
        ("5182475355", False),   # 10 digits
        ("518247535561", False), # 12 digits
        ("51 824 753 556", False),  # formatted (normalize first)
        (None, False),
    ]
    df = spark.createDataFrame([(a,) for a, _ in rows], "abn string")
    got = [
        r.ok
        for r in df.select(
            F.coalesce(abn_checksum_valid("abn"), F.lit(False)).alias("ok")
        ).collect()
    ]
    assert got == [want for _, want in rows]


def test_normalize_phone_au(spark):
    from firmable_aus_etl_spark.operators.cleaning import normalize_phone_au

    rows = [
        ("(02) 9374 4000", "61293744000"),
        ("0412 345 678", "61412345678"),
        ("+61 2 9374 4000", "61293744000"),
        ("61293744000", "61293744000"),
        ("12345", None),
        ("not a phone", None),
    ]
    df = spark.createDataFrame([(a,) for a, _ in rows], "p string")
    got = [r.n for r in df.select(normalize_phone_au("p").alias("n")).collect()]
    assert got == [want for _, want in rows]


def test_fold_accents(spark):
    from firmable_aus_etl_spark.operators.cleaning import fold_accents

    rows = [("Café Pty Ltd",), ("Mëtàl Òffïcê",), ("plain name",), (None,)]
    df = spark.createDataFrame(rows, "name string")
    got = [r.f for r in df.select(fold_accents("name").alias("f")).collect()]
    assert got == ["Cafe Pty Ltd", "Metal Office", "plain name", None]
    # non-decomposable chars pass through rather than corrupting
    df2 = spark.createDataFrame([("søren & æsir ß",)], "name string")
    assert df2.select(fold_accents("name").alias("f")).collect()[0].f == "søren & æsir ß"
