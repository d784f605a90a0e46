"""End-to-end reference-pipeline demo: the five Airflow stages of
devyamehrotra/firmable-aus-etl (extract -> schema -> clean -> load ->
match) as ONE lazy Spark program.

Runs on synthetic raw frames shaped like the reference's extractor
outputs (FIXTURES.md §B), writes parquet outputs + a quality report:

    python examples/run_reference_pipeline.py [out_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from firmable_aus_etl_spark import pipelines
from firmable_aus_etl_spark.operators.audit_suite import run_audits
from firmable_aus_etl_spark.session import get_session
from firmable_aus_etl_spark.sources.files import write_parquet


def synthetic_raw(spark):
    """Raw frames standing in for the XML/WARC extract stage output."""
    abr_rows = [
        ("11111111111", "ACME   PTY LTD", "Australian Private Company", "Active", "2000", "NSW"),
        ("11111111111", "ACME PTY LTD", "Australian Private Company", "Active", "2000", "NSW"),
        ("22222222222", "BETA INDUSTRIES PTY LTD", "Australian Private Company", "ACTIVE", "3000", "VIC"),
        ("33333333333", "GAMMA HOLDINGS", "Australian Public Company", "Cancelled", "4000", "QLD"),
        ("44444444444", "DELTA MINING GROUP", "Australian Private Company", "Active", "6000", "WA"),
        ("bad-abn", "BROKEN ROW CO", "X", "Active", "999", "ZZ"),
    ]
    abr = spark.createDataFrame(
        abr_rows,
        "ABN string, `Entity Name` string, entity_type string, entity_status string, postcode string, state string",
    )
    cc_rows = [
        ("https://acme.com.au", "acme pty ltd", "manufacturing"),
        ("https://beta-industries.com.au", "BETA  INDUSTRIES", "construction"),
        ("https://delta-mining.com.au", "delta mining", "mining"),
        ("https://unrelated.com.au", "totally different webshop", None),
        (None, "ghost co", None),
    ]
    cc = spark.createDataFrame(cc_rows, "website_url string, company_name string, industry string")
    return abr, cc


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/firmable_demo"
    spark = get_session("reference_pipeline_demo", master="local[4]")
    spark.sparkContext.setLogLevel("ERROR")

    abr_raw, cc_raw = synthetic_raw(spark)

    # clean (reference stage 3) — pure lineage, no intermediate CSVs
    abr = pipelines.clean_abr_companies(abr_raw)
    cc = pipelines.clean_common_crawl_companies(cc_raw)

    # match (stage 5) + unify
    matches = pipelines.match_entities(cc, abr, threshold=60.0)
    unified = pipelines.unify_companies(matches)

    # audits (the dbt stage) — single-pass suite per table
    report = run_audits(
        abr,
        {
            "abn": ["unique", "not_null", "matches_regex:^[0-9]{11}$"],
            "entity_name": ["not_null"],
        },
    )

    # load (stage 4): parquet stands in for Postgres
    write_parquet(abr, f"{out_dir}/abr_companies")
    write_parquet(cc, f"{out_dir}/common_crawl_companies")
    write_parquet(matches, f"{out_dir}/entity_matches")
    write_parquet(unified, f"{out_dir}/companies_unified")

    print("=== cleaned ABR ===")
    abr.show(truncate=False)
    print("=== matches ===")
    matches.select("website_url", "company_name", "entity_name", "abn", "match_confidence").show(truncate=False)
    print("=== unified ===")
    unified.show(truncate=False)
    print("=== quality report ===")
    report.show(truncate=False)
    print(f"outputs written under {out_dir}")


if __name__ == "__main__":
    main()
