"""Strict-schema loaders for the driver testdata tables."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from firmable_aus_etl_spark.schemas import TESTDATA_SCHEMAS

TABLE_NAMES = tuple(TESTDATA_SCHEMAS)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata parquet table with its declared schema.

    Declared schemas keep the scan strict and let Catalyst prune columns
    and push filters into the parquet reader (ReadSchema/PushedFilters in
    the physical plan) — at 100 TB the scan is the dominant cost and a
    scan that reads all columns is wrong.
    """
    return (
        spark.read.schema(TESTDATA_SCHEMAS[name]).parquet(f"{sf_dir}/{name}.parquet")
    )


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load all testdata tables as a dict of lazy DataFrames."""
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}
