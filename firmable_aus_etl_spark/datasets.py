"""Strict-schema loaders for the driver testdata tables."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from firmable_aus_etl_spark.schemas import TESTDATA_SCHEMAS

TABLE_NAMES = tuple(TESTDATA_SCHEMAS)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata parquet table with its declared schema.

    Declared schemas keep the scan strict and let Catalyst prune columns
    and push filters into the parquet reader (ReadSchema/PushedFilters in
    the physical plan) — at 100 TB the scan is the dominant cost and a
    scan that reads all columns is wrong.

    events: the parquet ts column is TIMESTAMP(NANOS) which Spark 4
    rejects as TimestampType; it is read as nanosecond longs (session
    conf nanosAsLong) and converted to a microsecond TimestampType so
    downstream operators see an ordinary event-time column.
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.schema(TESTDATA_SCHEMAS[name]).parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = df.withColumn(
            "ts", F.timestamp_micros((F.col("ts") / 1000).cast("long"))
        )
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load all testdata tables as a dict of lazy DataFrames."""
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}
