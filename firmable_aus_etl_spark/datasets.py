"""Strict-schema loaders for the driver testdata tables."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from firmable_aus_etl_spark.schemas import TESTDATA_SCHEMAS

TABLE_NAMES = tuple(TESTDATA_SCHEMAS)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata parquet table with its declared schema.

    Declared schemas keep the scan strict and let Catalyst prune columns
    and push filters into the parquet reader (ReadSchema/PushedFilters in
    the physical plan) — at 100 TB the scan is the dominant cost and a
    scan that reads all columns is wrong.

    events: the parquet ts encoding has varied across testdata
    generations (TIMESTAMP MICROS vs TIMESTAMP(NANOS); Spark 4 rejects
    the latter as TimestampType, PARQUET_TYPE_ILLEGAL). The footer is
    probed once driver-side: ns-encoded files are read as nanosecond
    longs (session conf nanosAsLong) and converted to a microsecond
    TimestampType; us/ms files map to TimestampType directly. Either
    way downstream operators see an ordinary event-time column.
    """
    path = f"{sf_dir}/{name}.parquet"
    if name == "events" and _parquet_ts_unit(path) == "ns":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        ns_schema = StructType(
            [
                StructField(f.name, LongType() if f.name == "ts" else f.dataType)
                for f in TESTDATA_SCHEMAS[name].fields
            ]
        )
        return (
            spark.read.schema(ns_schema)
            .parquet(path)
            .withColumn("ts", F.timestamp_micros((F.col("ts") / 1000).cast("long")))
        )
    return spark.read.schema(TESTDATA_SCHEMAS[name]).parquet(path)


def _parquet_ts_unit(path: str) -> str:
    """Timestamp unit ('ns'/'us'/'ms') of a parquet table's ts column,
    probed from the footer of one part-file (driver-side, no Spark job)."""
    import glob
    import os

    import pyarrow.parquet as pq

    part = path
    if os.path.isdir(path):
        parts = sorted(glob.glob(os.path.join(path, "*.parquet")))
        if not parts:
            return "us"
        part = parts[0]
    t = pq.read_schema(part).field("ts").type
    return getattr(t, "unit", "us")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load all testdata tables as a dict of lazy DataFrames."""
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}
