"""File readers/writers (op1-op4, jdbc/copy sink analogs).

CSV chunking knobs from the reference (chunksize=10000 at
loadingcsv_topostgre_fast.py:36-40, row-range batches at
loadingcsv_topostgre_optimized.py:100-158) have no operator here on
purpose: Spark reads are partitioned by `maxPartitionBytes` and writes
by DataFrame partitioning — the engine-native equivalents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    *,
    header: bool = True,
    all_strings: bool = False,
) -> DataFrame:
    """op1 — CSV scan: strict schema, or everything-as-string staging
    (reference: clean_abr.py:17 dtype=str), or inference.

    ``all_strings=True`` mirrors the reference's schema-on-read staging:
    read raw, cast explicitly downstream (f17).
    """
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        return reader.schema(schema).csv(path)
    if all_strings:
        df = reader.option("inferSchema", "false").csv(path)
        return df  # all columns arrive as strings already
    return reader.option("inferSchema", "true").csv(path)


def write_csv(df: DataFrame, path: str, *, mode: str = "overwrite") -> None:
    """op4 — CSV sink with header (reference: clean_abr.py:54; append
    mode extract_common_crawl.py:139-143)."""
    df.write.mode(mode).option("header", "true").csv(path)


def write_parquet(
    df: DataFrame,
    path: str,
    *,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """Parquet sink — the engine's durable checkpoint format (stands in
    for the reference's Postgres tables). ``partition_by`` gives
    partition pruning on read; at 100 TB choose low-cardinality keys
    (e.g. ingest date) so files stay >= ~128 MB."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_json_lines(df: DataFrame, path: str, *, mode: str = "overwrite") -> None:
    """JSON-lines sink — the interchange format of the reference's
    extraction stages (one JSON object per line, splittable, appendable;
    pairs with read_json_lines for a lossless round-trip of string/
    numeric/array columns)."""
    df.write.mode(mode).json(path)


def write_orc(df: DataFrame, path: str, *, mode: str = "overwrite") -> None:
    """ORC sink — the second columnar format Spark ships natively;
    same predicate-pushdown/column-pruning contract as parquet for
    warehouses standardized on ORC (Hive lineage)."""
    df.write.mode(mode).orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def read_json_lines(
    spark: SparkSession, path: str, schema: StructType | None = None
) -> DataFrame:
    """JSON-lines scan with tolerant parsing (cdx-source analog).

    PERMISSIVE mode + _corrupt_record column reproduces the reference's
    per-line try/except JSON parse (extract_common_crawl.py:34-43):
    bad lines survive as diagnosable rows instead of killing the job.
    """
    reader = spark.read.option("mode", "PERMISSIVE").option(
        "columnNameOfCorruptRecord", "_corrupt_record"
    )
    if schema is not None:
        from pyspark.sql.types import StringType, StructField

        if not any(f.name == "_corrupt_record" for f in schema.fields):
            schema = StructType(
                list(schema.fields) + [StructField("_corrupt_record", StringType(), True)]
            )
        reader = reader.schema(schema)
    return reader.json(path)


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    *,
    options: dict[str, str] | None = None,
) -> DataFrame:
    """jdbc scan (reference: entity_matching_spark.py:65-69 reads the
    matched table back from Postgres)."""
    r = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    for k, v in (options or {}).items():
        r = r.option(k, v)
    return r.load()


def jdbc_execute(spark: SparkSession, url: str, *statements: str) -> None:
    """Run DDL/DML on the database through a driver-side JDBC
    connection (py4j -> java.sql.DriverManager) — the engine-side half
    of the bulk-load + set-based-merge pattern. Statements that fail
    with 'already exists' are NOT swallowed; callers own idempotence."""
    jvm = spark._jvm
    conn = jvm.java.sql.DriverManager.getConnection(url)
    try:
        st = conn.createStatement()
        try:
            for s in statements:
                st.execute(s)
        finally:
            st.close()
    finally:
        conn.close()


def jdbc_upsert(
    df: DataFrame,
    url: str,
    table: str,
    keys: list[str],
    *,
    staging: str | None = None,
    batchsize: int = 10000,
    options: dict[str, str] | None = None,
) -> None:
    """Keyed UPSERT through a JDBC database: bulk-load a staging table
    (parallel executor writes), then ONE set-based MERGE executed on
    the database — the reference's COPY-to-staging + ON CONFLICT flow
    (loadingcsv_topostgre_fast.py:56-92, entity_matching_tfidf.py:
    121-140) re-expressed so the per-row upsert loop never exists:
    Spark moves the data in bulk, the database applies the merge as a
    single join it can optimize.

    At scale the staging write is the only distributed step (one JDBC
    connection per partition — bound it with jdbc_writer's
    num_partitions to respect the DB's pool); the MERGE is O(staging)
    DB-side work independent of target size with a key index.
    """
    staging = staging or f"{table}_stage"
    spark = df.sparkSession
    jdbc_writer(
        df, url, staging, mode="overwrite", batchsize=batchsize,
        options=options,
    ).save()
    cols = df.columns
    non_keys = [c for c in cols if c not in keys]
    # Spark's JDBC writer creates QUOTED (case-sensitive) column names;
    # unquoted identifiers would be case-folded by the DB and miss them
    q = '"{}"'.format
    on = " AND ".join(f"t.{q(k)} = s.{q(k)}" for k in keys)
    set_clause = ", ".join(f"t.{q(c)} = s.{q(c)}" for c in non_keys)
    ins_cols = ", ".join(q(c) for c in cols)
    ins_vals = ", ".join(f"s.{q(c)}" for c in cols)
    jdbc_execute(
        spark,
        url,
        f"MERGE INTO {table} t USING {staging} s ON {on} "
        f"WHEN MATCHED THEN UPDATE SET {set_clause} "
        f"WHEN NOT MATCHED THEN INSERT ({ins_cols}) VALUES ({ins_vals})",
    )


def jdbc_writer(
    df: DataFrame,
    url: str,
    table: str,
    *,
    mode: str = "append",
    batchsize: int = 10000,
    num_partitions: int | None = None,
    options: dict[str, str] | None = None,
):
    """jdbc-sink builder (reference: loadcsv_topostgres.py:32 to_sql
    append; COPY bulk path loadingcsv_topostgre_fast.py:56-59).

    Returns the configured DataFrameWriter (caller invokes .save()) so
    tests can inspect options without a live database. batchsize is the
    COPY-chunk analog; partition count bounds concurrent connections
    (the reference's pool size 10, loadingcsv_topostgre_optimized.py:59).
    """
    out = df
    if num_partitions is not None:
        out = out.repartition(num_partitions)
    w = (
        out.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batchsize))
        .mode(mode)
    )
    for k, v in (options or {}).items():
        w = w.option(k, v)
    return w
