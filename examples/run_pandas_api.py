"""Migration bridge: the reference's pandas-style cleaning code run
UNCHANGED-in-shape on pandas-on-Spark (pyspark.pandas).

The reference implements its stages as single-node pandas
(scripts/cleaning/clean_abr.py:20-51 — rename, strip, regex filters,
drop_duplicates, status filter, column conform). A reference user's
lowest-friction path onto this engine is the pandas API on Spark: the
same method chain, now planned by Catalyst and executed distributed.
This example runs that pandas-shaped flow and asserts it produces the
SAME rows as the engine's native pipeline
(pipelines.clean_abr_companies) — proving the two surfaces are
interchangeable, so teams can migrate file-by-file.

Caveats worth knowing before using this at 100 TB:
- pandas-on-Spark defaults can introduce a global ordering index;
  keep ``compute.ordered_head`` off and avoid ``iloc`` row access.
- ``drop_duplicates`` has no tie-break contract; the native
  dedup_keyed (deterministic ordered survivor) is the production
  form — used below for the keyed step on both sides.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, SparkSession


def clean_abr_pandas_api(raw: DataFrame) -> DataFrame:
    """clean_abr_companies expressed in the pandas dialect (pandas-on-
    Spark), returning a Spark DataFrame of the same shape. Keyed dedup
    stays on the native operator for its deterministic tie-break (see
    module docstring)."""
    import pyspark.pandas as ps

    from firmable_aus_etl_spark.operators import cleaning, dedup
    from firmable_aus_etl_spark.schemas import ABR_CLEAN_COLUMNS

    psdf = raw.pandas_api()
    # clean_abr.py:20 — normalize column names
    psdf.columns = [c.strip().lower().replace(" ", "_") for c in psdf.columns]
    # clean_abr.py:23 — trim every string cell
    for c in psdf.columns:
        if psdf[c].dtype == object or str(psdf[c].dtype) == "string":
            psdf[c] = psdf[c].str.strip()
    # clean_abr.py:26-31 — ABN and postcode shape filters
    psdf = psdf[psdf["abn"].str.match(r"^[0-9]{11}$", na=False)]
    if "postcode" in psdf.columns:
        # pandas-on-Spark quirk (observed on 4.1): after .str.strip(),
        # `col == ""` evaluates False even for genuinely empty strings;
        # compare on length instead — the kind of seam this example
        # exists to document
        psdf = psdf[
            (psdf["postcode"].str.len() == 0)
            | psdf["postcode"].str.match(r"^[0-9]{4}$", na=False)
        ]
    # clean_abr.py:34 — full-row dedup
    psdf = psdf.drop_duplicates()
    sdf = psdf.to_spark()
    # keyed dedup + status filter + conform: native operators (the
    # deterministic-survivor contract pandas drop_duplicates lacks)
    from pyspark.sql import functions as F

    sdf = dedup.dedup_keyed(sdf, ["abn"], [F.col("entity_name").asc_nulls_last()])
    sdf = cleaning.eq_filter_ci(sdf, "entity_status", "active")
    return cleaning.conform_schema(sdf, ABR_CLEAN_COLUMNS)


def main() -> None:
    from firmable_aus_etl_spark.pipelines import clean_abr_companies
    from firmable_aus_etl_spark.session import get_session

    spark = get_session("pandas_api_example")
    spark.sparkContext.setLogLevel("ERROR")
    raw = spark.createDataFrame(
        [
            ("12345678901", " Acme Pty Ltd ", "active", "2000"),
            ("12345678901", "Acme Pty Ltd", "active", "2000"),
            ("bad-abn", "Shady Co", "active", "2000"),
            ("98765432109", "Closed Shop", "cancelled", "3000"),
            ("11111111111", "Blank Post", "ACTIVE", ""),
        ],
        "ABN string, `Entity Name` string, `Entity Status` string, Postcode string",
    )
    a = clean_abr_pandas_api(raw)
    b = clean_abr_companies(raw)
    ra, rb = sorted(map(tuple, a.collect())), sorted(map(tuple, b.collect()))
    assert ra == rb, (ra, rb)
    print(f"pandas-API flow == native pipeline: {len(ra)} rows")


if __name__ == "__main__":
    main()
