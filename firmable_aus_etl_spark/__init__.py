"""firmable_aus_etl_spark — a PySpark-native analytics engine.

A brand-new, idiomatic Spark DataFrame engine providing the query and
data-processing capabilities of the ``devyamehrotra/firmable-aus-etl``
reference pipeline (see SURVEY.md for the operator inventory with
file:line citations into the reference), extended with LLM-data-pipeline
operators (deduplication, similarity search, text analysis, multimodal
column plumbing) designed for horizontal scale.

Design rules (SURVEY.md §7.1):
- operators are composable functions ``DataFrame -> DataFrame``
- lazy end-to-end; actions only at sinks and audits
- pure column expressions preferred over UDFs; pandas UDFs (Arrow) when
  Python is unavoidable; never row-at-a-time UDFs on hot paths
- every operator has a ``queries()`` registration in ``__spark_entry__.py``
  with a DuckDB ``oracle_sql()`` twin where SQL-expressible
"""

from firmable_aus_etl_spark.session import get_session
from firmable_aus_etl_spark.datasets import load_tables, TABLE_NAMES

__all__ = ["get_session", "load_tables", "TABLE_NAMES"]

__version__ = "0.1.0"
