"""Query registry: every SURVEY.md §2 operator instantiated on the
driver testdata tables, with a DuckDB oracle-SQL twin.

Contract (see /root/repo/__spark_entry__.py): each entry here is a
callable ``(spark, sf_dir) -> DataFrame``; ORACLE[name] is ANSI-ish SQL
DuckDB runs against the same parquet registered as views. Column names
are aliased identically on both sides; floats that cross an
engine-specific aggregation order are rounded on both sides.

Split into per-family modules (round-9, verdict Next #6). Importing
this package registers every name (consumers are name-keyed; iteration
order follows the module import order below, which differs from the
old monolithic file's interleaving). The compatibility loop at the
bottom re-exports every module-level name so ``queries.<anything>``
from tests/tools keeps resolving (cache dicts stay the same objects;
mutations remain visible everywhere). The exact registry contents are
pinned by tests/test_registry_manifest.py.
"""

from __future__ import annotations

from firmable_aus_etl_spark.queries._base import (  # noqa: F401
    Callable,
    DataFrame,
    F,
    ORACLE,
    PIPELINE_QUERIES,
    QUERIES,
    QueryFn,
    SparkSession,
    _cents,
    agg,
    dedup,
    joins,
    load_table,
    register,
    register_pipeline,
    topk_per_group,
)

from firmable_aus_etl_spark.queries import flagship_tpch as _flagship_tpch  # noqa: E402
from firmable_aus_etl_spark.queries import llm_text as _llm_text  # noqa: E402
from firmable_aus_etl_spark.queries import scalar_funcs as _scalar_funcs  # noqa: E402
from firmable_aus_etl_spark.queries import event_time as _event_time  # noqa: E402
from firmable_aus_etl_spark.queries import survey_joins as _survey_joins  # noqa: E402
from firmable_aus_etl_spark.queries import window_frames as _window_frames  # noqa: E402
from firmable_aus_etl_spark.queries import minhash_portable as _minhash_portable  # noqa: E402
from firmable_aus_etl_spark.queries import grouping_setops as _grouping_setops  # noqa: E402
from firmable_aus_etl_spark.queries import sql_surface_wide as _sql_surface_wide  # noqa: E402
from firmable_aus_etl_spark.queries import training_timeseries as _training_timeseries  # noqa: E402
from firmable_aus_etl_spark.queries import event_analytics as _event_analytics  # noqa: E402
from firmable_aus_etl_spark.queries import tpch_volume as _tpch_volume  # noqa: E402
from firmable_aus_etl_spark.queries import tpch_depth as _tpch_depth  # noqa: E402
from firmable_aus_etl_spark.queries import governance_graph as _governance_graph  # noqa: E402
from firmable_aus_etl_spark.queries import curation as _curation  # noqa: E402

_PARTS = (_flagship_tpch, _llm_text, _scalar_funcs, _event_time, _survey_joins, _window_frames, _minhash_portable, _grouping_setops, _sql_surface_wide, _training_timeseries, _event_analytics, _tpch_volume, _tpch_depth, _governance_graph, _curation)

for _m in _PARTS:
    for _k, _v in vars(_m).items():
        if not _k.startswith("__"):
            globals()[_k] = _v
del _m, _k, _v
