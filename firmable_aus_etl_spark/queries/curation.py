"""Query-registry part: see section header below.

Split from the monolithic queries.py (round-9, verdict Next #6);
registration order preserved by the package __init__ import order.
"""

from __future__ import annotations

from firmable_aus_etl_spark.queries._base import *  # noqa: F401,F403
from firmable_aus_etl_spark.queries.grouping_setops import (  # noqa: F401
    _CLUSTER_ORACLE,
)
from firmable_aus_etl_spark.queries.llm_text import (  # noqa: F401
    _NORM_SQL,
    _QUALITY_ORACLE,
    _TOKENS_SQL,
    _ivf_fixed_oracle,
)

# =========================================================================
# Round-5 widening: training-corpus curation family — domain mixing,
# budgeted selection, dedup-rate audit. All oracle-bearing.
# =========================================================================

_MIXTURE_RATES_SQL = f"""
WITH d AS (SELECT lang, len({_TOKENS_SQL}) AS n_tok FROM documents),
g AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(n_tok) AS BIGINT) AS n_units
      FROM d GROUP BY lang),
w AS (SELECT *, sqrt(CAST(n_units AS DOUBLE)) AS ww FROM g),
t AS (SELECT sum(ww) AS tw FROM w)
SELECT lang, n_rows, n_units,
       round(ww / tw, 6) AS weight,
       round(least(1.0, 50000.0 * ww / tw / CAST(n_units AS DOUBLE)), 6) AS rate
FROM w CROSS JOIN t
"""


@register("mixture_sampling_rates", _MIXTURE_RATES_SQL)
def q_mixture_sampling_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixing plan for a training corpus: temperature-scaled
    (sqrt, alpha=0.5) per-language sampling rates hitting a 50k-token
    budget in expectation (operators/sampling.py:
    temperature_mixture_rates) — the multilingual-mix recipe where
    small languages are up-weighted vs proportional sampling. One
    groupBy + a 1-row scalar attachment; the corpus never shuffles."""
    from firmable_aus_etl_spark.functions import text as T
    from firmable_aus_etl_spark.operators.sampling import temperature_mixture_rates

    docs = load_table(spark, sf_dir, "documents").select(
        "lang", "doc_id", T.token_count("text").alias("n_tok")
    )
    return temperature_mixture_rates(docs, "lang", "n_tok", budget=50_000)


_MIXTURE_SAMPLED_SQL = f"""
WITH d AS (SELECT doc_id, lang, len({_TOKENS_SQL}) AS n_tok FROM documents),
g AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(n_tok) AS BIGINT) AS n_units
      FROM d GROUP BY lang),
w AS (SELECT *, sqrt(CAST(n_units AS DOUBLE)) AS ww FROM g),
t AS (SELECT sum(ww) AS tw FROM w),
r AS (SELECT lang,
             round(least(1.0, 50000.0 * ww / tw / CAST(n_units AS DOUBLE)), 6)
               AS rate
      FROM w CROSS JOIN t),
kept AS (
  SELECT d.lang, d.n_tok
  FROM d JOIN r ON d.lang = r.lang
  WHERE (CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 12)) AS BIGINT) + 1)
        / 281474976710656.0 <= r.rate
)
SELECT lang, CAST(count(*) AS BIGINT) AS n_sampled,
       CAST(sum(n_tok) AS BIGINT) AS sampled_tokens
FROM kept GROUP BY lang
"""


@register("mixture_sampled_corpus", _MIXTURE_SAMPLED_SQL)
def q_mixture_sampled_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mixture plan APPLIED: deterministic per-language Bernoulli
    keep via the portable 48-bit md5 unit hash (same rows on any
    layout; appends never resample survivors), reporting realized
    per-language token volume. The rate join is a broadcast of the
    |langs|-row plan; the keep filter is map-side — the full corpus
    crosses no shuffle until the audit aggregation."""
    from firmable_aus_etl_spark.functions import text as T
    from firmable_aus_etl_spark.operators.sampling import (
        _uniform_from_key,
        temperature_mixture_rates,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", T.token_count("text").alias("n_tok")
    )
    rates = temperature_mixture_rates(docs, "lang", "n_tok", budget=50_000).select(
        "lang", "rate"
    )
    kept = docs.join(F.broadcast(rates), "lang").filter(
        _uniform_from_key(F.col("doc_id")) <= F.col("rate")
    )
    return kept.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_sampled"),
        F.sum("n_tok").cast("long").alias("sampled_tokens"),
    )


@register(
    "dedup_rate_by_source",
    f"""
    WITH d AS (SELECT source, md5({_NORM_SQL}) AS fp FROM documents)
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT fp) AS BIGINT) AS n_unique,
           round(1.0 - CAST(count(DISTINCT fp) AS DOUBLE) / count(*), 6)
             AS dup_rate
    FROM d GROUP BY source
    """,
)
def q_dedup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-health audit: per-source exact-duplicate rate over the
    normalized-text md5 fingerprint — the quantity a crawl pipeline
    tracks per snapshot to catch source regressions. distinct-count
    shuffles only (source, fp) pairs; partial aggregation keeps the
    map side combining."""
    from firmable_aus_etl_spark.functions import text as T

    docs = load_table(spark, sf_dir, "documents")
    d = docs.select("source", F.md5(T.normalize_name("text")).alias("fp"))
    return d.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.count_distinct("fp").cast("long").alias("n_unique"),
        F.round(
            1.0 - F.count_distinct("fp").cast("double") / F.count("*"), 6
        ).alias("dup_rate"),
    )


_QUALITY_BUDGET_SQL = f"""
WITH q AS ({_QUALITY_ORACLE.strip()}),
d AS (
  SELECT doc_id, lang, len({_TOKENS_SQL}) AS n_tok FROM documents
),
ranked AS (
  SELECT d.lang, d.n_tok, q.quality,
         sum(d.n_tok) OVER (PARTITION BY d.lang
                            ORDER BY q.quality DESC, d.doc_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum_tok
  FROM d JOIN q ON d.doc_id = q.doc_id
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_selected,
       CAST(sum(n_tok) AS BIGINT) AS tokens_selected,
       CAST(floor(1000000.0 * min(quality)) AS BIGINT) AS min_quality_e6
FROM ranked WHERE cum_tok <= 10000
GROUP BY lang
"""


@register("quality_budget_selection", _QUALITY_BUDGET_SQL)
def q_quality_budget_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Budgeted corpus curation: per language, keep the highest-
    quality documents until a 10k-token budget — greedy quality-first
    selection (the curation step after scoring/dedup, before
    packing). The running token total is an INTEGER cumulative sum
    over a lang-PARTITIONED window ordered by (quality desc, doc_id)
    — quality is the bit-identical pure-expression score, doc_id
    breaks ties, so the selection boundary cannot flip between
    engines; the window never sees more than one language's rows per
    task (no unbounded global window)."""
    from pyspark.sql import Window

    from firmable_aus_etl_spark.functions import text as T

    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id", "lang",
        T.token_count("text").cast("long").alias("n_tok"),
        T.quality_score("text").alias("quality"),
    )
    w = (
        Window.partitionBy("lang")
        .orderBy(F.col("quality").desc(), "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = d.withColumn("cum_tok", F.sum("n_tok").over(w))
    return (
        ranked.filter(F.col("cum_tok") <= 10_000)
        .groupBy("lang")
        .agg(
            F.count("*").cast("long").alias("n_selected"),
            F.sum("n_tok").cast("long").alias("tokens_selected"),
            F.floor(1000000.0 * F.min("quality")).cast("long").alias("min_quality_e6"),
        )
    )


@register("ivf_ann_top3_salted", _ivf_fixed_oracle(64, 16, 4, 7))
def q_ivf_ann_top3_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hot-centroid-bounded IVF plan (round-5 SKEW.md): same
    probe as ivf_ann_top3 but with cell_cap=20, so every cell above
    20 corpus vectors is salted into deterministic xxhash shards and
    the probing queries fan out per shard. Registered against the
    SAME oracle as the unsalted default — the hash-checked proof that
    salting changes the join-key layout and nothing else (at sf0.01
    the 500-vector corpus averages ~31 vectors/cell, so the cap
    genuinely triggers on most cells)."""
    from firmable_aus_etl_spark.functions import vectors as V

    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.select("vec_id", "embedding")
    queries = emb.filter(F.col("vec_id") % 10 == 0).select("vec_id", "embedding")
    out = V.ivf_topk(
        queries, corpus, dim=64, k=3, n_cells=16, nprobe=4, seed=7, cell_cap=20
    )
    return out.select(
        "query_id", "neighbor_id", F.col("rank").cast("long").alias("rank"), "cosine"
    )


_CLUSTER_SPLIT_SQL = f"""
WITH clusters AS ({_CLUSTER_ORACLE.strip()}),
b AS (
  SELECT c.cluster, d.doc_id, len({_TOKENS_SQL}) AS n_tok,
         CAST(('0x' || substr(md5(CAST(c.cluster AS VARCHAR)), 1, 2)) AS INTEGER)
           AS bucket
  FROM clusters c JOIN documents d USING (doc_id)
)
SELECT CASE WHEN bucket < 204 THEN 'train'
            WHEN bucket < 230 THEN 'val'
            ELSE 'test' END AS split,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT cluster) AS BIGINT) AS n_clusters,
       CAST(sum(n_tok) AS BIGINT) AS total_tokens
FROM b GROUP BY 1
"""


@register("cluster_aware_split", _CLUSTER_SPLIT_SQL)
def q_cluster_aware_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-proof train/val/test split for a near-dup corpus: the
    split key is the document's near-dup CLUSTER id, not the doc id —
    a plain per-doc hash split scatters near-duplicates across
    train and test, leaking training text into evaluation (the
    classic contamination vector a doc-level split cannot prevent).
    Hash = first byte of md5(cluster): <204 train (~80%), <230 val
    (~10%), else test. Every member of a cluster lands in one split
    by construction (tests/test_feature_queries.py asserts zero
    straddling clusters). Scale shape: the cluster frame comes from
    the connected-components dedup pipeline; the split itself is a
    map over (doc -> cluster) + one aggregation."""
    docs = load_table(spark, sf_dir, "documents")
    clusters = QUERIES["near_dup_clusters"](spark, sf_dir)
    from firmable_aus_etl_spark.functions import text as T

    joined = clusters.join(
        docs.select("doc_id", T.token_count("text").alias("n_tok")), "doc_id"
    )
    bucket = F.conv(
        F.substring(F.md5(F.col("cluster").cast("string")), 1, 2), 16, 10
    ).cast("int")
    return (
        joined.select(
            F.when(bucket < 204, "train")
            .when(bucket < 230, "val")
            .otherwise("test")
            .alias("split"),
            "cluster",
            "n_tok",
        )
        .groupBy("split")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.count_distinct("cluster").cast("long").alias("n_clusters"),
            F.sum("n_tok").cast("long").alias("total_tokens"),
        )
    )


# --- the reference's whole DAG as ONE oracle-checked query (round-6 #6) ---

# token_sort for single-token digit names is identity, but the oracle
# replays the full expression for fidelity (DuckDB list_sort over
# string_split of the collapsed-whitespace lowered trim).
_REF_NORM = (
    "array_to_string(list_sort(string_split("
    "regexp_replace(lower(trim({x})), ' +', ' ', 'g'), ' ')), ' ')"
)


def _ref_pipeline_oracle() -> str:
    norm_c = _REF_NORM.format(x="cc.company_name")
    norm_a = _REF_NORM.format(x="a.entity_name")
    return f"""
WITH abr_base AS (
  SELECT s_suppkey,
         CASE WHEN s_suppkey % 13 = 0
              THEN lpad(CAST(s_suppkey AS VARCHAR), 10, '0') || 'X'
              ELSE lpad(CAST(s_suppkey AS VARCHAR), 11, '0') END AS abn,
         '  ' || reverse(regexp_replace(lower(trim(s_name)), '^[a-z]+#', '')) AS entity_name,
         'company' AS entity_type,
         CASE WHEN s_suppkey % 10 = 9 THEN 'CANCELLED' ELSE ' Active ' END AS entity_status,
         CAST(s_nationkey AS VARCHAR) AS state,
         CASE WHEN s_suppkey % 7 = 0 THEN ''
              WHEN s_suppkey % 11 = 0 THEN '12b4'
              ELSE lpad(CAST((s_nationkey * 37 + 11) % 10000 AS VARCHAR), 4, '0')
         END AS postcode
  FROM supplier
),
abr_raw AS (
  SELECT abn, entity_name, entity_type, entity_status, state, postcode FROM abr_base
  UNION ALL  -- full-row duplicates (dedup_full target)
  SELECT abn, entity_name, entity_type, entity_status, state, postcode
  FROM abr_base WHERE s_suppkey % 3 = 0
  UNION ALL  -- keyed duplicates losing the entity_name tiebreak
  SELECT abn, 'zz ' || entity_name, entity_type, entity_status, state, postcode
  FROM abr_base WHERE s_suppkey % 5 = 0
),
abr_trim AS (
  SELECT DISTINCT trim(abn) AS abn, trim(entity_name) AS entity_name,
         trim(entity_type) AS entity_type, trim(entity_status) AS entity_status,
         trim(state) AS state, trim(postcode) AS postcode
  FROM abr_raw
  WHERE regexp_matches(trim(abn), '^[0-9]{{11}}$')
    AND (trim(postcode) = '' OR regexp_matches(trim(postcode), '^[0-9]{{4}}$'))
),
abr_clean AS (
  SELECT abn, entity_name, entity_type, entity_status, state, postcode
  FROM (SELECT *, row_number() OVER (PARTITION BY abn
                                     ORDER BY entity_name ASC NULLS LAST) AS rn
        FROM abr_trim)
  WHERE rn = 1 AND lower(entity_status) = 'active'
),
cc_base AS (
  SELECT c_custkey,
         CASE WHEN c_custkey % 19 = 0 THEN NULL
              ELSE ' https://ex' || CAST(c_custkey AS VARCHAR) || '.com ' END AS website_url,
         CASE WHEN c_custkey % 23 = 0 THEN NULL
              ELSE reverse(regexp_replace(lower(trim(c_name)), '^[a-z]+#', '')) END AS company_name
  FROM customer
),
cc_raw AS (
  SELECT website_url, company_name FROM cc_base
  UNION ALL
  SELECT website_url, company_name FROM cc_base WHERE c_custkey % 4 = 0
),
cc_clean AS (
  SELECT substr(trim(website_url), 1, 500) AS website_url,
         company_name  -- titlecase+collapse is identity on digit names
  FROM (SELECT *, row_number() OVER (PARTITION BY website_url, company_name
                                     ORDER BY website_url) AS rn
        FROM cc_raw
        WHERE website_url IS NOT NULL AND company_name IS NOT NULL)
  WHERE rn = 1
),
scored AS (
  SELECT cc.website_url, cc.company_name, a.abn, a.entity_name, a.postcode,
         100.0 * (1.0 - CAST(levenshtein({norm_c}, {norm_a}) AS DOUBLE)
                  / CAST(greatest(length({norm_c}), length({norm_a}), 1) AS DOUBLE)
                 ) AS score
  FROM cc_clean cc JOIN abr_clean a
    ON substr(lower(trim(cc.company_name)), 1, 2)
     = substr(lower(trim(a.entity_name)), 1, 2)
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY website_url
                               ORDER BY score DESC, abn) AS rn
  FROM scored WHERE score >= 85.0
),
newm AS (
  SELECT website_url, company_name, abn, entity_name, postcode,
         round(score / 100.0, 3) AS match_confidence
  FROM ranked WHERE rn = 1
),
existing AS (
  SELECT website_url, company_name, abn,
         entity_name || ' (stale)' AS entity_name, postcode,
         CASE WHEN CAST(abn AS BIGINT) % 4 = 0
              THEN round(match_confidence * 0.5, 3)
              ELSE round(least(match_confidence * 1.2, 1.0), 3)
         END AS match_confidence
  FROM newm WHERE CAST(abn AS BIGINT) % 2 = 0
  UNION ALL
  SELECT 'https://legacy.example', 'Legacy Pty Ltd', '99999999999',
         'legacy holdings', '0000', 0.999
),
joined AS (
  SELECT e.website_url AS e_url, e.company_name AS e_name, e.abn AS e_abn,
         e.entity_name AS e_ent, e.postcode AS e_pc,
         e.match_confidence AS e_conf,
         u.website_url AS u_url, u.company_name AS u_name, u.abn AS u_abn,
         u.entity_name AS u_ent, u.postcode AS u_pc,
         u.match_confidence AS u_conf,
         (u.abn IS NOT NULL AND (e.abn IS NULL OR (
             ((e.company_name IS DISTINCT FROM u.company_name)
              OR (e.entity_name IS DISTINCT FROM u.entity_name)
              OR (e.postcode IS DISTINCT FROM u.postcode)
              OR (e.match_confidence IS DISTINCT FROM u.match_confidence))
             AND u.match_confidence > e.match_confidence))) AS take_u
  FROM existing e FULL OUTER JOIN newm u
    ON e.abn = u.abn AND e.website_url = u.website_url
)
SELECT CASE WHEN take_u THEN u_url ELSE e_url END AS website_url,
       CASE WHEN take_u THEN u_name ELSE e_name END AS company_name,
       CASE WHEN take_u THEN u_abn ELSE e_abn END AS abn,
       CASE WHEN take_u THEN u_ent ELSE e_ent END AS entity_name,
       CASE WHEN take_u THEN u_pc ELSE e_pc END AS postcode,
       CASE WHEN take_u THEN u_conf ELSE e_conf END AS match_confidence
FROM joined
"""


@register("reference_pipeline_matches", _ref_pipeline_oracle())
def q_reference_pipeline_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's WHOLE DAG as one oracle-checked query (round-6
    verdict #6; reference dags/etl_pipeline.py:91-103): ABR-shaped and
    CC-shaped fixtures derive deterministically from supplier/customer
    (invalid ABNs, bad postcodes, cancelled entities, NULL urls,
    full-row + keyed duplicates planted to exercise every cleaning
    rule), then clean_abr_companies -> clean_common_crawl_companies ->
    match_entities (blocked fuzzy top-1) -> merge_matches
    (greater-confidence-wins against a stale prior table with an
    existing-only legacy row). The DuckDB twin replays every stage —
    filters, dedup windows, token_sort levenshtein scoring, the merge's
    null-safe changed test and confidence predicate.

    Fixture name geometry: names strip to 9-digit strings REVERSED so
    the reference's 2-char-prefix blocking yields ~100 uniform blocks
    (un-reversed, every name starts '00' — one degenerate block, the
    skew case SURVEY §7.4 warns about)."""
    from firmable_aus_etl_spark import pipelines

    strip = lambda c: F.regexp_replace(F.lower(F.trim(c)), "^[a-z]+#", "")  # noqa: E731

    supp = load_table(spark, sf_dir, "supplier")
    k = F.col("s_suppkey")
    abr_base = supp.select(
        k.alias("s_suppkey"),
        F.when(
            k % 13 == 0,
            F.concat(F.lpad(k.cast("string"), 10, "0"), F.lit("X")),
        ).otherwise(F.lpad(k.cast("string"), 11, "0")).alias("abn"),
        F.concat(F.lit("  "), F.reverse(strip(F.col("s_name")))).alias("entity_name"),
        F.lit("company").alias("entity_type"),
        F.when(k % 10 == 9, "CANCELLED").otherwise(" Active ").alias("entity_status"),
        F.col("s_nationkey").cast("string").alias("state"),
        F.when(k % 7 == 0, "")
        .when(k % 11 == 0, "12b4")
        .otherwise(
            F.lpad(((F.col("s_nationkey") * 37 + 11) % 10000).cast("string"), 4, "0")
        )
        .alias("postcode"),
    )
    cols = ["abn", "entity_name", "entity_type", "entity_status", "state", "postcode"]
    abr_raw = (
        abr_base.select(*cols)
        .unionByName(abr_base.filter(k % 3 == 0).select(*cols))
        .unionByName(
            abr_base.filter(k % 5 == 0).select(
                "abn",
                F.concat(F.lit("zz "), F.col("entity_name")).alias("entity_name"),
                "entity_type", "entity_status", "state", "postcode",
            )
        )
    )
    abr = pipelines.clean_abr_companies(abr_raw)

    cust = load_table(spark, sf_dir, "customer")
    ck = F.col("c_custkey")
    cc_base = cust.select(
        ck.alias("c_custkey"),
        F.when(ck % 19 == 0, F.lit(None).cast("string"))
        .otherwise(
            F.concat(F.lit(" https://ex"), ck.cast("string"), F.lit(".com "))
        )
        .alias("website_url"),
        F.when(ck % 23 == 0, F.lit(None).cast("string"))
        .otherwise(F.reverse(strip(F.col("c_name"))))
        .alias("company_name"),
    )
    cc_raw = cc_base.select("website_url", "company_name").unionByName(
        cc_base.filter(ck % 4 == 0).select("website_url", "company_name")
    )
    cc = pipelines.clean_common_crawl_companies(cc_raw)

    new_m = pipelines.match_entities(cc, abr, threshold=85.0).select(
        "website_url", "company_name", "abn", "entity_name", "postcode",
        "match_confidence",
    )
    abn_l = F.col("abn").cast("long")
    existing = new_m.filter(abn_l % 2 == 0).select(
        "website_url", "company_name", "abn",
        F.concat(F.col("entity_name"), F.lit(" (stale)")).alias("entity_name"),
        "postcode",
        F.when(abn_l % 4 == 0, F.round(F.col("match_confidence") * 0.5, 3))
        .otherwise(F.round(F.least(F.col("match_confidence") * 1.2, F.lit(1.0)), 3))
        .alias("match_confidence"),
    )
    legacy = spark.range(1).select(
        F.lit("https://legacy.example").alias("website_url"),
        F.lit("Legacy Pty Ltd").alias("company_name"),
        F.lit("99999999999").alias("abn"),
        F.lit("legacy holdings").alias("entity_name"),
        F.lit("0000").alias("postcode"),
        F.lit(0.999).alias("match_confidence"),
    )
    return pipelines.merge_matches(existing.unionByName(legacy), new_m)
