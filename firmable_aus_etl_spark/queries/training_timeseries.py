"""Query-registry part: see section header below.

Split from the monolithic queries.py (round-9, verdict Next #6);
registration order preserved by the package __init__ import order.
"""

from __future__ import annotations

from firmable_aus_etl_spark.queries._base import *  # noqa: F401,F403

# =========================================================================
# Training-data pipeline surface II: deterministic splits, leave-one-out
# encoding, LLM chunking, PII redaction; time-series surface II:
# gaps-and-islands, forward fill, per-group mode.
# =========================================================================

_HEXVAL = "strpos('0123456789abcdef', {c}) - 1"


@register(
    "train_test_split_hash",
    f"""
    WITH h AS (
      SELECT doc_id, n_chars, md5(CAST(doc_id AS VARCHAR)) AS hx
      FROM documents
    ), b AS (
      SELECT doc_id, n_chars,
             16 * ({_HEXVAL.format(c="substr(hx, 1, 1)")})
                + ({_HEXVAL.format(c="substr(hx, 2, 1)")}) AS bucket
      FROM h
    )
    SELECT CASE WHEN bucket < 204 THEN 'train'
                WHEN bucket < 230 THEN 'val'
                ELSE 'test' END AS split,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM b GROUP BY 1
    """,
)
def q_train_test_split_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split by key hash — the standard
    leakage-proof split for a training corpus: assignment depends only
    on doc_id (never on partitioning, row order, or a seed table), so
    re-runs and incremental appends land every doc in the same split.
    Bucket = first byte of md5 (0..255): <204 train (~80%), <230 val
    (~10%), else test (~10%). At 100 TB this is a map-only projection —
    no shuffle until the audit aggregation."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2), 16, 10).cast("int")
    return (
        docs.select(
            F.when(bucket < 204, "train")
            .when(bucket < 230, "val")
            .otherwise("test")
            .alias("split"),
            "n_chars",
        )
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


@register(
    "loo_avg_order_value",
    """
    WITH c AS (
      SELECT o_orderkey, o_custkey,
             CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents,
             CAST(count(*) OVER (PARTITION BY o_custkey) AS BIGINT) AS n,
             CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
                  OVER (PARTITION BY o_custkey) AS BIGINT) AS total_cents
      FROM orders
    )
    SELECT o_orderkey, o_custkey,
           CAST(total_cents - cents AS DOUBLE) / CAST(n - 1 AS DOUBLE) / 100.0
             AS loo_avg
    FROM c WHERE n >= 2
    """,
)
def q_loo_avg_order_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out mean of the customer's other orders — the
    target-encoding primitive (each row's feature excludes its own
    target to avoid leakage). One window over the group key computes
    sum and count; LOO = (total - own)/(n-1) needs no self-join.
    Integer-cents arithmetic keeps the division bit-identical across
    engines."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    c = orders.select(
        "o_orderkey",
        "o_custkey",
        _cents(F.col("o_totalprice")).alias("cents"),
    ).select(
        "o_orderkey",
        "o_custkey",
        "cents",
        F.count("*").over(w).alias("n"),
        F.sum("cents").over(w).alias("total_cents"),
    )
    return c.filter(F.col("n") >= 2).select(
        "o_orderkey",
        "o_custkey",
        (
            (F.col("total_cents") - F.col("cents")).cast("double")
            / (F.col("n") - 1).cast("double")
            / 100.0
        ).alias("loo_avg"),
    )


@register(
    "doc_chunks_overlap",
    """
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks
      FROM documents WHERE lang = 'en'
    ), starts AS (
      SELECT doc_id, toks,
             unnest(generate_series(0, len(toks) - 1, 25)) AS start
      FROM t
    )
    SELECT doc_id,
           CAST(start / 25 AS BIGINT) AS chunk_idx,
           CAST(len(toks[start + 1 : start + 50]) AS BIGINT) AS chunk_len,
           md5(array_to_string(toks[start + 1 : start + 50], ' ')) AS chunk_md5
    FROM starts
    """,
)
def q_doc_chunks_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LLM-context chunking: split each document into 50-token windows
    with stride 25 (50% overlap) — sequence() + explode + slice(), all
    native array ops, no UDF. Emits a content hash per chunk so the
    oracle gates the exact chunk text. At 100 TB chunking is map-only;
    downstream dedup/packing reuse the standard operators."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("lang") == "en")
    t = docs.select("doc_id", F.split("text", " ").alias("toks"))
    starts = t.select(
        "doc_id",
        "toks",
        F.explode(
            F.sequence(F.lit(0), F.size("toks") - 1, F.lit(25))
        ).alias("start"),
    )
    chunk = F.slice(F.col("toks"), F.col("start") + 1, 50)
    return starts.select(
        "doc_id",
        (F.col("start") / 25).cast("long").alias("chunk_idx"),
        F.size(chunk).cast("long").alias("chunk_len"),
        F.md5(F.concat_ws(" ", chunk)).alias("chunk_md5"),
    )


@register(
    "pii_redact_documents",
    r"""
    WITH synth AS (
      SELECT doc_id,
             'contact user' || CAST(doc_id AS VARCHAR) || '@example.com or +61 4'
               || lpad(CAST(doc_id % 100000000 AS VARCHAR), 8, '0') || ' re: '
               || substr(text, 1, 40) AS raw
      FROM documents
    )
    SELECT doc_id,
           regexp_replace(
             regexp_replace(raw, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                            '[EMAIL]', 'g'),
             '\+?[0-9][0-9 ]{7,14}[0-9]', '[PHONE]', 'g') AS redacted
    FROM synth
    """,
)
def q_pii_redact_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing for a training corpus: email and phone patterns
    replaced with typed placeholder tokens, pure regexp_replace — a
    map-only pass that pipelines with chunking and dedup. The fixture
    text carries no live PII, so deterministic synthetic contact lines
    (derived from doc_id) are planted first; the oracle gates the
    redacted output byte-for-byte."""
    docs = load_table(spark, sf_dir, "documents")
    raw = F.concat(
        F.lit("contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or +61 4"),
        F.lpad((F.col("doc_id") % 100000000).cast("string"), 8, "0"),
        F.lit(" re: "),
        F.substring("text", 1, 40),
    )
    email = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    phone = r"\+?[0-9][0-9 ]{7,14}[0-9]"
    return docs.select(
        "doc_id",
        F.regexp_replace(
            F.regexp_replace(raw, email, "[EMAIL]"), phone, "[PHONE]"
        ).alias("redacted"),
    )


@register(
    "interval_islands_events",
    """
    WITH iv AS (
      SELECT user_id, event_id,
             epoch_us(ts) AS s,
             epoch_us(ts) + 300000000 AS e
      FROM events
    ), m AS (
      SELECT user_id, event_id, s, e,
             max(e) OVER (PARTITION BY user_id ORDER BY s, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS prev_max_e
      FROM iv
    ), flagged AS (
      SELECT user_id, s, e,
             CASE WHEN prev_max_e IS NULL OR s > prev_max_e THEN 1 ELSE 0 END
               AS new_island
      FROM m
    ), isl AS (
      SELECT user_id, s, e,
             sum(new_island) OVER (PARTITION BY user_id ORDER BY s, e
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS island_id
      FROM flagged
    ), spans AS (
      SELECT user_id, island_id, min(s) AS i_start, max(e) AS i_end
      FROM isl GROUP BY user_id, island_id
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_islands,
           CAST(sum(i_end - i_start) AS BIGINT) AS covered_us
    FROM spans GROUP BY user_id
    """,
)
def q_interval_islands_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: each event covers [ts, ts+5min]; overlapping
    intervals merge into islands via the cumulative-max-end window (no
    self-join, one shuffle on user_id reused by every window). Emits
    per-user island count and exact covered time — the classic
    coverage/uptime shape. Arithmetic on unix_micros longs keeps sums
    order-independent."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("s"),
        (F.unix_micros("ts") + 300_000_000).alias("e"),
    )
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("s", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    m = ev.withColumn("prev_max_e", F.max("e").over(w_prev))
    flagged = m.select(
        "user_id",
        "s",
        "e",
        F.when(
            F.col("prev_max_e").isNull() | (F.col("s") > F.col("prev_max_e")), 1
        )
        .otherwise(0)
        .alias("new_island"),
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    isl = flagged.withColumn("island_id", F.sum("new_island").over(w_run))
    spans = isl.groupBy("user_id", "island_id").agg(
        F.min("s").alias("i_start"), F.max("e").alias("i_end")
    )
    return spans.groupBy("user_id").agg(
        F.count("*").alias("n_islands"),
        F.sum(F.col("i_end") - F.col("i_start")).alias("covered_us"),
    )


@register(
    "forward_fill_events",
    """
    SELECT event_id, user_id,
           last_value(CASE WHEN event_type = 'error' THEN NULL ELSE value END
                      IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
    FROM events
    """,
)
def q_forward_fill_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward fill (LOCF): error rows lose their reading and inherit
    the user's most recent non-null value — last(ignoreNulls) over an
    unbounded-preceding row frame, the sensor/time-series repair
    primitive. No arithmetic touches the carried value, so the oracle
    hash is exact."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    nulled = F.when(F.col("event_type") == "error", F.lit(None).cast("double")).otherwise(
        F.col("value")
    )
    return ev.select(
        "event_id",
        "user_id",
        F.last(nulled, ignorenulls=True).over(w).alias("filled"),
    )


@register(
    "mode_event_type_per_user",
    """
    WITH c AS (
      SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY user_id, event_type
    ), r AS (
      SELECT *, row_number() OVER (PARTITION BY user_id
                                   ORDER BY n DESC, event_type) AS rn
      FROM c
    )
    SELECT user_id, event_type AS mode_event_type, n AS n_occurrences
    FROM r WHERE rn = 1
    """,
)
def q_mode_event_type_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group mode with a pinned tie-break (count desc, then value
    asc) — statistical mode as count + top-1 window, deterministic
    where a native mode() would be free to pick either of two equally
    frequent values."""
    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("n"))
    top = topk_per_group(
        c, ["user_id"], [F.col("n").desc(), F.col("event_type").asc()], k=1
    )
    return top.select(
        "user_id",
        F.col("event_type").alias("mode_event_type"),
        F.col("n").alias("n_occurrences"),
    )


# Round-7 (verdict #5): the packing stage moves under the hash gate.
# Next-fit-decreasing's whole state is one (bin, remaining) pair folded
# over the ranked rows — cumsum-with-reset, i.e. a recursive CTE: the
# anchor seeds each group's rank-1 row, every step consumes rank rn+1
# and either joins the open bin or opens bin+1. Groups recurse in
# lockstep (one iteration per rank), so recursion depth = max group
# size. Oversize chunks (toks >= 512) carry remaining 0 — their own
# closed bin, both engines.
_PACK_ORACLE = """
WITH RECURSIVE t AS (
  SELECT doc_id, string_split(text, ' ') AS toks
  FROM documents WHERE lang = 'en'
), starts AS (
  SELECT doc_id, toks,
         unnest(generate_series(0, len(toks) - 1, 25)) AS start
  FROM t
), chunks AS (
  SELECT doc_id * 1000 + CAST(start / 25 AS BIGINT) AS cid,
         CAST(len(toks[start + 1 : start + 50]) AS BIGINT) AS toks
  FROM starts
), ranked AS (
  SELECT cid % 16 AS g, cid, toks,
         row_number() OVER (PARTITION BY cid % 16
                            ORDER BY toks DESC, cid) AS rn
  FROM chunks
), rec AS (
  SELECT g, rn, cid, toks, CAST(0 AS BIGINT) AS bin,
         CASE WHEN toks < 512 THEN 512 - toks ELSE CAST(0 AS BIGINT) END AS rem
  FROM ranked WHERE rn = 1
  UNION ALL
  SELECT x.g, x.rn, x.cid, x.toks,
         CASE WHEN x.toks < 512 AND x.toks <= r.rem
              THEN r.bin ELSE r.bin + 1 END,
         CASE WHEN x.toks < 512 AND x.toks <= r.rem THEN r.rem - x.toks
              WHEN x.toks < 512 THEN 512 - x.toks
              ELSE CAST(0 AS BIGINT) END
  FROM rec r JOIN ranked x ON x.g = r.g AND x.rn = r.rn + 1
)
SELECT g AS pack_group, bin AS example_id,
       count(*) AS n_chunks,
       CAST(sum(toks) AS BIGINT) AS total_tokens,
       list_sort(list(cid)) AS chunk_ids
FROM rec GROUP BY g, bin
"""


@register("pack_chunks_512", _PACK_ORACLE)
def q_pack_chunks_512(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing (LLM-pipeline stage after chunking/dedup):
    50-token chunks packed into 512-token training examples with
    deterministic sharded next-fit-decreasing (operators/packing.py
    policy='nextfit', group='mod' — both chosen for exact ANSI-SQL
    replayability, so the whole tokenize → chunk → pack step sits
    under the recursive-CTE hash gate; the better-fill FFD policy
    stays available and property-tested in tests/test_packing.py)."""
    from firmable_aus_etl_spark.operators.packing import pack_chunks

    chunks = QUERIES["doc_chunks_overlap"](spark, sf_dir).select(
        (F.col("doc_id") * 1000 + F.col("chunk_idx")).alias("chunk_id"),
        F.col("chunk_len").alias("n_tokens"),
    )
    packed = pack_chunks(
        chunks, id_col="chunk_id", tokens_col="n_tokens", budget=512,
        groups=16, policy="nextfit", group_mode="mod",
    )
    return packed.select(
        "pack_group",
        "example_id",
        "n_chunks",
        "total_tokens",
        F.array_sort("chunk_ids").alias("chunk_ids"),
    )


@register(
    "quantize_embeddings_int8",
    """
    WITH s AS (
      SELECT vec_id, label, embedding,
             CAST(list_max(list_transform(embedding, x -> abs(x))) AS DOUBLE)
               / 127.0 AS scale
      FROM embeddings
    )
    SELECT vec_id, label,
           CAST(floor(scale * 1000000000.0 + 0.5) AS BIGINT) AS scale_nano,
           CAST(list_sum(list_transform(embedding,
                x -> CAST(floor(CAST(x AS DOUBLE) / scale + 0.5) AS BIGINT)))
             AS BIGINT) AS q_sum,
           CAST(list_max(list_transform(embedding,
                x -> abs(CAST(floor(CAST(x AS DOUBLE) / scale + 0.5) AS BIGINT))))
             AS BIGINT) AS q_absmax
    FROM s
    """,
)
def q_quantize_embeddings_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 vector quantization — the storage/serving scale
    path for an embedding corpus (4x smaller than float32, SIMD dot
    products downstream): per-vector scale = max|x|/127, q =
    floor(x/scale + 0.5) (explicit half-up — identical in both engines,
    unlike round(); same for the nano-scaled integer scale column).
    The oracle gates the quantized sum and the |q| <= 127 invariant
    per vector; all array math is native transform/aggregate — no UDF,
    map-only at scale."""
    emb = load_table(spark, sf_dir, "embeddings")
    scale = F.aggregate(
        F.transform("embedding", lambda x: F.abs(x)),
        F.lit(0.0).cast("float"),
        lambda acc, x: F.greatest(acc, x),
    ).cast("double") / 127.0
    s = emb.select("vec_id", "label", "embedding", scale.alias("scale"))
    q = F.transform(
        "embedding",
        lambda x: F.floor(x.cast("double") / F.col("scale") + 0.5).cast("long"),
    )
    return s.select(
        "vec_id",
        "label",
        F.floor(F.col("scale") * 1e9 + 0.5).cast("long").alias("scale_nano"),
        F.aggregate(q, F.lit(0).cast("long"), lambda a, x: a + x).alias("q_sum"),
        F.aggregate(
            q, F.lit(0).cast("long"), lambda a, x: F.greatest(a, F.abs(x))
        ).alias("q_absmax"),
    )


@register(
    "zscore_order_value",
    """
    WITH c AS (
      SELECT o_orderkey, o_custkey,
             CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
      FROM orders
    ), st AS (
      SELECT o_orderkey, o_custkey, cents,
             CAST(count(*) OVER w AS BIGINT) AS n,
             CAST(sum(cents) OVER w AS BIGINT) AS s,
             CAST(sum(cents * cents) OVER w AS BIGINT) AS q
      FROM c
      WINDOW w AS (PARTITION BY o_custkey)
    )
    SELECT o_orderkey, o_custkey,
           CAST(n * cents - s AS DOUBLE)
             / (CAST(n AS DOUBLE)
                * sqrt(CAST(n * q - s * s AS DOUBLE)
                       / CAST(n * (n - 1) AS DOUBLE))) AS z
    FROM st
    WHERE n >= 2 AND n * q - s * s > 0
    """,
)
def q_zscore_order_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-wise z-score normalization (feature standardization per
    entity) computed EXACTLY: variance from integer count/sum/sum-sq
    windows — (n*Q - S^2)/(n*(n-1)) — so the only floating-point steps
    (one division, one sqrt, correctly rounded under IEEE 754) are
    bit-identical across engines; no stddev_samp accumulation-order
    noise, no rounding needed. One window per group key, no self-join."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    c = orders.select(
        "o_orderkey", "o_custkey", _cents(F.col("o_totalprice")).alias("cents")
    )
    st = c.select(
        "o_orderkey",
        "o_custkey",
        "cents",
        F.count("*").over(w).alias("n"),
        F.sum("cents").over(w).alias("s"),
        F.sum(F.col("cents") * F.col("cents")).over(w).alias("q"),
    )
    num = (F.col("n") * F.col("cents") - F.col("s")).cast("double")
    var = (F.col("n") * F.col("q") - F.col("s") * F.col("s")).cast("double") / (
        F.col("n") * (F.col("n") - 1)
    ).cast("double")
    return st.filter(
        (F.col("n") >= 2) & (F.col("n") * F.col("q") - F.col("s") * F.col("s") > 0)
    ).select(
        "o_orderkey",
        "o_custkey",
        (num / (F.col("n").cast("double") * F.sqrt(var))).alias("z"),
    )


@register(
    "feature_hash_documents",
    """
    WITH toks AS (
      SELECT doc_id,
             unnest(string_split(lower(trim(text)), ' ')) AS t
      FROM documents
    ), b AS (
      SELECT doc_id,
             (16 * (strpos('0123456789abcdef', substr(md5(t), 1, 1)) - 1)
                 + (strpos('0123456789abcdef', substr(md5(t), 2, 1)) - 1)) % 64
               AS bucket
      FROM toks WHERE t <> ''
    )
    SELECT doc_id, CAST(bucket AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS cnt
    FROM b GROUP BY doc_id, bucket
    """,
)
def q_feature_hash_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hashing trick (HashingTF without MLlib): token -> fixed
    64-bucket id via a portable md5-byte hash, emitted as the sparse
    (doc_id, bucket, count) relation. Fixed dimensionality regardless
    of vocabulary — the property that lets a 100 TB corpus featurize
    map-only with no vocabulary broadcast or fit pass."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim("text")), " ")).alias("t"),
    ).filter(F.col("t") != "")
    bucket = (
        F.conv(F.substring(F.md5("t"), 1, 2), 16, 10).cast("long") % 64
    ).alias("bucket")
    return toks.select("doc_id", bucket).groupBy("doc_id", "bucket").agg(
        F.count("*").alias("cnt")
    )


@register(
    "weighted_source_mix",
    """
    WITH w AS (
      SELECT doc_id, source,
             (CAST(substr(source, 4) AS INTEGER) % 3) + 1 AS wt,
             md5(CAST(doc_id AS VARCHAR)) AS h
      FROM documents
    ), r AS (
      SELECT *, row_number() OVER (PARTITION BY source ORDER BY h, doc_id) AS rn
      FROM w
    )
    SELECT doc_id, source FROM r WHERE rn <= wt * 5
    """,
)
def q_weighted_source_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus mixing: sample each source to a quota proportional to its
    mix weight (here wt in {1,2,3} derived from the source id, quota =
    5*wt docs) under deterministic md5-hash order — the reproducible,
    layout-independent way to hit target source proportions in a
    training mix. Same WindowGroupLimit shape as stratified sampling,
    so the per-source top-quota scan never materializes the full sort."""
    docs = load_table(spark, sf_dir, "documents")
    w = docs.select(
        "doc_id",
        "source",
        ((F.substring("source", 4, 10).cast("int") % 3) + 1).alias("wt"),
        F.md5(F.col("doc_id").cast("string")).alias("h"),
    )
    from pyspark.sql import Window

    win = Window.partitionBy("source").orderBy(F.col("h").asc(), F.col("doc_id").asc())
    return (
        w.withColumn("rn", F.row_number().over(win))
        .filter(F.col("rn") <= F.col("wt") * 5)
        .select("doc_id", "source")
    )


@register(
    "decontaminate_documents",
    """
    WITH toks AS (
      SELECT doc_id, source, string_split(lower(trim(text)), ' ') AS w
      FROM documents
    ), grams AS (
      SELECT doc_id, source,
             array_to_string(w[i : i + 7], ' ') AS g
      FROM (SELECT doc_id, source, w,
                   unnest(generate_series(1, len(w) - 7)) AS i
            FROM toks WHERE len(w) >= 8)
    ), eval_grams AS (
      SELECT DISTINCT g FROM grams WHERE source = 'src0'
    ), train_grams AS (
      SELECT DISTINCT doc_id, g FROM grams WHERE source <> 'src0'
    )
    SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_shared_grams
    FROM train_grams t JOIN eval_grams e ON t.g = e.g
    GROUP BY t.doc_id
    """,
)
def q_decontaminate_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (the n-gram overlap pass every honest
    LLM training pipeline runs): treating source src0 as the eval set,
    find training docs sharing any 8-gram with it and how many
    distinct 8-grams leak. The flagged set is what a real pipeline
    anti-joins away. Gram generation is native sequence+slice (no
    UDF); gram strings never leave the map stage — the distinct and
    the overlap join run on xxhash64 keys, 8-byte shuffle rows instead
    of ~50-byte strings (round-6; the fingerprint-family move, same
    2^-64 collision caveat surfaced by the oracle hash gate)."""
    from firmable_aus_etl_spark.operators.partitioning import ensure_parallelism

    docs = ensure_parallelism(
        load_table(spark, sf_dir, "documents"), "doc_id"
    )  # single-file input: spread the tokenize/explode (no-op at scale)
    toks = docs.select(
        "doc_id", "source", F.split(F.lower(F.trim("text")), " ").alias("w")
    ).filter(F.size("w") >= 8)
    grams = toks.select(
        "doc_id",
        "source",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("w") - 7),
                lambda i: F.xxhash64(
                    F.concat_ws(" ", F.slice(F.col("w"), i, 8))
                ),
            )
        ).alias("gh"),
    )
    # the eval set is the SMALL side by construction (one source vs the
    # rest of the corpus) — broadcast it so the train grams never
    # shuffle at all on the overlap join; remaining exchanges are the
    # train distinct (on 8-byte hashes) and the final per-doc count
    eval_grams = F.broadcast(
        grams.filter(F.col("source") == "src0").select("gh").distinct()
    )
    train_grams = (
        grams.filter(F.col("source") != "src0").select("doc_id", "gh").distinct()
    )
    return (
        train_grams.join(eval_grams, "gh")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_shared_grams"))
    )


@register(
    "remove_repeated_segments",
    """
    WITH toks AS (
      SELECT doc_id, string_split(lower(trim(text)), ' ') AS w
      FROM documents
    ), segs AS (
      SELECT doc_id, i AS pos,
             array_to_string(w[i : i + 4], ' ') AS seg
      FROM (SELECT doc_id, w, unnest(generate_series(1, len(w), 5)) AS i
            FROM toks)
    ), freq AS (
      SELECT seg, count(DISTINCT doc_id) AS nd FROM segs GROUP BY seg
    ), kept AS (
      SELECT s.doc_id, s.pos, s.seg
      FROM segs s JOIN freq f ON s.seg = f.seg
      WHERE f.nd < 3
    )
    SELECT d.doc_id,
           coalesce(k.cleaned, '') AS cleaned
    FROM documents d
    LEFT JOIN (SELECT doc_id, string_agg(seg, ' ' ORDER BY pos) AS cleaned
               FROM kept GROUP BY doc_id) k
      ON d.doc_id = k.doc_id
    """,
)
def q_remove_repeated_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style boilerplate removal at segment granularity: 5-token
    non-overlapping segments occurring in >= 3 distinct documents
    (navigation chrome, cookie banners, license footers at web scale)
    are dropped from every document; surviving segments reassemble in
    position order. Two shuffles (segment frequency, doc reassembly),
    everything native — the reassembly is sort_array(collect_list(
    struct(pos, seg))) so order is deterministic under any
    partitioning."""
    from firmable_aus_etl_spark.operators.partitioning import ensure_parallelism

    docs = ensure_parallelism(
        load_table(spark, sf_dir, "documents"), "doc_id"
    )  # single-file input: spread the tokenize/explode (no-op at scale)
    toks = docs.select(
        "doc_id", F.split(F.lower(F.trim("text")), " ").alias("w")
    )
    segs = toks.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("w"), F.lit(5)),
                lambda i: F.struct(
                    i.alias("pos"),
                    F.concat_ws(" ", F.slice(F.col("w"), i, 5)).alias("seg"),
                ),
            )
        ).alias("s"),
    ).select("doc_id", F.col("s.pos").alias("pos"), F.col("s.seg").alias("seg"))
    # only the BOILERPLATE segments (>= 3 distinct docs) matter for
    # filtering, and they are few by nature — broadcast the blocklist
    # and anti-join. Frequency + blocklist key on xxhash64 of the
    # segment (round-6): 8-byte shuffle/broadcast rows instead of
    # 5-token strings; the original seg stays in the row for reassembly
    segs = segs.withColumn("sh", F.xxhash64("seg"))
    blocklist = F.broadcast(
        segs.groupBy("sh")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 3)
        .select("sh")
    )
    kept = segs.join(blocklist, "sh", "left_anti")
    rebuilt = kept.groupBy("doc_id").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "seg"))),
                lambda x: x.seg,
            ),
        ).alias("cleaned")
    )
    return docs.select("doc_id").join(rebuilt, "doc_id", "left").select(
        "doc_id", F.coalesce("cleaned", F.lit("")).alias("cleaned")
    )


@register(
    "remove_repeated_spans",
    """
    WITH toks AS (
      SELECT doc_id, string_split(lower(trim(text)), ' ') AS w
      FROM documents
    ), pos AS (
      SELECT doc_id, i AS p, w[i] AS tok
      FROM (SELECT doc_id, w, unnest(generate_series(1, len(w))) AS i
            FROM toks)
    ), starts AS (
      SELECT doc_id, i, array_to_string(w[i : i + 7], ' ') AS g
      FROM (SELECT doc_id, w, unnest(generate_series(1, len(w) - 7)) AS i
            FROM toks)
    ), dup AS (
      SELECT g FROM starts GROUP BY g HAVING count(DISTINCT doc_id) >= 3
    ), dupstart AS (
      SELECT s.doc_id, s.i FROM starts s JOIN dup USING (g)
    ), covered AS (
      SELECT DISTINCT p.doc_id, p.p
      FROM pos p JOIN dupstart d
        ON p.doc_id = d.doc_id AND d.i BETWEEN p.p - 7 AND p.p
    ), kept AS (
      SELECT p.doc_id, p.p, p.tok
      FROM pos p LEFT JOIN covered c ON p.doc_id = c.doc_id AND p.p = c.p
      WHERE c.p IS NULL
    )
    SELECT d.doc_id,
           coalesce(k.cleaned, '') AS cleaned,
           CAST(coalesce(r.nc, 0) AS BIGINT) AS n_removed
    FROM documents d
    LEFT JOIN (SELECT doc_id, string_agg(tok, ' ' ORDER BY p) AS cleaned
               FROM kept GROUP BY doc_id) k ON d.doc_id = k.doc_id
    LEFT JOIN (SELECT doc_id, count(*) AS nc
               FROM covered GROUP BY doc_id) r ON d.doc_id = r.doc_id
    """,
)
def q_remove_repeated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-doc repeated-SPAN removal at sliding 8-gram granularity
    (operators/dedup.remove_repeated_spans): boilerplate is caught at
    ANY token offset — the arbitrary-offset upgrade of
    remove_repeated_segments' fixed 5-token segment grid. A token is
    removed iff covered by an 8-gram occurring in >= 3 distinct docs;
    survivors reassemble in position order, with the removed-token
    count per doc. The DuckDB twin recomputes the same
    gram-frequency -> coverage -> reassembly pipeline in SQL."""
    from firmable_aus_etl_spark.operators import dedup

    docs = load_table(spark, sf_dir, "documents")
    return dedup.remove_repeated_spans(
        docs, "doc_id", "text", n=8, min_docs=3
    )

