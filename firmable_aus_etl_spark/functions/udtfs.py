"""Python UDTFs — the table-function member of the UDF surface
(SURVEY §2.11: the reference has no UDTF; this widens the engine's
surface with the Spark 4 native API, same design rule as the rest of
the family: expressions first, Python only where a row genuinely
fans out into a variable-length table).

Each UDTF here has an expression-level twin already in the registry
(doc_chunks_overlap = sequence+explode+slice; warc record split =
mapInPandas) — the UDTF form exists for the API surface users coming
from DuckDB/Postgres table functions expect (`SELECT * FROM fn(...)`,
LATERAL joins), and the tests pin UDTF-vs-expression parity so the
two surfaces can never drift.

Scale note: a Python UDTF is a row-at-a-time fan-out worker (no Arrow
batching in the non-vectorized form) — fine for moderate fan-outs,
but the expression twin stays the hot-path default; that trade is the
module's documented contract, not an accident.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf


@udtf(returnType="chunk_idx: int, start_tok: int, chunk: string")
class ChunkText:
    """Overlapping token-window chunks of a document — the LLM
    context-window preprocessing step as a table function.

    eval(text, chunk_tokens, overlap_tokens) -> one row per chunk,
    matching the expression-level doc_chunks_overlap EXACTLY (windows
    start at every (chunk - overlap)-token stride while the start is
    inside the document, so trailing windows may be short) — the
    parity test holds the two surfaces together. Empty/whitespace
    text yields no rows.
    """

    def eval(self, text: str, chunk_tokens: int, overlap_tokens: int):
        toks = (text or "").split()
        step = max(chunk_tokens - overlap_tokens, 1)
        for idx, start in enumerate(range(0, len(toks), step)):
            yield idx, start, " ".join(toks[start : start + chunk_tokens])


@udtf(returnType="pos: int, bigram: string")
class Bigrams:
    """Adjacent token pairs of a text — the collocation-mining fan-out
    (expression twin: the zip_with/slice construction inside
    bigram_pmi_documents)."""

    def eval(self, text: str):
        toks = (text or "").split()
        for i in range(len(toks) - 1):
            yield i, toks[i] + " " + toks[i + 1]


@udtf(returnType="field: string, value: string")
class UnpivotRecord:
    """Key/value explosion of a delimited record string ('k=v;k2=v2')
    — the table-function form of schema-on-read unpivot; malformed
    segments (no '=') are skipped rather than failing the row."""

    def eval(self, record: str):
        for seg in (record or "").split(";"):
            if "=" in seg:
                k, v = seg.split("=", 1)
                if k.strip():
                    yield k.strip(), v.strip()


def register_udtfs(spark: SparkSession) -> None:
    """Make the table functions callable from SQL:
    ``SELECT ... FROM chunk_text(text, 128, 16)`` or LATERAL-joined
    against a documents table."""
    spark.udtf.register("chunk_text", ChunkText)
    spark.udtf.register("bigrams", Bigrams)
    spark.udtf.register("unpivot_record", UnpivotRecord)
