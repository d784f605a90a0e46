"""Name-similarity scorers (SURVEY.md f12/u5).

The reference scores candidate pairs with rapidfuzz
``fuzz.token_sort_ratio`` (reference: ETL_PIPELINE_AUS/scripts/matching/
entity_matching.py:33, entity_matching_tfidf.py:170,
entity_matching_spark.py:39, entity_matching_optimized.py:104).

Two implementations, per SURVEY.md §7.4:

1. ``token_sort_ratio_expr`` — pure column expression:
   ``100 * (1 - levenshtein(a', b') / greatest(len(a'), len(b'), 1))``
   over token-sorted normalized strings. JVM-side, codegen-friendly,
   SQL-portable (the DuckDB oracle runs the identical formula), and the
   variant used on every benchmarked hot path.

2. ``token_sort_ratio_udf`` — faithful rapidfuzz-style indel ratio as an
   Arrow-batched pandas UDF (rapidfuzz itself is an optional import with
   a pure-Python fallback). Kept OFF hot paths; exists for reference
   parity where the indel (LCS-based) ratio differs from the
   levenshtein-based expression.

Known semantic delta (documented per SURVEY §7.4): rapidfuzz's ratio is
``(len_a + len_b - indel_distance) / (len_a + len_b)`` — substitutions
count twice. The expression variant uses plain levenshtein over max-len.
Both are monotone in edit distance; thresholds were re-validated on the
golden micro-fixture in tests/test_similarity.py.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

try:  # optional accelerator; NOT on any benchmarked path
    from rapidfuzz import fuzz as _rf_fuzz  # type: ignore
except Exception:  # pragma: no cover - container has no rapidfuzz
    _rf_fuzz = None


def normalize_name(col: Column | str) -> Column:
    """lower + trim + collapse internal whitespace.

    reference: entity_matching.py:19-22 (lower/strip),
    clean_common_crawl.py:13 (collapse spaces).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.lower(F.trim(c)), " +", " ")


def token_sort(col: Column | str) -> Column:
    """Rebuild the string from its sorted tokens ('pty ltd acme' -> 'acme ltd pty')."""
    c = normalize_name(col)
    return F.concat_ws(" ", F.sort_array(F.split(c, " ")))


def ratio_on_prepared(a: Column, b: Column) -> Column:
    """Levenshtein ratio over ALREADY token-sorted strings.

    Split out so similarity_join can precompute ``token_sort`` once per
    input row (O(n+m) normalization) instead of once per candidate pair
    (O(n*m)) — the normalize/sort expression dominates the scorer cost
    at scale, levenshtein on short prepped strings does not.
    """
    denom = F.greatest(F.length(a), F.length(b), F.lit(1))
    return F.lit(100.0) * (
        F.lit(1.0) - F.levenshtein(a, b).cast("double") / denom.cast("double")
    )


def token_sort_ratio_expr(left: Column | str, right: Column | str) -> Column:
    """Deterministic 0-100 similarity score, pure column expression.

    SQL-portable twin (DuckDB):
      100.0 * (1 - levenshtein(a, b)
               / greatest(length(a), length(b), 1))
    over  a = array_to_string(list_sort(string_split(norm, ' ')), ' ').
    """
    return ratio_on_prepared(token_sort(left), token_sort(right))


def _py_indel_ratio(a: str, b: str) -> float:
    """Pure-Python rapidfuzz-compatible ratio (indel distance based)."""
    if not a and not b:
        return 100.0
    la, lb = len(a), len(b)
    # LCS length via DP on the shorter string's row (O(la*lb) — fixture
    # scale only; the distributed path never calls this per-row in JVM).
    if la < lb:
        a, b, la, lb = b, a, lb, la
    prev = [0] * (lb + 1)
    for i in range(1, la + 1):
        cur = [0] * (lb + 1)
        ca = a[i - 1]
        for j in range(1, lb + 1):
            if ca == b[j - 1]:
                cur[j] = prev[j - 1] + 1
            else:
                cur[j] = cur[j - 1] if cur[j - 1] >= prev[j] else prev[j]
        prev = cur
    lcs = prev[lb]
    indel = la + lb - 2 * lcs
    return 100.0 * (1.0 - indel / (la + lb))


def _token_sort_py(s: str) -> str:
    return " ".join(sorted(s.lower().split()))


@pandas_udf(DoubleType())
def token_sort_ratio_udf(left: pd.Series, right: pd.Series) -> pd.Series:
    """Arrow-batched token_sort_ratio (rapidfuzz if present, else pure python).

    reference parity for fuzz.token_sort_ratio (entity_matching.py:33).
    """
    lefts = left.fillna("").astype(str)
    rights = right.fillna("").astype(str)
    if _rf_fuzz is not None:  # pragma: no cover
        return pd.Series(
            [_rf_fuzz.token_sort_ratio(a, b) for a, b in zip(lefts, rights)],
            dtype="float64",
        )
    return pd.Series(
        [
            _py_indel_ratio(_token_sort_py(a), _token_sort_py(b))
            for a, b in zip(lefts, rights)
        ],
        dtype="float64",
    )


def jaccard_tokens(left: Column | str, right: Column | str) -> Column:
    """Token-set Jaccard similarity as a pure expression.

    |A ∩ B| / |A ∪ B| over whitespace tokens. Used by the near-duplicate
    detection family; array_intersect/array_union stay JVM-side.
    """
    a = F.array_distinct(F.split(normalize_name(left), " "))
    b = F.array_distinct(F.split(normalize_name(right), " "))
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = F.size(F.array_union(a, b)).cast("double")
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))
