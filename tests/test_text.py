"""Text-analysis function tests (language ID, quality, fingerprints)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from firmable_aus_etl_spark.functions import text as T


def test_token_counts(spark):
    df = spark.createDataFrame([("the quick  brown fox",), ("", ), ("one",)], ["text"])
    rows = df.select(
        T.token_count("text").alias("n"), T.bpe_ish_token_count("text").alias("b")
    ).collect()
    assert rows[0].n == 4 and rows[0].b == 4
    assert rows[2].n == 1


def test_bpe_ish_splits_punct_and_digits(spark):
    df = spark.createDataFrame([("hello, world42 v2.0",)], ["text"])
    # tokens: hello , world 42 v 2 . 0 -> 8
    assert df.select(T.bpe_ish_token_count("text").alias("b")).first().b == 8


def test_language_id(spark):
    df = spark.createDataFrame(
        [
            ("the cat and the dog of the house",),   # en
            ("el perro y la casa de un gato que",),  # es
            ("der hund und die katze ist von ein",),  # de
            ("xyzzy qwerty plugh",),                  # no stopwords -> und
        ],
        ["text"],
    )
    out = [r.lang for r in df.select(T.language_id("text").alias("lang")).collect()]
    assert out == ["en", "es", "de", "und"]


def test_language_id_tie_breaks_alphabetically(spark):
    # 'la' is both es and fr; 'un' both es and fr -> equal scores; 'es' < 'fr'
    df = spark.createDataFrame([("la un la un",)], ["text"])
    assert df.select(T.language_id("text").alias("lang")).first().lang == "es"


def test_quality_score_bands(spark):
    good = " ".join(["the quick brown fox jumps over lazy dogs"] * 15)  # long, stopwordy
    short_junk = "zz"
    df = spark.createDataFrame([(good,), (short_junk,)], ["text"])
    rows = df.select(T.quality_score("text").alias("q")).collect()
    assert rows[0].q > 0.85
    assert rows[1].q < 0.2


def test_fingerprints_stable_and_normalizing(spark):
    df = spark.createDataFrame(
        [("Hello  World",), ("hello world",), ("different text",)], ["text"]
    )
    rows = df.select(
        T.fingerprint_md5("text").alias("m"), T.fingerprint_rolling("text").alias("r")
    ).collect()
    # case/whitespace-insensitive: first two identical
    assert rows[0].m == rows[1].m and rows[0].r == rows[1].r
    assert rows[0].m != rows[2].m and rows[0].r != rows[2].r
    assert 0 <= rows[0].r < T.ROLLING_MOD


def test_redact_pii(spark):
    df = spark.createDataFrame(
        [
            ("contact bob@example.com.au or see https://foo.au/x?y=1 now",),
            ("call +61 (02) 9999 1234 today",),
            ("nothing sensitive here",),
        ],
        ["text"],
    )
    out = [r.t for r in df.select(T.redact_pii("text").alias("t")).collect()]
    assert out[0] == "contact <EMAIL> or see <URL> now"
    assert out[1] == "call <PHONE> today"
    assert out[2] == "nothing sensitive here"


def test_dup_ngram_ratio(spark):
    df = spark.createDataFrame(
        [
            ("a b a b a b",),   # bigrams: ab ba ab ba ab -> 5 total, 2 distinct
            ("all words unique here now",),
            ("x",),             # shorter than n -> 1 whole-text gram, 0 dup
        ],
        ["text"],
    )
    out = [r.r for r in df.select(T.dup_ngram_ratio("text", 2).alias("r")).collect()]
    assert abs(out[0] - 3 / 5) < 1e-12
    assert out[1] == 0.0
    assert out[2] == 0.0


def test_char_trigrams(spark):
    df = spark.createDataFrame([("abcd",), ("ab",)], ["text"])
    rows = [r.g for r in df.select(T.char_trigrams("text").alias("g")).collect()]
    assert set(rows[0]) == {"abc", "bcd"}
    assert rows[1] == ["ab"]  # shorter than 3 -> whole string


def test_language_id_ngram(spark):
    df = spark.createDataFrame(
        [
            ("the cat and the dog of this house is here",),
            ("el perro y la casa de un gato que vive",),
            ("der hund und die katze ist von einem haus",),
            ("xqzwv jkpf ggh",),
        ],
        ["text"],
    )
    out = [r.lang for r in df.select(T.language_id_ngram("text").alias("lang")).collect()]
    assert out[0] == "en"
    assert out[1] == "es"
    assert out[2] == "de"
    assert out[3] == "und"
