"""Property tests for the dialect-paired expression library: the Spark and
DuckDB renderings of each template must agree on edge cases (empty strings,
single words, unicode, long texts)."""

import duckdb
import pytest

from no_ocr_spark.functions import textexpr as tx

CASES = [
    "",
    "a",
    "hello world",
    "the quick brown fox jumps over the lazy dog",
    "x " * 50,
    "unicode éü中文 mixed",
    "punct, punct. punct!",
]


@pytest.fixture(scope="module")
def duck():
    return duckdb.connect()


def _spark_eval(spark, expr: str, text: str):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(text,)], "text string")
    return df.select(F.expr(expr).alias("v")).collect()[0].v


def _duck_eval(duck, expr: str, text: str):
    return duck.execute(f"SELECT {expr} AS v FROM (SELECT ? AS text)",
                        [text]).fetchone()[0]


@pytest.mark.parametrize("text", CASES)
def test_poly_hash_parity(spark, duck, text):
    s = _spark_eval(spark, tx.poly_hash("spark", "text"), text)
    d = _duck_eval(duck, tx.poly_hash("duckdb", "text"), text)
    assert s == d


@pytest.mark.parametrize("text", CASES)
def test_token_count_parity(spark, duck, text):
    s = _spark_eval(spark, tx.token_count_regex("spark", "text"), text)
    d = _duck_eval(duck, tx.token_count_regex("duckdb", "text"), text)
    assert int(s) == int(d)


@pytest.mark.parametrize("text", CASES)
def test_simhash_parity(spark, duck, text):
    words_s = tx.words("spark", "text")
    words_d = tx.words("duckdb", "text")
    s = _spark_eval(spark, tx.simhash("spark", words_s), text)
    d = _duck_eval(duck, tx.simhash("duckdb", words_d), text)
    assert s == d


@pytest.mark.parametrize("text", CASES)
def test_minhash_parity(spark, duck, text):
    sh_s = f"array_distinct({tx.word_shingles('spark', tx.words('spark', 'text'), 2)})"
    sh_d = f"list_distinct({tx.word_shingles('duckdb', tx.words('duckdb', 'text'), 2)})"
    s = _spark_eval(spark, tx.minhash_signature("spark", sh_s), text)
    d = _duck_eval(duck, tx.minhash_signature("duckdb", sh_d), text)
    assert list(s) == list(d)


@pytest.mark.parametrize("text", CASES)
def test_count_substr_parity(spark, duck, text):
    s = _spark_eval(spark, tx.count_substr("spark", "text", "the"), text)
    d = _duck_eval(duck, tx.count_substr("duckdb", "text", "the"), text)
    assert float(s) == float(d)
