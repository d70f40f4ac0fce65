"""Column-form F1 parity with the Python kernel (VERDICT r2 item 3).

Both implementations must agree on all three delimiters the reference
handles: ASCII bullet, U+F0B7 private-use bullet (Symbol-font bullets in
PDF-extracted text), and the comma (comma variant only). Reference:
etl_pipeline.py:311-314, etl_infrastructure.py:146.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_upc_syllabus_spark.functions import text as T
from etl_upc_syllabus_spark.pipeline import parse as P

CASES = [
    "a, b •c  d",
    "onlypuabullets",
    "no delimiters at all",
    "trailing comma, ",
    "•,•",  # delimiters only -> empty list
]


@pytest.mark.parametrize("include_comma", [True, False])
def test_column_form_matches_python_kernel(spark, include_comma):
    df = spark.createDataFrame([(s,) for s in CASES], "s string")
    got = [
        r.parts
        for r in df.select(
            T.bullet_split("s", include_comma=include_comma).alias("parts")
        ).collect()
    ]
    want = [P.split_bullets(s, include_comma=include_comma) for s in CASES]
    assert got == want


# ---- hashed linear classifier ------------------------------------------


def _py_weight(token: str) -> float:
    """Independent Python replica of the implicit weight function."""
    import hashlib

    from etl_upc_syllabus_spark.operators.textanalysis import (
        CLS_DIM,
        CLS_MOD,
        _CLS_MIX,
    )

    b = int(hashlib.md5(token.encode()).hexdigest()[:8], 16) % CLS_DIM
    return (b * _CLS_MIX % CLS_MOD - (CLS_MOD - 1) // 2) / 1024.0


def test_hashed_linear_score_matches_python(spark):
    from etl_upc_syllabus_spark.operators.textanalysis import hashed_linear_score

    texts = ["spark catalyst optimizer", "the quick brown fox", "x"]
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    got = [r.z for r in df.select(hashed_linear_score("t").alias("z")).collect()]
    for text, z in zip(texts, got):
        toks = text.split(" ")
        want = sum(_py_weight(t) for t in toks) / len(toks)
        assert z == want  # exact-dyadic weights: bit-for-bit, not approx


def test_hashed_linear_score_empty_text_is_zero(spark):
    from etl_upc_syllabus_spark.operators.textanalysis import (
        fast_sigmoid,
        hashed_linear_score,
    )

    df = spark.createDataFrame([("",), ("   ",)], "t string")
    rows = df.select(
        hashed_linear_score("t").alias("z"),
        fast_sigmoid(hashed_linear_score("t")).alias("s"),
    ).collect()
    assert all(r.z == 0.0 and r.s == 0.5 for r in rows)


def test_fast_sigmoid_shape(spark):
    from pyspark.sql import functions as F

    from etl_upc_syllabus_spark.operators.textanalysis import fast_sigmoid

    df = spark.createDataFrame([(-100.0,), (-1.0,), (0.0,), (1.0,), (100.0,)], "z double")
    got = [r.s for r in df.select(fast_sigmoid(F.col("z")).alias("s")).collect()]
    assert got[2] == 0.5
    assert got == sorted(got)  # monotone
    assert 0.0 < got[0] < 0.01 and 0.99 < got[4] < 1.0  # saturating
    assert abs(got[1] - 0.25) < 1e-12 and abs(got[3] - 0.75) < 1e-12


def test_let_bind_is_semantically_transparent(spark):
    """let_bind(value, body) must equal body(value) for every row --
    it changes evaluation COUNT, never the value. Checked over the
    operators that adopted it (bigrams, n-grams, char shingles) on
    edge-shaped inputs: empty text, whitespace-only, single token,
    exactly-k tokens, long text, punctuation-heavy."""
    from etl_upc_syllabus_spark.operators import curation as cu
    from etl_upc_syllabus_spark.operators import textanalysis as ta
    from pyspark.sql import functions as F

    rows = [
        (0, ""),
        (1, "   "),
        (2, "one"),
        (3, "two tokens"),
        (4, "exactly three tokens"),
        (5, "a b c d e f g h i j k l m n o p q r s t u v w x y z"),
        (6, "punct, heavy!! text;; with: lots? of. marks,,"),
        (7, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    # direct (unbound) reimplementations of each adopted expression
    tk = ta.tokens("text")
    m = F.greatest(F.size(tk) - 1, F.lit(0))
    direct_bigrams = F.when(F.size(tk) < 2, F.array().cast("array<string>")).otherwise(
        F.zip_with(F.slice(tk, 1, m), F.slice(tk, 2, m),
                   lambda a, b: F.concat(a, F.lit(" "), b))
    )
    n = ta.norm_text("text")
    direct_shingles = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(n) - 7, F.lit(1)), F.lit(4)),
        lambda i: F.substr(n, i, F.lit(8)),
    )

    got = df.select(
        "doc_id",
        "text",
        cu.word_bigrams("text").alias("bi"),
        direct_bigrams.alias("bi_direct"),
        cu.word_ngrams("text", 3).alias("tri"),
        ta.char_shingles("text").alias("cs"),
        direct_shingles.alias("cs_direct"),
    ).collect()
    for r in got:
        assert r["bi"] == r["bi_direct"], r
        if r["text"] is None:
            # the chunked shingle rewrite maps NULL text to NULL (the
            # old substr form accidentally yielded [NULL] because
            # greatest() skips NULL args); the sole consumer
            # (fingerprint = array_min(transform(md5))) is NULL under
            # both, which test_fingerprint_null_text pins
            assert r["cs"] is None, r
        else:
            assert r["cs"] == r["cs_direct"], r
        if r["bi"] is not None and len(r["bi"]) >= 2:
            # n-gram arrays are consistent with the bigram count
            assert len(r["tri"]) == max(len(r["bi"]) - 1, 0), r
