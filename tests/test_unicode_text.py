"""Hostile-Unicode text posture (r10 probe, tools/unicode_probe.py).

The fixtures are ASCII, so the 53 document-reading oracle queries had
never been compared on text where the engines' string models diverge.
The probe measured 31/53 parity with 22 silent divergences, all
rooting in exactly two facts (pinned below so an engine upgrade that
changes either is caught):

1. ``\\s`` is three different character classes: Java regex (Spark
   JVM) = ASCII incl. VT; RE2 (DuckDB) = ASCII incl. FF but NOT VT;
   Python ``re`` (pandas seams) = full Unicode (NBSP, NEL, line/para
   separators). One vertical tab in a document changes its token
   count per engine.
2. Spark's ``lower()`` applies the CONTEXTUAL Unicode case mapping
   (word-final capital sigma -> U+03C2), DuckDB's the simple mapping
   (-> U+03C3). Turkish I-dot and German eszett agree; final sigma
   does not -- and every downstream md5 (dedup, minhash bands,
   simhash, fingerprints) diverges with it.

NFD combining forms, astral-plane code points, emoji/ZWJ clusters,
and RTL marks are measured parity-safe (code-point-identical
processing on both sides).

The consequence operator is textanalysis.norm_text_unicode
(unicode_clean -> norm_text -> final-sigma fold; literal-enumerated
char classes shared with the oracle fragment
plans/_fragments.unicode_norm_sql so all regex dialects agree):
``unicode_probe --normalize`` reads 53/53.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest
from pyspark.sql import functions as F

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)

from unicode_probe import (  # noqa: E402
    UNICODE_MUTATIONS,
    build_unicode_fixture,
    normalize_fixture_text,
)

from etl_upc_syllabus_spark.operators.textanalysis import (
    norm_text,
    norm_text_unicode,
)
from etl_upc_syllabus_spark.plans import all_specs
from etl_upc_syllabus_spark.plans._fragments import unicode_norm_sql

from .oracle_harness import compare, duckdb_run


def test_whitespace_dialect_split_is_real(spark):
    """Root fact 1: one VERTICAL TAB tokenizes differently per engine.
    If this pin starts failing, the engines changed semantics and the
    normalizer's char class should be re-derived."""
    sp = spark.sql(
        "SELECT size(split(trim(regexp_replace(lower('a\x0bb'), '\\\\s+', ' ')), ' ')) AS n"
    ).collect()[0]["n"]
    du = duckdb.sql(
        "SELECT len(string_split(trim(regexp_replace(lower('a' || chr(11) || 'b'), '\\s+', ' ', 'g')), ' '))"
    ).fetchone()[0]
    assert sp == 2, "Java \\s must treat VT as whitespace"
    assert du == 1, "RE2 \\s must NOT treat VT as whitespace"


def test_final_sigma_case_mapping_split_is_real(spark):
    """Root fact 2: Spark lowercases word-final capital sigma to the
    FINAL form (U+03C2), DuckDB to the medial form (U+03C3)."""
    sp = spark.sql("SELECT lower('ΣΙΣΥΦΟΣ') AS t").collect()[0]["t"]
    du = duckdb.sql("SELECT lower('ΣΙΣΥΦΟΣ')").fetchone()[0]
    assert sp.endswith("ς") and du.endswith("σ") and sp[:-1] == du[:-1]


def test_norm_text_unicode_matches_oracle_fragment(spark):
    """The normalizer and its SQL mirror produce IDENTICAL strings on
    every hostile mutant -- so tokens, counts, and every downstream
    md5 agree by construction."""
    rows = [(i, t) for i, (_label, t) in sorted(UNICODE_MUTATIONS.items())]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {
        r["id"]: r["t"]
        for r in df.select("id", norm_text_unicode("text").alias("t")).collect()
    }
    con = duckdb.connect()
    for i, t in rows:
        want = con.execute(
            f"SELECT {unicode_norm_sql('?')}", [t]
        ).fetchone()[0]
        assert got[i] == want, f"mutant {i}: {got[i]!r} != {want!r}"


def test_norm_text_unicode_is_noop_on_ascii_and_idempotent(spark):
    """Equal to norm_text on the (ASCII) fixture corpus -- so
    pre-normalizing a lake column leaves contract-clean pipelines
    bit-identical -- and idempotent on its own output."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    diff = docs.select(
        (norm_text("text") != norm_text_unicode("text")).alias("d")
    ).filter("d").count()
    assert diff == 0
    twice = docs.select(
        (
            norm_text_unicode("text")
            != norm_text_unicode(norm_text_unicode("text"))
        ).alias("d")
    ).filter("d").count()
    assert twice == 0


RESTORED_SUBSET = [
    # one per measured divergence class: byte hashes, JVM tokenizer,
    # Python-seam tokenizer, corpus-level stats, quality metrics
    "dedup_exact",
    "text_token_count",
    "pandas_udf_scalar",
    "text_fingerprint",
    "text_quality_score",
]


@pytest.fixture(scope="module")
def normalized_unicode_fixture(spark, tmp_path_factory):
    dest = str(tmp_path_factory.mktemp("unifix"))
    build_unicode_fixture("/root/testdata/sf0.001", dest)
    normalize_fixture_text(spark, dest)
    return dest


@pytest.mark.parametrize("name", RESTORED_SUBSET)
def test_normalized_hostile_text_keeps_oracle_parity(
    spark, normalized_unicode_fixture, name
):
    """The gate composition closes the measured UB: every formerly
    diverging class matches its oracle once documents.text has passed
    norm_text_unicode at ingestion. Full family evidence:
    unicode_probe --normalize, 53/53 (raw probe: 31/53)."""
    spec = all_specs()[name]
    sdf = spec.fn(spark, normalized_unicode_fixture)
    odf = duckdb_run(spec.oracle, normalized_unicode_fixture)
    compare(sdf, odf, f"{name}@unicode-normalized")


def test_normalized_knob_equals_explicit_composition(spark):
    """The ``normalized=`` knob (VERDICT r10 item 4, mirroring r10's
    ``gated=``): every text/dedup entry point run with
    ``normalized=True`` equals the hand-composition of
    norm_text_unicode onto the column first, value-for-value on the
    full hostile mutant set; and with the knob OFF (the default) the
    expression tree carries none of the normalizer's machinery, so
    every frozen registry plan is untouched by the knob's existence."""
    from etl_upc_syllabus_spark.operators import dedup as dd
    from etl_upc_syllabus_spark.operators import textanalysis as ta

    rows = [(i, t) for i, (_label, t) in sorted(UNICODE_MUTATIONS.items())]
    raw = spark.createDataFrame(rows, "id long, text string")
    pre = raw.withColumn("text", norm_text_unicode("text"))

    col_fns = [
        ("tokens", lambda c, **kw: ta.tokens(c, **kw)),
        ("token_count", lambda c, **kw: ta.token_count(c, **kw)),
        ("bpe_token_count", lambda c, **kw: ta.bpe_token_count(c, **kw)),
        ("lang_id", lambda c, **kw: ta.lang_id(c, **kw)),
        ("fingerprint", lambda c, **kw: ta.fingerprint(c, **kw)),
        ("hashed_linear_score", lambda c, **kw: ta.hashed_linear_score(c, **kw)),
        ("quality_score",
         lambda c, **kw: ta.quality_metrics(c, **kw)["quality_score"]),
    ]
    for name, fn in col_fns:
        knob = raw.select("id", fn("text", normalized=True).alias("v")).collect()
        comp = pre.select("id", fn("text").alias("v")).collect()
        got = {r["id"]: r["v"] for r in knob}
        want = {r["id"]: r["v"] for r in comp}
        assert got == want, f"{name}: knob != explicit composition"

    df_fns = [
        ("exact_dedup", lambda df, **kw: dd.exact_dedup(df, "id", "text", **kw)),
        ("shingle_sets", lambda df, **kw: dd.shingle_sets(df, "id", "text", k=2, **kw)),
        ("simhash_signatures",
         lambda df, **kw: dd.simhash_signatures(df, "id", "text", **kw)),
    ]
    for name, fn in df_fns:
        knob = sorted(map(str, fn(raw, normalized=True).collect()))
        comp = sorted(map(str, fn(pre).collect()))
        assert knob == comp, f"{name}: knob != explicit composition"

    # knob OFF: no normalizer machinery in the plan (freeze safety) --
    # the sigma fold and format-char strip appear only under the knob
    plain = raw.select(ta.tokens("text"))
    knobbed = raw.select(ta.tokens("text", normalized=True))
    plain_plan = plain._jdf.queryExecution().analyzed().toString()
    knob_plan = knobbed._jdf.queryExecution().analyzed().toString()
    assert "ς" not in plain_plan
    assert "ς" in knob_plan
