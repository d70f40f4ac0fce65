"""Adversarial-unicode coverage for the text/dedup operator family.

A real training corpus is not ASCII: emoji ZWJ sequences, combining
accents, RTL marks, CJK without whitespace, zero-width characters,
locale-sensitive case pairs, kilobyte-long tokens, control characters.
The oracle fixtures are mostly Latin text, so nothing else pinned how
the JVM-side expressions behave on these -- this module drives one
curated adversarial corpus through the operators in a single pass and
asserts ENGINE-INTERNAL invariants (counts consistent with lengths,
outputs well-formed). Deliberately no Python-reference string
comparison: Java and Python disagree on locale case-folding (İ, ß)
and that divergence is not a defect of either engine.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from etl_upc_syllabus_spark.operators import dedup as dd
from etl_upc_syllabus_spark.operators import textanalysis as ta
from etl_upc_syllabus_spark.operators.textanalysis import LANG_ORDER

ADVERSARIAL = [
    "\U0001f468‍\U0001f469‍\U0001f467‍\U0001f466 family \U0001f3f3️‍\U0001f308 flag",
    "café vs café naïve résumé",  # NFD vs NFC
    "مرحبا بالعالم ‏shalom עולם",  # RTL + mark
    "自然言語処理は楽しい機械学習",  # CJK, no spaces
    "zero​width‌non‍joiner test",
    "İstanbul ISPARTA straße GROSSE",  # Turkish I, sharp s
    "Ψυχή 123 — “quotes” …ellipsis¿",
    "x" * 5000,  # kilobyte-scale single token
    "a\t\nb c d",  # tab/newline/nbsp/line-separator
    "bell\x07 and backspace\x08 controls",
    "",  # empty
    "q",  # single char
    "∑∫≠≤ ©® µ²³",
]

K, STRIDE = 8, 4  # char_shingles defaults


@pytest.fixture(scope="module")
def adv(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(ADVERSARIAL)], "doc_id long, text string"
    ).coalesce(1)
    return df


def test_scalar_text_operators_well_formed(adv):
    """token/BPE counts, lang id, shingles, fingerprint: consistent
    with the normalized length for every adversarial row, in-engine."""
    L = F.length(ta.norm_text("text"))
    g = F.greatest(L - (K - 1), F.lit(1))  # sequence upper bound
    rows = adv.select(
        "doc_id",
        L.alias("L"),
        ta.token_count("text").alias("tc"),
        ta.bpe_token_count("text").alias("bpe"),
        ta.lang_id("text").alias("lang"),
        F.size(ta.char_shingles("text")).alias("n_sh"),
        (F.floor((g - 1) / STRIDE) + 1).alias("want_sh"),
        F.array_max(F.transform(ta.char_shingles("text"), F.length)).alias("max_sh_len"),
        ta.fingerprint("text").alias("fp"),
        ta.fast_sigmoid(ta.hashed_linear_score("text")).alias("score"),
    ).collect()
    assert len(rows) == len(ADVERSARIAL)
    for r in rows:
        d = dict(r.asDict())
        assert r["tc"] >= 0 and (r["tc"] == 0) == (r["L"] == 0), d
        assert r["bpe"] >= (1 if r["L"] > 0 else 0), d
        assert r["lang"] in LANG_ORDER, d
        # shingle count follows the sequence arithmetic exactly
        assert r["n_sh"] == r["want_sh"] >= 1, d
        assert r["max_sh_len"] <= K, d
        # winnowing fingerprint is a well-formed md5 for ANY input
        assert r["fp"] is not None and len(r["fp"]) == 32, d
        assert int(r["fp"], 16) >= 0, d
        assert 0.0 < r["score"] < 1.0, d


def test_dedup_pipeline_well_formed(adv):
    """shingle_sets -> minhash_signatures stays structurally sound on
    adversarial text: every doc with >= k tokens gets exactly
    num_hashes/band_size banded signatures, each a full md5."""
    sets = dd.shingle_sets(adv, "doc_id", "text", k=3)
    sigs = dd.minhash_signatures(sets, num_hashes=16, band_size=4)
    per_doc = (
        sigs.groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_bands"),
            F.min(F.length("band_hash")).alias("min_len"),
            F.count(F.when(F.col("band_hash").isNull(), 1)).alias("n_null"),
        )
        .collect()
    )
    n_eligible = sets.count()
    assert len(per_doc) == n_eligible > 0
    for r in per_doc:
        assert r["n_bands"] == 4 and r["min_len"] == 32 and r["n_null"] == 0, r
    # exact dedup never crashes and keeps at most one row per text
    kept = dd.exact_dedup(adv, "doc_id", "text")
    assert kept.count() <= len(ADVERSARIAL)


def test_unicode_casefold_stability(adv, spark):
    """norm_text is idempotent (normalizing twice changes nothing) --
    the property dedup keys rely on, whatever the script."""
    once = ta.norm_text("text")
    twice = ta.norm_text(once)
    n_diff = adv.filter(~(once.eqNullSafe(twice))).count()
    assert n_diff == 0
