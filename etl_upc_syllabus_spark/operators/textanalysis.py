"""Text-analysis operators for LLM-data pipelines (SURVEY.md north star).

All column builders here are pure ``pyspark.sql.functions`` expression
trees -- JVM-side, whole-stage-codegen, no Python UDFs -- so they run
at full scan speed over 100 TB of documents. Every derived value is
integer/exact arithmetic or deterministic double math so the DuckDB
oracles in ``plans.text_queries`` hash-match.

The reference has no text analytics at all (it parses PDFs into
records, reference etl_infrastructure.py); this module is part of the
blueprint's added LLM-pipeline surface.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

# Constants shared with the DuckDB oracle SQL (plans/_fragments.py).
PUNCT_CLASS = "[.,;:!?]"
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "that", "it", "for")
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    # tiny deterministic marker lists; argmax with fixed tie-break order
    "en": ("the", "and", "of", "is"),
    "es": ("el", "la", "de", "que"),
    "de": ("der", "die", "und", "ist"),
    "fr": ("le", "les", "et", "une"),
    "zh": ("de_zh", "shi", "le_zh"),  # placeholder markers (ASCII corpus)
}
LANG_ORDER = ("en", "es", "de", "fr", "zh")  # tie-break priority


def let_bind(value: Column, body) -> Column:
    """Evaluate ``value`` once per row and pass the BOUND result to
    ``body`` (a Column -> Column callable).

    Catalyst's CollapseProject inlines projected expressions into every
    consumer reference, so an expression referenced N times inside a
    lambda or across a computed column is re-evaluated N times -- the
    trap that made the naive shingle build re-tokenize per element
    (operators/dedup.py shingle_sets). A higher-order function's ARRAY
    argument, by contrast, is evaluated exactly once and its lambda
    variable is a bound VALUE, so wrapping ``value`` in a 1-element
    array transform gives expression-level let-binding: references to
    the lambda variable inside ``body`` are free."""
    return F.element_at(F.transform(F.array(value), body), 1)


def norm_text(col: Column | str) -> Column:
    """Whitespace-collapsed, lowercased, trimmed text (dedup canonical form)."""
    col = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


#: Whitespace code points the three regex dialects in play DISAGREE on
#: (r10 unicode probe, tools/unicode_probe.py): Java ``\s`` is ASCII
#: incl. VT; RE2 ``\s`` is ASCII incl. FF but NOT VT; Python ``\s`` is
#: full-Unicode (NBSP, NEL, line/para separators, ...). Every char
#: here is unified to a plain space BEFORE the shared ``\s+`` collapse
#: so all three dialects see the same separators. Enumerated as
#: LITERAL characters (no ranges, no escapes) so the char class means
#: the same thing in Java regex, RE2, and Python.
UNICODE_SPACE_CHARS = (
    "\x0b\x0c\x1c\x1d\x1e\x1f\x85\xa0 "
    + "".join(chr(c) for c in range(0x2000, 0x200B))
    + "    　"
)

#: Zero-width / directional format characters that create invisible
#: token boundaries (ZWSP) or glue (ZWJ, word joiner) inside words,
#: plus BOM and soft hyphen. Stripped entirely. NOTE: stripping ZWJ
#: decomposes emoji families into their member emoji -- acceptable for
#: text analysis (they are not vocabulary either way), documented.
UNICODE_FORMAT_CHARS = "​‌‍‎‏⁠﻿­"

#: Greek small final sigma: Spark's lower() applies the CONTEXTUAL
#: case mapping (word-final capital sigma -> U+03C2), DuckDB's the
#: simple mapping (-> U+03C3) -- the one measured case-mapping
#: divergence (r10 probe; Turkish I-dot and German eszett agree).
#: Folded to the medial form after lowering.
FINAL_SIGMA, MEDIAL_SIGMA = "ς", "σ"


def unicode_clean(col: Column | str) -> Column:
    """Strip format characters and unify exotic whitespace to plain
    spaces -- the engine-neutral pre-pass for hostile-Unicode text.
    Identical effect in Java regex, RE2, and Python because the char
    classes are literal enumerations (see UNICODE_SPACE_CHARS)."""
    col = F.col(col) if isinstance(col, str) else col
    stripped = F.regexp_replace(col, "[" + UNICODE_FORMAT_CHARS + "]", "")
    return F.regexp_replace(stripped, "[" + UNICODE_SPACE_CHARS + "]", " ")


def norm_text_unicode(col: Column | str) -> Column:
    """Hostile-input variant of :func:`norm_text` (r10 unicode probe):
    unicode_clean -> norm_text -> final-sigma fold. The 22 measured
    cross-engine divergences on hostile text all root in (a) the
    ``\\s`` dialect split and (b) the final-sigma contextual lowercase
    -- both closed by this composition; NFD-vs-NFC forms and
    astral-plane code points are measured parity-safe as-is and left
    untouched (true NFC unification needs ICU, absent from both
    engines' expression surfaces here). Idempotent, and equal to
    norm_text on ASCII corpora -- so pre-normalizing a lake column
    with this op leaves contract-clean pipelines bit-identical.
    Mirrored by plans/_fragments.unicode_norm_sql; parity pinned in
    tests/test_unicode_text.py."""
    return F.regexp_replace(
        norm_text(unicode_clean(col)), FINAL_SIGMA, MEDIAL_SIGMA
    )


def _norm(col: Column | str, normalized: bool) -> Column:
    """:func:`norm_text`, or its hostile-Unicode variant when
    ``normalized`` -- the single dispatch point behind the
    ``normalized=`` knob every text entry point here (and the text
    side of operators/dedup.py) carries (VERDICT r10 item 4, the
    promotion ``running_user_totals(gated=)`` got in r10). Default
    False keeps every existing plan byte-identical; True is
    value-equal to hand-composing ``norm_text_unicode`` onto the
    column first (norm_text_unicode is idempotent and
    norm_text-stable; pinned in tests/test_unicode_text.py)."""
    return norm_text_unicode(col) if normalized else norm_text(col)


def tokens(col: Column | str, normalized: bool = False) -> Column:
    """Whitespace tokens of the normalized text (``normalized=True``:
    unicode-safe via :func:`norm_text_unicode`)."""
    return F.split(_norm(col, normalized), " ")


def token_count(col: Column | str, normalized: bool = False) -> Column:
    """Token count; 0 for empty/whitespace-only text."""
    n = _norm(col, normalized)
    return F.when(F.length(n) == 0, F.lit(0)).otherwise(F.size(F.split(n, " "))).cast("long")


# GPT-2-style pre-tokenization over normalized (lowercased) text:
# contraction suffixes, space-prefixed letter runs, digit runs, and
# punctuation runs. Counting these approximates BPE token counts far
# better than whitespace words (punctuation and numbers tokenize
# separately), and the regex dialect subset used here (alternation,
# classes, ?) behaves identically in Java and DuckDB's RE2.
BPE_PATTERN = r"'s|'t|'re|'ve|'m|'ll|'d| ?[a-z]+| ?[0-9]+| ?[^\sa-z0-9]+"


def bpe_token_count(col: Column | str, normalized: bool = False) -> Column:
    """BPE-ish pre-token count of the normalized text (0 when empty)."""
    return F.regexp_count(_norm(col, normalized), F.lit(BPE_PATTERN)).cast("long")


def _in_list(t: Column, words: tuple[str, ...]) -> Column:
    return t.isin(*words)


def marker_hits(
    col: Column | str, words: tuple[str, ...], normalized: bool = False
) -> Column:
    """How many tokens are in the given marker/stopword list."""
    return F.size(
        F.filter(tokens(col, normalized), lambda t: _in_list(t, words))
    ).cast("long")


def punct_count(col: Column | str, normalized: bool = False) -> Column:
    n = _norm(col, normalized)
    return (F.length(n) - F.length(F.regexp_replace(n, PUNCT_CLASS, ""))).cast("long")


def quality_metrics(
    col: Column | str, normalized: bool = False
) -> dict[str, Column]:
    """Quality-scoring feature set (length / punctuation / stopword ratios).

    The classic pre-training quality heuristics (Gopher/C4-style rules):
    all exact-integer counts divided as doubles, so cross-engine stable.
    """
    n = _norm(col, normalized)
    n_chars = F.length(n).cast("long")
    n_toks = token_count(col, normalized)
    # single-space-joined => total token chars = n_chars - (n_toks - 1)
    avg_token_len = (n_chars - (n_toks - 1)).cast("double") / n_toks
    punct_ratio = punct_count(col, normalized).cast("double") / n_chars
    stop_ratio = marker_hits(col, STOPWORDS, normalized).cast("double") / n_toks
    # no rounding: operands are identical doubles in every engine and the
    # expression is evaluated left-associatively in both, so the raw double
    # is bit-identical -- while round() would diverge on half-boundaries
    # (Spark HALF_UP vs DuckDB half-even).
    score = (
        0.4 * stop_ratio
        + 0.3 * F.least(avg_token_len / 8.0, F.lit(1.0))
        + 0.3 * (1.0 - punct_ratio)
    )
    return {
        "n_chars": n_chars,
        "n_tokens": n_toks,
        "avg_token_len": avg_token_len,
        "punct_ratio": punct_ratio,
        "stop_ratio": stop_ratio,
        "quality_score": score,
    }


def _lang_case(hits: dict[str, Column]) -> Column:
    """Argmax CASE chain over per-language hit columns with the
    LANG_ORDER tie-break -- shared by :func:`lang_id` (which computes
    hits from the raw column) and :func:`curation_metrics` (which
    computes them once from a let-bound token array)."""
    expr = F.lit(LANG_ORDER[-1])
    # build the CASE chain in reverse so earlier languages win ties
    for lang in reversed(LANG_ORDER[:-1]):
        later = LANG_ORDER[LANG_ORDER.index(lang) + 1 :]
        cond = None
        for other in later:
            c = hits[lang] >= hits[other]
            cond = c if cond is None else (cond & c)
        expr = F.when(cond, F.lit(lang)).otherwise(expr)
    return expr


def curation_metrics(col: Column | str, normalized: bool = False) -> Column:
    """The corpus-curation feature set (token/BPE counts, composite
    quality score, predicted language) as ONE struct with the
    normalized text and its token array LET-BOUND (see
    :func:`let_bind`).

    Why this exists next to :func:`quality_metrics` + :func:`lang_id`
    (r16 optimization round): composing those builders repeats the
    ``norm_text``/``split`` subtrees once per consumer reference after
    projection collapse. Spark's codegen subexpression elimination
    recovers most repeats in a flat projection -- measured NEUTRAL for
    quality_metrics alone -- but the lang_id CASE chain references each
    language's marker-hit subtree from several WHEN branches, where
    conditional evaluation blocks CSE; the fused form measured 1.17x on
    corpus_curation_pipeline (r16 probe, value-identical rows). Every
    leaf formula below is copied verbatim from the single-metric
    builders, so the struct fields are bit-identical to composing them.
    """
    def from_tokens(n: Column, tk: Column) -> Column:
        n_chars = F.length(n).cast("long")
        n_toks = (
            F.when(F.length(n) == 0, F.lit(0)).otherwise(F.size(tk)).cast("long")
        )
        n_punct = (
            F.length(n) - F.length(F.regexp_replace(n, PUNCT_CLASS, ""))
        ).cast("long")
        n_stop = F.size(F.filter(tk, lambda t: _in_list(t, STOPWORDS))).cast("long")
        avg_token_len = (n_chars - (n_toks - 1)).cast("double") / n_toks
        punct_ratio = n_punct.cast("double") / n_chars
        stop_ratio = n_stop.cast("double") / n_toks
        score = (
            0.4 * stop_ratio
            + 0.3 * F.least(avg_token_len / 8.0, F.lit(1.0))
            + 0.3 * (1.0 - punct_ratio)
        )
        hits = {
            lang: F.size(F.filter(tk, lambda t: _in_list(t, words))).cast("long")
            for lang, words in LANG_MARKERS.items()
        }
        return F.struct(
            n_toks.alias("n_tokens"),
            F.regexp_count(n, F.lit(BPE_PATTERN)).cast("long").alias("n_bpe"),
            score.alias("quality_score"),
            _lang_case(hits).alias("predicted_lang"),
        )

    return let_bind(
        _norm(col, normalized),
        lambda n: let_bind(F.split(n, " "), lambda tk: from_tokens(n, tk)),
    )


def lang_id(col: Column | str, normalized: bool = False) -> Column:
    """N-gram/stopword-heuristic language ID: argmax of marker hits with a
    deterministic tie-break (LANG_ORDER). Pure column expressions."""
    hits = {
        lang: marker_hits(col, words, normalized)
        for lang, words in LANG_MARKERS.items()
    }
    return _lang_case(hits)


def char_shingles(
    col: Column | str, k: int = 8, stride: int = 4, normalized: bool = False
) -> Column:
    """Character k-gram shingles at the given stride over normalized text.

    Semantics: one shingle per char position 1, 1+stride, ... while a
    full k-gram fits (positions i <= len-k+1); a doc shorter than k
    yields its whole text as the single shingle.

    Scale shape: the obvious formulation -- transform(sequence(...),
    i -> substr(s, i, k)) -- is QUADRATIC in document length: Spark's
    UTF8String indexes by codepoint, so substr at char position i scans
    the byte buffer from the start (O(i)); summed over the ~len/stride
    strided positions that is O(len^2/stride) per document (measured
    3.7x wall per doubling; a 1 MB page took minutes). Here the text is
    chunked ONCE into gcd(k, stride)-char blocks by a single linear
    regexp pass, and each shingle is the concat of k/g consecutive
    blocks -- O(1) array lookups per shingle, O(len) per document,
    byte-identical output (shingle starts land on chunk boundaries
    because g divides stride, and a full k-gram spans exactly k/g full
    chunks). (?s) keeps `.` matching the exotic line separators
    (U+2028 etc.) that survive norm_text's \\s collapse.

    Both the normalized text and the chunk array are LET-BOUND (see
    :func:`let_bind`) so each is evaluated once per row -- referencing
    the expressions directly inside the lambdas would re-run them per
    consumer reference after projection collapse (the shingle_sets
    trap; operators/dedup.py)."""
    g = math.gcd(k, stride)
    q = k // g  # chunks per shingle
    step = stride // g  # chunk-index step between shingle starts
    return let_bind(
        _norm(col, normalized),
        lambda s: F.when(F.length(s) < k, F.array(s)).otherwise(
            let_bind(
                F.regexp_extract_all(s, F.lit(f"(?s).{{{g}}}"), 0),
                lambda chunks: F.transform(
                    F.sequence(
                        F.lit(0), ((F.length(s) - k) / F.lit(stride)).cast("int")
                    ),
                    lambda m: F.concat_ws("", F.slice(chunks, m * step + 1, q)),
                ),
            )
        ),
    )


def fingerprint(
    col: Column | str, k: int = 8, stride: int = 4, normalized: bool = False
) -> Column:
    """Winnowing-style document fingerprint: min md5 over strided character
    k-gram shingles (rolling-hash family; deterministic, portable)."""
    shingles = char_shingles(col, k, stride, normalized)
    return F.array_min(F.transform(shingles, F.md5))


# Hashed linear classifier (fastText-style inference). The weight table
# is IMPLICIT: w(bucket) derives from the bucket id by exact integer
# arithmetic, so both engines reconstruct the identical model with no
# stored artifact. Production swaps in a broadcast map of trained
# weights; the plan shape (narrow HOF fold over the token array) is the
# same either way.
CLS_DIM = 1024  # hashing-trick bucket count
CLS_MOD = 2003  # prime; weight lattice size
_CLS_MIX = 2654435761  # Knuth multiplicative-hash constant


def hashed_linear_score(
    col: Column | str, dim: int = CLS_DIM, normalized: bool = False
) -> Column:
    """Mean implicit-weight activation of the token bag (pre-sigmoid).

    bucket(t) = hex8(md5(t)) % dim; w(b) = ((b*MIX) % MOD - 1001) / 1024.
    The numerator is exact integer arithmetic and the divisor is a
    power of two, so every weight -- and every PARTIAL SUM of weights
    (multiples of 2^-10 bounded far below 2^42) -- is exactly
    representable in a double. Summation order therefore cannot change
    the result: Spark's sequential HOF fold and any DuckDB list-sum
    strategy agree bit-for-bit, with no rounding fence needed before
    the sigmoid. Returns 0.0 for empty text (empty bag, no activation).
    """
    tk = tokens(col, normalized)
    ws = F.transform(
        tk,
        lambda t: (
            (F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long") % dim)
            * _CLS_MIX
            % CLS_MOD
            - (CLS_MOD - 1) // 2
        )
        / F.lit(1024.0),
    )
    n = token_count(col, normalized)
    return F.when(n == 0, F.lit(0.0)).otherwise(
        F.aggregate(ws, F.lit(0.0), lambda acc, w: acc + w) / n.cast("double")
    )


def fast_sigmoid(z: Column) -> Column:
    """z -> 0.5 * (1 + z / (1 + |z|)): a rational logistic surrogate.

    Chosen over 1/(1+exp(-z)) deliberately: exp() may differ in the
    last ulp between Java's Math.exp and DuckDB's libm, which would
    make oracle hashes flaky at rounding boundaries. Division and abs
    are IEEE-exact, so this is bit-identical across engines.
    """
    return 0.5 * (1.0 + z / (1.0 + F.abs(z)))
