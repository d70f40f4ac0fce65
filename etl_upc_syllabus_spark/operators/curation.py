"""Corpus-curation operators a training-data pipeline needs beyond
dedup/quality: PII scrubbing, per-domain caps, repetition (Gopher)
rules, and benchmark decontamination.

No reference analog (the reference is a PDF ETL, etl_pipeline.py); these
extend the LLM-pipeline surface the same way operators.textanalysis
does. Everything is codegen'd column expressions or one join + one
aggregation -- no Python in the hot path, so each op runs at scan/
shuffle speed at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textanalysis import let_bind, norm_text, tokens

# Redaction patterns, identical semantics in Java regex (Spark) and RE2
# (DuckDB oracle): character classes, bounded repeats, \b and \d only.
EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"
IP_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

#: (pattern, replacement) in application order. Order is part of the
#: contract: the oracle applies the same replacements in the same order.
REDACTIONS = (
    (EMAIL_RE, "<EMAIL>"),
    (PHONE_RE, "<PHONE>"),
    (IP_RE, "<IP>"),
)


def inject_synthetic_pii(text: Column | str, doc_id: Column | str) -> Column:
    """Append deterministic synthetic PII (email, phone, IPv4) derived
    from doc_id. The fixture corpus carries no natural PII, so the
    scrubber demo plants its own -- per doc, reproducibly, with no
    randomness (the same string both engines can build)."""
    t, d = F.col(text) if isinstance(text, str) else text, F.col(doc_id)
    s = lambda c: c.cast("string")  # noqa: E731
    return F.concat(
        t,
        F.lit(" contact user"), s(d), F.lit("@mail.example.com tel 555-"),
        F.lpad(s(d % 1000), 3, "0"), F.lit("-"), F.lpad(s(d % 10000), 4, "0"),
        F.lit(" ip 10."), s(d % 256), F.lit("."), s(d % 251), F.lit("."),
        s(d % 254 + 1),
    )


def pii_counts(text: Column | str) -> dict[str, Column]:
    """Per-category match counts (taken BEFORE scrubbing)."""
    t = F.col(text) if isinstance(text, str) else text
    return {
        "n_emails": F.regexp_count(t, F.lit(EMAIL_RE)).cast("long"),
        "n_phones": F.regexp_count(t, F.lit(PHONE_RE)).cast("long"),
        "n_ips": F.regexp_count(t, F.lit(IP_RE)).cast("long"),
    }


def pii_scrub(text: Column | str) -> Column:
    """Redact emails, phones, then IPs (order matters and is fixed)."""
    t = F.col(text) if isinstance(text, str) else text
    for pattern, token in REDACTIONS:
        t = F.regexp_replace(t, pattern, token)
    return t


def domain_cap(df: DataFrame, key: str, order: str, k: int) -> DataFrame:
    """Keep at most `k` rows per `key`, deterministically (first `k` by
    `order`) -- the C4/RefinedWeb per-domain cap that stops any single
    domain from dominating the corpus.

    Scale: one row_number window shuffle on `key`. A pathologically hot
    domain concentrates on one reducer, but only rank <= k survives the
    window's sort buffer spill -- and with AQE skew handling the sort
    itself splits. (A cheaper approximate variant samples per key before
    ranking; exactness is the point here.)
    """
    from pyspark.sql import Window

    w = Window.partitionBy(key).orderBy(order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def word_bigrams(text: Column | str) -> Column:
    """Adjacent token pairs of the normalized text (empty for < 2 tokens).

    The token array is LET-BOUND (textanalysis.let_bind) and the pairs
    come from zipping it with its own shifted slice -- ONE tokenizer
    run per row. The naive element_at(ws, i+1)/element_at(ws, i+2)
    transform re-evaluates the tokenizer per bigram element after
    Catalyst collapses projections (the shingle_sets trap; see
    operators/dedup.py)."""
    return let_bind(
        tokens(text),
        lambda ws: F.when(
            F.size(ws) < 2, F.array().cast("array<string>")
        ).otherwise(
            F.zip_with(
                F.slice(ws, 1, F.greatest(F.size(ws) - 1, F.lit(0))),
                F.slice(ws, 2, F.greatest(F.size(ws) - 1, F.lit(0))),
                lambda a, b: F.concat(a, F.lit(" "), b),
            )
        ),
    )


def repetition_struct(text: Column | str) -> Column:
    """Gopher repetition metrics as ONE struct column computed in a
    single pass: (n_bigrams, n_distinct_bigrams, dup_frac).

    The bigram array and its distinct size are let-bound, so one
    evaluation of this expression tokenizes once and distincts once.
    Consumers that need all fields should materialize the struct
    through a Generate barrier (explode of a 1-element array) so the
    fields are ATTRIBUTE references -- selecting the fields of this
    expression directly re-inlines (and re-evaluates) it per field."""
    return let_bind(
        word_bigrams(text),
        lambda b: let_bind(
            F.size(F.array_distinct(b)).cast("long"),
            lambda nd: F.struct(
                F.size(b).cast("long").alias("n_bigrams"),
                nd.alias("n_distinct_bigrams"),
                F.when(F.size(b) == 0, F.lit(0.0))
                .otherwise((F.size(b).cast("long") - nd).cast("double") / F.size(b))
                .alias("dup_frac"),
            ),
        ),
    )


def repetition_metrics(text: Column | str) -> dict[str, Column]:
    """Gopher-style repetition signal: fraction of duplicate word
    bigrams. High dup_frac marks boilerplate/generated text.

    Dict view over :func:`repetition_struct`; each entry re-evaluates
    the (single-pass) struct, so multi-field consumers should prefer
    the struct + Generate-barrier shape."""
    s = repetition_struct(text)
    return {
        "n_bigrams": s["n_bigrams"],
        "n_distinct_bigrams": s["n_distinct_bigrams"],
        "dup_frac": s["dup_frac"],
    }


def word_ngrams(text: Column | str, n: int) -> Column:
    """Sliding token n-grams of normalized text (empty for < n tokens).

    Token array let-bound: the per-element slice+concat references the
    bound variable, so the tokenizer runs once per row instead of once
    per n-gram element (the shingle_sets trap)."""
    return let_bind(
        tokens(text),
        lambda ws: F.when(F.size(ws) < n, F.array().cast("array<string>")).otherwise(
            F.transform(
                F.sequence(F.lit(0), F.size(ws) - n),
                lambda i: F.concat_ws(" ", F.slice(ws, i + 1, n)),
            )
        ),
    )


def decontaminate(
    docs: DataFrame, is_benchmark: Column, n: int = 3, text: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Benchmark decontamination: training docs sharing any token
    n-gram with a benchmark doc, with the count of distinct shared
    grams. The eval-leakage sweep every training corpus needs.

    Scale: the benchmark side is tiny relative to the corpus, so its
    distinct-gram set broadcasts; the corpus side is one explode +
    broadcast hash join + one aggregation -- the corpus is never
    shuffled by gram. (n=3 suits the small-vocab fixture; real
    pipelines run 8-13 gram windows via the same plan.)
    """
    with_grams = docs.withColumn("_gram", F.explode(word_ngrams(text, n)))
    bench = (
        with_grams.filter(is_benchmark).select(F.col("_gram").alias("gram")).distinct()
    )
    train = with_grams.filter(~is_benchmark).select(id_col, F.col("_gram").alias("gram"))
    return (
        train.join(F.broadcast(bench), "gram")
        .groupBy(id_col)
        .agg(F.count_distinct("gram").cast("long").alias("n_shared_grams"))
    )


def fuzzy_match_pairs(
    df: DataFrame,
    name_col: str,
    block_col: Column,
    max_dist: int = 4,
) -> DataFrame:
    """Blocked fuzzy entity matching: (name_a, name_b, lev) pairs.

    Classic entity-resolution shape: candidate pairs come ONLY from a
    blocking-key equi-self-join (never a cross join -- at 100 TB the
    block key is what bounds the pair explosion; multi-pass pipelines
    union several blocking strategies), then each candidate is verified
    with exact Levenshtein distance (integer, engine-portable). Names
    are deduplicated before pairing, so the pair space is over distinct
    entities, and name_a < name_b keeps each pair once.

    ``block_col`` is evaluated against the deduplicated name column,
    which is exposed as ``name`` -- e.g.
    ``F.element_at(F.split(F.col("name"), " "), -1)`` blocks on the
    last word.
    """
    names = (
        df.select(F.col(name_col).alias("name")).distinct().withColumn("blk", block_col)
    )
    a = names.select(F.col("name").alias("name_a"), "blk")
    b = names.select(F.col("name").alias("name_b"), "blk")
    return (
        a.join(b, "blk")
        .filter(F.col("name_a") < F.col("name_b"))
        .select(
            "name_a",
            "name_b",
            F.levenshtein("name_a", "name_b").cast("long").alias("lev"),
        )
        .filter(F.col("lev") <= max_dist)
    )


def quarantine_nonfinite(
    df: DataFrame, cols: list[str] | None = None
) -> tuple[DataFrame, DataFrame]:
    """Split rows whose float columns carry NaN / +-Infinity from the
    clean stream -> (clean, quarantined-with-reason).

    The r9 non-finite probe (tools/nan_probe.py --mode events) measured
    what poisoned scalars do downstream: DuckDB refuses NaN->DECIMAL /
    NaN->BIGINT casts loudly, Spark's non-ANSI cast silently NULLs the
    same value inside aggregate sums, a stateful stream dies mid-batch
    on the ANSI path, and pandas-seam ranks diverge silently -- so the
    only sane contract is the one every other quarantine in this repo
    enforces: split at INGESTION, publish what was split, keep the hot
    path finite (same posture as the malformed-CSV quarantine and
    try_cast gates; reference etl_pipeline.py:231-239 quarantines
    unparseable rows the same way).

    Default ``cols``: every top-level float/double column. The filter
    is a codegen'd boolean per column (isnan + +-Infinity literal
    compare -- NULL stays CLEAN: absent is a legal value, poisoned is
    not), so the split runs at scan speed with no shuffle; at 100 TB
    the quarantined side is written next to the output as the skip
    report, exactly like scan_corrupt_files' audit.
    """
    if cols is None:
        cols = _float_cols(df)
    if not cols:
        # filter(False), not limit(0): the operator is stream-facing
        # (the stateful-stream gate composition) and Limit is not
        # supported on streaming Datasets -- an empty-split no-op must
        # stay startable as a stream on both sides. The reason value
        # keeps the populated branch's 'nonfinite:<cols>' format (with
        # an empty culprit list) so a consumer parsing the prefix sees
        # one uniform schema value across branches (ADVICE r9) -- the
        # branch emits zero rows either way.
        return df, df.filter(F.lit(False)).withColumn(
            "quarantine_reason", F.lit("nonfinite:")
        )
    any_bad, reason = _nonfinite_flags(cols)
    clean = df.filter(~any_bad)
    quarantined = df.filter(any_bad).withColumn("quarantine_reason", reason)
    return clean, quarantined


def _float_cols(df: DataFrame) -> list[str]:
    """The non-finite axis's default column set: every top-level
    float/double column. One definition shared by quarantine_nonfinite
    and quarantine_hostile so the fused and single gates cannot
    diverge on which columns they quarantine (review r11)."""
    from pyspark.sql import types as T

    return [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (T.DoubleType, T.FloatType))
    ]


def _nonfinite_flags(cols: list[str]) -> tuple[Column, Column]:
    """(any_bad, reason) column pair for the non-finite axis -- the
    single source of the gate's expressions, shared by
    quarantine_nonfinite and quarantine_hostile. ``cols`` must be
    non-empty (the callers own the empty-axis no-op branch)."""
    inf = float("inf")

    def bad(c: str) -> Column:
        x = F.col(c)
        return x.isNotNull() & (F.isnan(x) | (x == inf) | (x == -inf))

    any_bad = None
    for c in cols:
        b = bad(c)
        any_bad = b if any_bad is None else (any_bad | b)
    # per-column culprit names, nulls compacted away (array_compact) --
    # a plain F.array() literal would be VOID-typed (the r8 gotcha)
    culprits = F.array_compact(F.array(*[F.when(bad(c), F.lit(c)) for c in cols]))
    reason = F.concat(F.lit("nonfinite:"), F.array_join(culprits, ","))
    return any_bad, reason


def _modal_width(df: DataFrame, vec_col: str) -> int | None:
    """The corpus's MODAL vector width (one narrow (width, count)
    aggregate; ties break to the LARGER width -- truncation is the
    common corruption, so the longer side is the likelier contract),
    or None when no non-NULL vector exists at all (the caller's no-op
    split). The mode is derived over POSITIVE widths only: the empty
    vector is itself a corruption shape (the ragged probe plants one),
    and a majority-empty corpus must not elect dim=0 and quarantine
    every healthy vector (review r10 finding #2); an all-empty corpus
    raises instead. Streaming inputs raise -- a mode cannot be counted
    on an unbounded stream; callers there pass dim= explicitly.
    Shared by quarantine_vector_width and quarantine_hostile so the
    fused gate derives the identical contract."""
    if df.isStreaming:
        # message names both callers: the helper serves the single
        # gate AND quarantine_hostile (review r11)
        raise ValueError(
            "the vector-width gate (quarantine_vector_width / "
            "quarantine_hostile) on a streaming input needs an "
            "explicit dim= (the modal width cannot be counted on an "
            "unbounded stream)"
        )
    w = F.size(F.col(vec_col))
    widths = (
        df.filter(F.col(vec_col).isNotNull() & (w > 0))
        .groupBy(w.alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    if not widths:
        if df.filter(F.col(vec_col).isNotNull()).isEmpty():
            return None
        raise ValueError(
            "the vector-width gate (quarantine_vector_width / "
            "quarantine_hostile): every non-NULL vector is empty; "
            "no width contract is derivable -- pass dim= explicitly"
        )
    return max(widths, key=lambda r: (r["n"], r["w"]))["w"]


def quarantine_vector_width(
    df: DataFrame, vec_col: str = "embedding", dim: int | None = None
) -> tuple[DataFrame, DataFrame]:
    """Split rows whose vector width differs from the corpus contract
    -> (clean, quarantined-with-reason).

    The r10 ragged-width probe (tools/nan_probe.py --mode ragged)
    measured what non-uniform vector lengths -- legal in a parquet list
    column, produced by writer bugs and schema drift -- do to the ANN
    family: Spark's zip_with NULL-pads the shorter side and
    null-propagates the dot product (re-entering, through a different
    door, the silent-divergence class the element-NULL contract
    closed), the SQL side silently computes PARTIAL dot products over
    shared indices, and the PQ family's driver-side LUT build dies with
    a bare IndexError on a truncated codebook seed: 1/11 parity, 6
    silent, 4 loud. The contract is therefore the same as every other
    ingestion gate here: split at the scan, publish what was split,
    keep the hot path uniform-width.

    ``dim``: the contracted width. Default None derives the MODAL
    width with one narrow aggregate over (width, count) -- distinct
    widths are few by construction, so the aggregate output is bounded
    and the argmax is a driver-side pick (ties break to the larger
    width: truncation is the common corruption, so the longer side is
    the likelier contract). NULL vectors stay CLEAN -- absent is a
    legal value, mis-shaped is not (the quarantine_nonfinite
    convention); element-NULLs are quarantine_nonfinite /
    similarity.indexable's axis, not this gate's.

    Scale posture: the split itself is a codegen'd ``size() != dim``
    per row at scan speed, no shuffle; the modal derivation adds one
    narrow (width, count) aggregate -- pass ``dim`` explicitly to skip
    it (a production corpus KNOWS its width). Streaming inputs must
    pass ``dim`` (deriving a mode needs a count): raises otherwise.
    """
    if dim is None:
        dim = _modal_width(df, vec_col)
        if dim is None:
            # no vectors at all: nothing to derive, nothing to
            # quarantine -- schema-stable no-op split
            return df, df.filter(F.lit(False)).withColumn(
                "quarantine_reason", F.lit("width:")
            )
    bad, reason = _width_flags(vec_col, dim)
    clean = df.filter(~bad)
    quarantined = df.filter(bad).withColumn("quarantine_reason", reason)
    return clean, quarantined


def _width_flags(vec_col: str, dim: int) -> tuple[Column, Column]:
    """(bad, reason) column pair for the vector-width axis (shared by
    quarantine_vector_width and quarantine_hostile)."""
    w = F.size(F.col(vec_col))
    bad = F.col(vec_col).isNotNull() & (w != F.lit(dim))
    reason = F.concat(
        F.lit("width:"), w.cast("string"), F.lit("!="), F.lit(str(dim))
    )
    return bad, reason


#: Max duplicated keys quarantine_duplicate_keys will broadcast; past
#: it the "duplication is rare" assumption has failed (a replayed
#: ingest, a cross-joined merge) and the anti join falls back to a
#: shuffled join rather than OOM the driver -- the bound-and-fall-back
#: contract shared with filter_decodable / lsh_candidate_pairs.
DUP_KEYS_BROADCAST_MAX = 10_000_000


def quarantine_duplicate_keys(
    df: DataFrame, key: str, broadcast_max: int = DUP_KEYS_BROADCAST_MAX
) -> tuple[DataFrame, DataFrame]:
    """Split ALL rows of any duplicated key from the clean stream ->
    (clean, quarantined-with-reason 'dupkey:<n_copies>').

    The r10 duplicate-key probe (tools/dupkey_probe.py) measured what
    non-unique ids -- legal in parquet, produced by retried writer
    tasks, at-least-once ingests, and bad merges -- do downstream:
    20 of 102 affected queries diverge SILENTLY with zero loud
    failures (the worst posture class). Two mechanisms: driver-side
    {id: value} collects (the PQ/ADC prefix codebook) keep ONE
    arbitrary row where the SQL oracle's relational join keeps both
    (nondeterministic codebooks), and row_number/grouping tiebreaks by
    id stop being total orders. Since the engine cannot know WHICH
    copy is true, every copy is quarantined -- resolution (keep
    newest, keep max seq, manual review) is the caller's policy on
    the quarantined side, e.g. via scd.py or domain_cap.

    Scale posture: the duplicated-key set comes from one partial-
    aggregated (map-side combined) count over KEYS ONLY -- payload
    bytes never shuffle -- then broadcasts into an anti join (clean)
    and an inner join (quarantined), bounded at ``broadcast_max``
    with a warned shuffled fallback. The dup-key aggregate is
    localCheckpoint-materialized FIRST (the filter_decodable posture,
    ADVICE r10) so the sizing count and both joins read one
    materialized pass instead of re-scanning and re-aggregating the
    key column three times. The checkpoint makes the build EAGER (one
    Spark job at construction -- the documented lsh bucket_cap
    posture) and trades away lineage fault-tolerance (ADVICE r11):
    localCheckpoint blocks live on executor LOCAL storage, so losing
    an executor after the build (preemption, dynamic-allocation
    decommission, OOM kill) fails the downstream joins unrecoverably
    instead of recomputing -- on clusters with executor churn, rebuild
    on failure (the aggregate is one cheap keys-only pass) or swap the
    localCheckpoint for a reliable ``checkpoint()`` with a configured
    checkpoint dir. Batch-only: a streaming source cannot be counted; use
    dropDuplicates within watermark (streaming/events.py stream_dedup)
    for the streaming analog.
    """
    if df.isStreaming:
        raise ValueError(
            "quarantine_duplicate_keys needs a batch input (sizing "
            "counts an aggregate); for streams use dropDuplicates "
            "within a watermark (stream_dedup)"
        )
    # keys-only and duplication-rare by assumption, so the checkpoint
    # footprint is bounded; past broadcast_max the fallback below still
    # reads the SAME checkpoint (never a corpus re-aggregation)
    dups = (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("_n_copies"))
        .filter(F.col("_n_copies") > 1)
        .localCheckpoint()
    )
    n_dup = dups.limit(broadcast_max + 1).count()
    if n_dup > broadcast_max:
        import warnings

        warnings.warn(
            f"quarantine_duplicate_keys: {n_dup}+ duplicated keys exceed "
            f"broadcast_max={broadcast_max}; the 'duplication is rare' "
            "broadcast assumption failed -- falling back to shuffled "
            "joins (same split, one extra shuffle of the key column).",
            RuntimeWarning,
            stacklevel=2,
        )
        dup_side = dups
    else:
        dup_side = F.broadcast(dups)
    clean = df.join(dup_side.select(key), key, "left_anti")
    quarantined = df.join(dup_side, key).withColumn(
        "quarantine_reason",
        F.concat(F.lit("dupkey:"), F.col("_n_copies").cast("string")),
    ).drop("_n_copies")
    return clean, quarantined


def quarantine_timestamp_range(
    df: DataFrame,
    ts_col: str = "ts",
    lo: str = "1900-01-01",
    hi: str = "2100-01-01",
) -> tuple[DataFrame, DataFrame]:
    """Split rows whose timestamp falls outside the plausible-business
    range -> (clean, quarantined-with-reason 'ts_out_of_range').

    The r10 extreme-timestamp probe (tools/ts_probe.py) measured what
    calendar-edge values -- epoch-zero sentinels, year-9999 "forever"
    rows, fat-fingered ancient years -- do downstream: 3 of 38 events
    queries diverge silently, and the mechanism matters at any scale:

    - ONE far-future event advances a streaming WATERMARK to its
      timestamp, silently dropping every legitimate sibling as "late"
      (the windowed-count probes lost rows vs the batch oracle);
    - arithmetic that crosses year 10000 renders differently per
      engine (Spark '+10000-01-01' ISO five-digit year vs DuckDB
      '10000-01-01'), flipping string sorts and hashes.

    The gate is a codegen'd range filter at scan speed (NULL stays
    CLEAN -- absent is legal, implausible is not), streaming-safe
    (pure filters, no aggregation), and belongs BEFORE the watermark
    on any stream whose producer clock is not trusted. Bounds are
    half-open [lo, hi): the defaults bracket plausible business time;
    pass domain bounds explicitly where they are known.
    """
    bad, reason = _ts_flags(ts_col, lo, hi)
    clean = df.filter(~bad)
    quarantined = df.filter(bad).withColumn("quarantine_reason", reason)
    return clean, quarantined


def _ts_flags(ts_col: str, lo: str, hi: str) -> tuple[Column, Column]:
    """(bad, reason) column pair for the timestamp-range axis (shared
    by quarantine_timestamp_range and quarantine_hostile)."""
    t = F.col(ts_col)
    bad = t.isNotNull() & (
        (t < F.lit(lo).cast("timestamp")) | (t >= F.lit(hi).cast("timestamp"))
    )
    reason = F.concat(F.lit("ts_out_of_range:"), t.cast("string"))
    return bad, reason


def sum_headroom_max_abs(precision: int, scale: int, max_rows: int):
    """Largest per-row ``abs(value)`` a ``decimal(precision, scale)``
    column can carry such that ``sum()`` over ``max_rows`` rows cannot
    overflow Spark's sum accumulator, which widens by 10 integer digits
    capped at 38: ``decimal(min(38, p+10), s)`` (pinned by
    tests/test_decimal_overflow.py::test_money_accumulator_headroom_is_ten_digits).

    The bound is floored to the column's own scale so it is exactly
    representable: ``max_rows`` rows at the bound sum to at most
    ``capacity``, where capacity is the largest decimal(acc_p, s) value.
    Computed in integer units of 10^-scale (a Decimal division would
    silently round at the context's 28 significant digits -- too few
    for a 38-digit accumulator).
    """
    from decimal import Decimal

    if max_rows < 1:
        raise ValueError(f"max_rows must be >= 1, got {max_rows}")
    acc_p = min(38, precision + 10)
    # capacity in units of 10^-scale: the largest decimal(acc_p, scale)
    # is (10^acc_p - 1) * 10^-scale; exact integer floor-divide,
    # clamped to the column's OWN max (with 10 digits of widening,
    # max_rows up to 10^10 can never overflow, so the headroom bound
    # can exceed what the column can even hold -- the gate is then a
    # no-op at the column max, which is the correct answer). The result
    # is built with the tuple constructor -- scaleb/division would
    # round through the 28-digit default context.
    bound_units = min((10**acc_p - 1) // max_rows, 10**precision - 1)
    return Decimal((0, tuple(int(d) for d in str(bound_units)), -scale))


def quarantine_magnitude(
    df: DataFrame, col: str, max_abs
) -> tuple[DataFrame, DataFrame]:
    """Split rows whose ``abs(col)`` exceeds ``max_abs`` -> (clean,
    quarantined-with-reason 'magnitude:<value>').

    This is the shipped substitute the decimal-overflow posture table
    promises (VERDICT r12 item 4): the session default keeps ANSI on,
    so a decimal-sum overflow is LOUD -- but a deployment forced onto
    ansi=false (the legacy-migration config) forfeits that loudness and
    a sum over hostile near-max money values silently returns NULL
    (a downstream coalesce then turns total revenue into 0). Gating the
    money column's magnitude at ingest restores the guarantee: with
    every surviving row bounded by :func:`sum_headroom_max_abs`
    (accumulator capacity / expected row bound), the accumulator cannot
    overflow, so the silent-NULL class is structurally unreachable.

    Pure filter -- scan speed, streaming-safe, composable alongside the
    other gates. NULL stays CLEAN (absent is legal, outsized is not);
    NaN in a float column stays clean here too via an explicit
    ``~isnan`` conjunct (review r13: Spark orders NaN GREATER than
    every numeric, so the bare ``abs(NaN) > x`` comparison is TRUE and
    would mis-attribute NaN to this gate) -- non-finite poison is
    :func:`quarantine_nonfinite`'s axis, same single-responsibility
    split as the ts gate. +-Infinity IS magnitude-quarantined here
    (its magnitude genuinely exceeds any bound); run the nonfinite
    gate first when its reason label is the one you want.

    The predicate is written as the disjunction ``v > max_abs OR
    v < -max_abs`` rather than ``abs(v) > max_abs`` deliberately:
    abs() never reaches the parquet reader (PushedFilters carries only
    IsNotNull), while the disjunction pushes as
    ``Or(GreaterThan, LessThan)`` and row-group min/max stats prune
    the quarantine-side scan to ~free on clean data -- measured at sf1
    (6M rows): 0.185 s vs 0.276 s warm, and the win grows with corpus
    size since pruning is per row group. Same pushable-axis lesson as
    the ts gate (tools/fusion_bench.py).
    """
    from pyspark.sql import types as T

    c = F.col(col)
    bad = c.isNotNull() & ((c > F.lit(max_abs)) | (c < -F.lit(max_abs)))
    if isinstance(df.schema[col].dataType, (T.FloatType, T.DoubleType)):
        # NaN orders greater than every numeric, so NaN > max_abs is
        # TRUE -- exclude it here too (review r13)
        bad = bad & ~F.isnan(c)
    reason = F.concat(F.lit("magnitude:"), c.cast("string"))
    clean = df.filter(~bad)
    quarantined = df.filter(bad).withColumn("quarantine_reason", reason)
    return clean, quarantined


def quarantine_partition_keys(
    df: DataFrame, col: str, *, allow_null: bool = True
) -> tuple[DataFrame, DataFrame]:
    """Split rows whose value for an INTENDED PARTITION column cannot
    survive a hive layout -> (clean, quarantined-with-reason
    'partition_unsafe').

    The r12 partition-values probe (tools/partition_values_probe.py)
    measured 18 hostile value classes through
    ``write.partitionBy(col)`` + read-back: 16 roundtrip and prune
    exactly (Spark percent-escapes ``=``, ``/``, newline, unicode,
    trailing dot/space, ... in the directory name), but the EMPTY
    STRING and the literal ``__HIVE_DEFAULT_PARTITION__`` are both
    written into the null-sentinel directory and read back as NULL --
    a silent 3-way merge with real NULLs (a filter on ``''`` then
    matches nothing; groupBy denominators shift). Worse cross-engine:
    DuckDB's hive_partitioning reads that same directory as the
    LITERAL sentinel string, so the two engines disagree on every row
    in it with zero errors.

    Pure filter -- scan speed, streaming-safe, composable alongside
    the quarantine_hostile axes -- to run BEFORE the write that lays
    the table out. True NULL stays clean by default (Spark defines its
    round-trip through the sentinel directory); pass
    ``allow_null=False`` on a lake other engines also read, where the
    sentinel directory itself is the divergence.

    String partition columns only (review r12): on a numeric column
    the ``''`` comparison coerces to NULL and the split would silently
    drop every non-null row from BOTH sides (ANSI off) or throw a
    confusing cast error (ANSI on) -- and the merge classes this gate
    exists for are string-layout artifacts anyway.
    """
    from pyspark.sql import types as T

    dtype = df.schema[col].dataType
    # char/varchar partition values hit the same sentinel-directory
    # merge as plain strings (ADVICE r12), so all three are accepted
    if not isinstance(dtype, (T.StringType, T.CharType, T.VarcharType)):
        raise ValueError(
            f"quarantine_partition_keys needs a string column; {col!r} is "
            f"{dtype.simpleString()} (numeric/date partition values have no "
            "empty-string/sentinel merge class to gate)"
        )
    c = F.col(col)
    bad = (c == F.lit("")) | (c == F.lit("__HIVE_DEFAULT_PARTITION__"))
    reason = F.when(
        c == F.lit(""), F.lit("partition_unsafe:empty_string")
    ).otherwise(F.lit("partition_unsafe:hive_sentinel"))
    if allow_null:
        bad = c.isNotNull() & bad
    else:
        bad = c.isNull() | bad
        reason = F.when(
            c.isNull(), F.lit("partition_unsafe:null")
        ).otherwise(reason)
    clean = df.filter(~bad)
    quarantined = df.filter(bad).withColumn("quarantine_reason", reason)
    return clean, quarantined


def quarantine_hostile(
    df: DataFrame,
    *,
    cols: list[str] | None = None,
    vec_col: str | None = None,
    dim: int | None = None,
    ts_col: str | None = None,
    ts_lo: str = "1900-01-01",
    ts_hi: str = "2100-01-01",
) -> tuple[DataFrame, DataFrame]:
    """The three pure-filter ingestion gates -- non-finite scalars,
    ragged vector widths, implausible timestamps -- fused into ONE
    corpus pass -> (clean, quarantined-with-reason).

    Why it exists (VERDICT r10 finding #3): each single-axis gate is
    individually scan-speed, but a 100 TB ingest composing
    ``quarantine_nonfinite`` -> ``quarantine_vector_width`` ->
    ``quarantine_timestamp_range`` pays one full corpus scan per
    QUARANTINED side it materializes (the clean sides collapse into
    one scan under Catalyst's filter-combining; the three quarantine
    reports do not -- they are three scans, plus a fourth for the
    clean output). This gate evaluates all three predicates in one
    codegen'd projection: the clean side is one scan, the combined
    quarantine report is one scan, total two -- the minimum for a
    split whose both sides are consumed (pinned by
    tests/test_curation.py::test_quarantine_hostile_single_scan).

    Measured nuance (tools/fusion_bench.py, r11): the per-axis
    sequential scans are not equal-cost. A standalone PUSHABLE
    predicate (the ts range) reaches the parquet reader and row-group
    statistics prune its quarantine scan to ~free on a clean corpus,
    while the fused OR (carrying isnan / size(), never pushable)
    pushes nothing. So the wall-clock win is one full scan per
    NON-pushable axis beyond the first, plus job-count overhead --
    fuse whenever >=2 non-pushable axes are active (any float or
    vector column), and order standalone pushable gates first when
    composing sequentially instead.

    Semantics are EXACTLY the sequential composition, pinned by an
    equivalence test on the hostile fixtures from all three probes:
    a row's ``quarantine_reason`` comes from the FIRST failing gate in
    composition order (nonfinite, then width, then ts -- the reason
    prefixes stay 'nonfinite:' / 'width:' / 'ts_out_of_range:', so a
    consumer of the single gates parses this report unchanged), and
    when ``dim`` is derived it is the modal width of the
    NONFINITE-CLEAN rows, exactly what the second gate in the chain
    would have seen. NULL stays clean on every axis (absent is legal;
    poisoned/mis-shaped/implausible is not).

    Axis selection: ``cols`` (None = every top-level float/double
    column; pass ``[]`` to disable the non-finite axis), ``vec_col``
    (None disables the width axis), ``ts_col`` (None disables the
    range axis). With every axis inactive the split is a schema-stable
    no-op. Streaming-safe like its parts: all pure filters, goes
    BEFORE the watermark; a streaming input with a width axis needs
    explicit ``dim=`` (modal derivation counts), same rule as the
    single gate. ``quarantine_duplicate_keys`` stays a separate pass
    by nature -- it needs a corpus aggregate, not a row predicate.
    """
    if cols is None:
        cols = _float_cols(df)
    axes: list[tuple[Column, Column]] = []
    if cols:
        axes.append(_nonfinite_flags(cols))
    if vec_col is not None:
        if dim is None:
            # derive the modal width over what the sequential chain's
            # width gate would see: the nonfinite-CLEAN rows
            scope = df.filter(~axes[0][0]) if axes else df
            dim = _modal_width(scope, vec_col)
        if dim is not None:
            axes.append(_width_flags(vec_col, dim))
        # dim None (no non-NULL vector exists): the width axis is a
        # no-op exactly as the single gate's no-op split
    if ts_col is not None:
        axes.append(_ts_flags(ts_col, ts_lo, ts_hi))
    if not axes:
        return df, df.filter(F.lit(False)).withColumn(
            "quarantine_reason", F.lit("")
        )
    any_bad = None
    for b, _ in axes:
        any_bad = b if any_bad is None else (any_bad | b)
    # first-failing-gate-wins: coalesce in composition order
    reason = F.coalesce(*[F.when(b, r) for b, r in axes])
    clean = df.filter(~any_bad)
    quarantined = df.filter(any_bad).withColumn("quarantine_reason", reason)
    return clean, quarantined
