"""Deduplication operators for LLM-data pipelines: exact, MinHash+LSH,
SimHash, and n-gram Jaccard (SURVEY.md north star).

All operators are DataFrame compositions -- explode / groupBy / join,
no Python UDFs -- so they distribute over arbitrarily many executors:

- **exact**: hash-groupBy on normalized text. One shuffle on the hash;
  at 100 TB pre-partition the corpus by the hash prefix and dedup
  becomes per-partition-local.
- **MinHash + LSH**: per-doc shingle ARRAY (narrow, no explode) -> K
  min-hashes via higher-order functions (narrow) -> B bands ->
  band-bucket self-join -> exact-Jaccard verification of candidates
  only. The corpus text NEVER crosses the network: the only shuffles
  carry (doc x band) signature rows and candidate pairs; the
  verification stage semi-joins the per-doc arrays down to the
  candidate neighborhood (broadcast under AQE when small) before any
  wide join. Candidate pairs are O(collisions), never O(n^2).
- **SimHash**: bitwise-majority signature; near-dups share most bits,
  so banding the signature gives the same bucket-join scale path.
- **n-gram Jaccard (exact)**: all-pairs with array_intersect -- the
  small-N / verification path, quadratic by construction; kept for
  oracle-checkable ground truth and for verifying LSH candidates.

Portability: the hash family is salted md5 rendered as hex strings
(min over *strings* is a valid MinHash); md5 is identical in Spark,
DuckDB, and Python, which makes every signature oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from .textanalysis import let_bind, tokens

# canonical text for hashing/shingling under the ``normalized=`` knob
# every text entry point here carries (VERDICT r10 item 4; default
# False keeps all existing plans byte-identical). The dispatch point
# is SHARED with textanalysis so the two modules' normalization policy
# cannot drift (review r11).
from .textanalysis import _norm as _tnorm  # noqa: E402

# MinHash permutation family: h_j(x) = (a_j * x + b_j) mod p over a
# 31-bit Mersenne prime. One md5 per shingle gives x; the K permutations
# are then integer-only, so the per-shingle cost is 1 hash + K mul-adds
# instead of K md5s (~16x less hashing CPU at 100 TB). Constants are a
# fixed Weyl-style sequence -- deterministic, shared verbatim with the
# DuckDB oracle via plans/_fragments.py.
MERSENNE_P = (1 << 31) - 1


def perm_params(num_hashes: int) -> list[tuple[int, int]]:
    """Deterministic (a_j, b_j) pairs for the universal-hash family.

    a_j, x < 2^31 keeps a_j * x + b_j < 2^62: exact in BIGINT in both
    Spark and DuckDB (no overflow, no bigint/hugeint divergence).
    """
    params = []
    for j in range(num_hashes):
        a = (2654435761 * (j + 1) + 1) % MERSENNE_P or 1
        b = (40503 * (j + 1) + 7) % MERSENNE_P
        params.append((a, b))
    return params


def _hex8_bigint(col_name: str) -> Column:
    """BIGINT value of the first 8 hex chars of an md5 hex-string column.

    `conv(hex, 16, 10)` stays inside whole-stage codegen (a higher-order
    `aggregate` Horner would run interpreted per shingle). DuckDB has no
    conv; the oracle mirrors the value digit-by-digit
    (plans/_fragments.hex8_value) -- same integer either way.
    """
    return F.conv(F.substring(col_name, 1, 8), 16, 10).cast("long")


def exact_dedup(
    df: DataFrame, id_col: str, text_col: str, normalized: bool = False
) -> DataFrame:
    """Group identical normalized texts: (text_hash, keeper_id, n_copies).

    The keeper is the minimum id (deterministic). Reference analog: the
    reference never dedups (one PDF == one record); this is the added
    pipeline op.
    """
    return (
        df.select(F.col(id_col), F.md5(_tnorm(text_col, normalized)).alias("text_hash"))
        .groupBy("text_hash")
        .agg(F.min(id_col).alias("keeper_id"), F.count(F.lit(1)).alias("n_copies"))
    )


def survivors(
    df: DataFrame, id_col: str, text_col: str, normalized: bool = False
) -> DataFrame:
    """The deduplicated corpus: first row (min id) per normalized text."""
    w = W.partitionBy(F.md5(_tnorm(text_col, normalized))).orderBy(F.col(id_col))
    return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


def shingle_sets(
    df: DataFrame, id_col: str, text_col: str, k: int = 3, normalized: bool = False
) -> DataFrame:
    """Distinct k-token shingles per document as an ARRAY: (id, ss).

    Entirely narrow -- no explode, no shuffle: a doc's shingles are
    computed in place from its token array. This is the foundation of
    the zero-corpus-shuffle MinHash pipeline: signatures derive from
    the array with higher-order functions, and verification reuses the
    same arrays, so raw text/shingles never cross the network.
    """
    # Shingles are built by ZIPPING k shifted slices of the token array
    # (r7 rework). The obvious formulation -- transform(sequence(1, n-k+1),
    # i -> concat_ws(' ', element_at(tk, i), ..., element_at(tk, i+k-1)))
    # over a separately-projected tk -- is a scale trap: Catalyst's
    # CollapseProject merges the tk projection into the consumer, so the
    # whole tokenize expression (regex + split) is inlined into EVERY
    # element_at reference and re-evaluated k times PER SHINGLE ELEMENT
    # (measured: ~2.6k re-tokenizations per document, 97 s cold for 50k
    # docs at sf1 -- warm caches had hidden it from the bench). Each
    # slice below references tk exactly once per ROW, so even after
    # projection collapse the tokenizer runs ~k times per document:
    # the same 50k docs now shingle in ~2 s cold.
    tk = df.select(F.col(id_col).alias("id"), tokens(text_col, normalized).alias("tk"))
    toks = F.col("tk")
    m = F.size(toks) - (k - 1)  # number of shingles
    parts = [F.slice(toks, j + 1, m) for j in range(k)]
    shingle = parts[0]
    for p in parts[1:]:
        shingle = F.zip_with(shingle, p, lambda a, b: F.concat(a, F.lit(" "), b))
    # docs with < k tokens yield no shingles (matches the oracle's
    # range(1, len-k+2), which is empty there); the filter also keeps
    # the slice length positive under ANSI mode
    return tk.filter(F.size(toks) >= k).select(
        "id", F.array_distinct(shingle).alias("ss")
    )


def token_shingles(
    df: DataFrame, id_col: str, text_col: str, k: int = 3, normalized: bool = False
) -> DataFrame:
    """Distinct k-token shingles per document: (id, shingle), exploded.

    Long-form view of :func:`shingle_sets` for consumers that want to
    partition by shingle (e.g. building an inverted shingle index)."""
    return shingle_sets(df, id_col, text_col, k, normalized).select(
        "id", F.explode("ss").alias("shingle")
    )


def minhash_signatures(
    sets: DataFrame, num_hashes: int = 16, band_size: int = 4
) -> DataFrame:
    """Banded MinHash signatures from shingle arrays: (id, band, band_hash).

    x(s) = first 8 hex chars of md5(s) as BIGINT, reduced mod p;
    hash_j(s) = (a_j * x + b_j) mod p -- a universal-hash permutation
    per j, so min over it is a valid MinHash. One md5 per shingle; the
    K permutations are integer mul-adds over the materialized x array.
    A band's hash is md5 of its member values joined in j order.

    Plan shape (VERDICT r4 item 4): everything here is NARROW -- the x
    array is computed per row, the K minima are array_min over K
    transforms of it, bands are md5s of those minima, and the unpivot
    (stack) is row-local. Zero exchanges from corpus to signatures;
    the first shuffle of the whole pipeline is the band self-join over
    |docs| x B signature rows.
    """
    # ONE md5+conv per shingle, ONE fold per row (r7 rework). The
    # previous shape projected xs then took K array_min(transform(xs))
    # columns -- but Catalyst's CollapseProject inlines the xs
    # expression into every consumer, so the md5 ran K times per
    # shingle (the same trap fixed in shingle_sets). Here xs is the
    # ARRAY ARGUMENT of a single aggregate (evaluated once per row);
    # the fold's lambda variables are bound VALUES, so each shingle is
    # hashed once and the K running minima advance with K mul-adds via
    # zip_with. The banding step then LET-BINDS the minima array
    # (transform over a 1-element array wrapper) so its 4 band
    # consumers reference the bound variable, not the fold expression.
    params = perm_params(num_hashes)
    pa = F.array(*[F.lit(a) for a, _ in params])
    pb = F.array(*[F.lit(b) for _, b in params])
    xs = F.transform(
        "ss", lambda s: F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long") % MERSENNE_P
    )
    # init = P: every real hash value is <= P-1, so least() always
    # replaces it (sets rows are guaranteed a non-empty shingle array)
    init = F.array_repeat(F.lit(MERSENNE_P).cast("long"), num_hashes)
    mins = F.aggregate(
        xs,
        init,
        lambda acc, x: F.zip_with(
            acc,
            F.zip_with(pa, pb, lambda a, b: (a * x + b) % MERSENNE_P),
            lambda m, v: F.least(m, v),
        ),
    )
    n_bands = num_hashes // band_size
    bands = let_bind(
        mins,
        lambda ms: F.transform(
            F.sequence(F.lit(0), F.lit(n_bands - 1)),
            lambda b: F.struct(
                b.cast("long").alias("band"),
                F.md5(
                    F.array_join(
                        F.transform(
                            F.slice(ms, b * band_size + 1, band_size),
                            lambda h: h.cast("string"),
                        ),
                        "|",
                    )
                ).alias("band_hash"),
            ),
        ),
    )
    return sets.select("id", F.explode(bands).alias("bh")).select(
        "id", "bh.band", "bh.band_hash"
    )


#: Max oversized-bucket rows the flood-protection path will broadcast.
#: A (band, band_hash, hub) row is ~50 bytes, so 2M rows is ~100 MB of
#: driver + per-executor memory -- past that the "floods are few"
#: assumption has failed and the hub join falls back to a shuffled join.
LSH_OVERSIZED_BROADCAST_MAX = 2_000_000


def lsh_candidate_pairs(
    signatures: DataFrame,
    bucket_cap: int | None = None,
    oversized_broadcast_max: int = LSH_OVERSIZED_BROADCAST_MAX,
) -> DataFrame:
    """Distinct id pairs (a < b) sharing at least one LSH band bucket.

    ``bucket_cap`` bounds the quadratic blowup of DUPLICATE-FLOODED
    buckets -- the real shape of web-scale corpora, where a boilerplate
    page repeated m times puts all m docs in one band bucket and the
    self-join emits m(m-1)/2 pairs (60k copies = 1.8e9 pairs from one
    bucket). Buckets larger than the cap emit STAR pairs instead --
    (bucket-min id, member) -- which is linear in m and preserves the
    duplicate CLUSTERS exactly through the downstream
    jaccard_verify -> connected_components pipeline whenever the hub
    pair passes verification (for flood buckets the members are
    near-identical by construction, so they do). The trade: within an
    oversized bucket, two docs whose similarity exists only PAIRWISE
    (not through the hub) are no longer candidates -- acceptable
    because LSH buckets that large are dup floods, not coincidences,
    and the alternative is a quadratic shuffle that kills the job.
    Default None keeps the exact all-pairs semantics (the
    oracle-checked registry configuration; gate buckets are tiny).

    ``oversized_broadcast_max`` bounds the broadcast itself: the hub
    join assumes floods are FEW, but a corpus of many distinct flooded
    buckets (templated boilerplate families) makes the oversized list
    itself large, and broadcasting it would OOM the driver with no
    diagnostic tying the failure to this knob. Past the bound the hub
    joins fall back to shuffled joins (correctness identical -- the
    broadcast is a pure locality hint) and a warning names the knob.
    """
    if bucket_cap is not None:
        # Bucket sizing as an AGGREGATE restricted to OVERSIZED buckets,
        # not a window: a window over (band, band_hash) would shuffle
        # every signature row once per consumer subtree (measured 3x in
        # the first formulation), while the aggregate's exchange carries
        # only per-bucket partial counts and the oversized list is tiny
        # by nature (floods are few) -- so it broadcasts, and signature
        # rows never shuffle for sizing at all.
        keys = ["band", "band_hash"]
        oversized = (
            signatures.groupBy(*keys)
            .agg(F.count(F.lit(1)).alias("m"), F.min("id").alias("hub"))
            .filter(F.col("m") > bucket_cap)
            .select(*keys, "hub")
        )
        # bounded guard before broadcasting: count at most max+1 rows
        # (limit keeps the probe job from scanning an unbounded
        # aggregate output). The sizing agg re-runs in the joins below
        # -- one extra narrow pass, cheap next to a driver OOM. NOTE:
        # this makes the capped path EAGER at plan-construction time
        # (one Spark job before any action) -- acceptable for the
        # batch dedup pipelines that use bucket_cap; a streaming input
        # cannot be counted, so it keeps the unguarded broadcast
        # (previous behavior) rather than crashing here.
        if signatures.isStreaming:
            import warnings

            # a streaming input cannot be counted, so the broadcast
            # bound is UNENFORCED on this branch -- say so once, so a
            # streaming flood OOM is attributable to this knob rather
            # than mysterious (ADVICE r9)
            warnings.warn(
                "lsh_candidate_pairs(bucket_cap=...) on a STREAMING "
                "input: oversized_broadcast_max cannot be enforced "
                "(sizing needs a count) -- the flood-cap broadcast is "
                "unbounded here; a driver OOM under a duplicate flood "
                "is attributable to this unguarded branch.",
                RuntimeWarning,
                stacklevel=2,
            )
            n_over = 0
        else:
            n_over = oversized.limit(oversized_broadcast_max + 1).count()
        if n_over > oversized_broadcast_max:
            import warnings

            warnings.warn(
                f"lsh_candidate_pairs: {n_over}+ distinct flooded buckets "
                f"exceed oversized_broadcast_max="
                f"{oversized_broadcast_max}; the 'floods are few' broadcast "
                f"assumption failed -- falling back to shuffled hub joins "
                f"(same pairs, one extra shuffle of signature rows).",
                RuntimeWarning,
                stacklevel=2,
            )
            hub = oversized  # shuffled join: no broadcast hint
        else:
            hub = F.broadcast(oversized)
        star = (
            signatures.join(hub, keys)
            .filter(F.col("id") > F.col("hub"))
            .select(F.col("hub").alias("a"), F.col("id").alias("b"))
        )
        small = signatures.join(hub, keys, "left_anti")
        return lsh_candidate_pairs(small, None).union(star).distinct()
    left = signatures.select(
        F.col("id").alias("a"), F.col("band").alias("band_l"), F.col("band_hash").alias("bh_l")
    )
    right = signatures.select(
        F.col("id").alias("b"), F.col("band").alias("band_r"), F.col("band_hash").alias("bh_r")
    )
    return (
        left.join(
            right,
            (F.col("band_l") == F.col("band_r"))
            & (F.col("bh_l") == F.col("bh_r"))
            & (F.col("a") < F.col("b")),
        )
        .select("a", "b")
        .distinct()
    )


def jaccard_verify(pairs: DataFrame, sets: DataFrame) -> DataFrame:
    """Exact Jaccard for candidate pairs: (a, b, jaccard).

    ``sets`` is the (id, ss) shingle-array table from
    :func:`shingle_sets`. It is semi-joined down to the docs that
    appear in any candidate pair -- at 100 TB that drops the corpus to
    the (small) near-dup neighborhood, and with AQE the candidate-id
    side broadcasts, so the full corpus never shuffles -- then pairs
    are scored with array_intersect. Per-doc arrays are bounded by
    document length, and the exploded (doc, shingle) x (doc, shingle)
    shuffle join of the naive formulation never occurs. Counts are
    exact integers; the final division is the only float op
    (cross-engine stable).

    `pairs` feeds three subtrees here (both arms of the id union + the
    final scoring join), so an unpersisted expensive `pairs` (an LSH
    self-join, typically) re-runs per subtree. This function does NOT
    persist: the CALLER owns that lifecycle (`pairs.persist()` before
    the call, unpersist when the scored result is consumed), which
    keeps the cost deterministic across repeated invocations -- an
    earlier module-global one-entry cache made performance call-order-
    dependent (VERDICT r2). Spark's CacheManager de-duplicates persists
    of canonically-equal plans, so a caller re-invoking the same
    pipeline holds ONE cache entry, not one per call.
    """
    # no .distinct() on the probe side (r17): a left-semi build needs
    # only key EXISTENCE, so deduplicating the union first bought
    # nothing but a full exchange + two-level aggregate in front of
    # the semi-join. Dropping it removes that exchange at any scale
    # (the build relation hashes the ids anyway; duplicate build keys
    # cost at most 2x|pairs| 8-byte entries vs |ids|) -- measured
    # 1.90x on the warm verify stage at sf0.1 (7 -> 5 stage-jobs),
    # value-identical for every input including duplicate pairs.
    cand_ids = pairs.select(F.col("a").alias("id")).union(
        pairs.select(F.col("b").alias("id"))
    )
    cand_sets = sets.join(cand_ids, "id", "left_semi")
    n_inter = F.size(F.array_intersect("ss_a", "ss_b"))
    return (
        pairs.join(
            cand_sets.select(F.col("id").alias("a"), F.col("ss").alias("ss_a")), "a"
        )
        .join(cand_sets.select(F.col("id").alias("b"), F.col("ss").alias("ss_b")), "b")
        .select(
            "a",
            "b",
            (
                n_inter.cast("double") / (F.size("ss_a") + F.size("ss_b") - n_inter)
            ).alias("jaccard"),
        )
    )


def ngram_jaccard_allpairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 2,
    threshold: float = 0.0,
    normalized: bool = False,
) -> DataFrame:
    """Exact all-pairs n-gram Jaccard via array_intersect (a < b).

    Quadratic: this is the ground-truth / small-N path. The scale path
    is minhash_signatures + lsh_candidate_pairs + jaccard_verify.

    Two physically different exact plans, picked by ``threshold``:

    - ``threshold > 0``: a positive threshold excludes every
      zero-intersection pair (jaccard 0 < threshold), so only pairs
      sharing at least one shingle can appear -- exactly the pairs an
      INVERTED SHINGLE INDEX enumerates. The cartesian self-join of
      the naive form (n^2/2 pairs x an O(|sh|) array_intersect EACH)
      is replaced by explode -> equi-join on the shingle -> count per
      pair = |intersection| (shingle arrays are array_distinct, so
      each shared shingle contributes exactly one joined row), then a
      size join for the union term. Work is sum(df_s^2) over shingle
      doc-frequencies instead of unconditionally n^2 * |sh| -- never
      asymptotically worse (a shingle in all n docs costs n^2 once,
      which the cartesian paid PER PAIR via the intersect scan), and
      orders of magnitude less on real text. Measured r17 at sf0.1:
      21.5 s -> 1.9 s warm (11.4x), all 7.26M result rows identical.
    - ``threshold <= 0``: zero-intersection pairs are part of the
      result (jaccard 0.0 >= 0.0), so the all-pairs form is the only
      exact plan; keep it.
    """
    # shingle build shares shingle_sets' zip-slice shape (one tokenize
    # pass per slice, never per element -- see shingle_sets for the
    # CollapseProject trap the naive element_at form falls into)
    base = shingle_sets(df, id_col, text_col, k, normalized).select(
        "id", F.col("ss").alias("sh")
    )
    if threshold > 0:
        ex = base.select("id", F.explode("sh").alias("s"))
        a = ex.select(F.col("id").alias("a"), "s")
        b = ex.select(F.col("id").alias("b"), "s")
        inter = (
            a.join(b, ["s"])
            .filter(F.col("a") < F.col("b"))
            .groupBy("a", "b")
            .agg(F.count(F.lit(1)).alias("_ni"))
        )
        sizes = base.select("id", F.size("sh").alias("_n"))
        return (
            inter.join(
                sizes.select(F.col("id").alias("a"), F.col("_n").alias("_na")), "a"
            )
            .join(sizes.select(F.col("id").alias("b"), F.col("_n").alias("_nb")), "b")
            .select(
                "a",
                "b",
                (
                    F.col("_ni").cast("double")
                    / (F.col("_na") + F.col("_nb") - F.col("_ni"))
                ).alias("jaccard"),
            )
            .filter(F.col("jaccard") >= threshold)
        )
    a = base.select(F.col("id").alias("a"), F.col("sh").alias("sh_a"))
    b = base.select(F.col("id").alias("b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        a.join(b, F.col("a") < F.col("b"))
        .select("a", "b", (inter.cast("double") / union).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def simhash_signatures(
    df: DataFrame, id_col: str, text_col: str, bits: int = 32, normalized: bool = False
) -> DataFrame:
    """SimHash over distinct tokens: (id, simhash) with simhash as a
    `bits`-length '0'/'1' string (portable; band it for bucketing).

    bit_j(token) = bit j of the 32-bit value of md5(token)[:8];
    signature bit j = majority vote over tokens.

    Plan shape: entirely NARROW (zero shuffles), same rework as
    minhash_signatures -- the per-token hash values are materialized as
    an array column once (one md5 per token; no CSE across lambda
    boundaries, so the inner per-bit transform must see the bound
    lambda VARIABLE, not the md5 expression), and the bit-majority
    accumulator is a higher-order aggregate with zip_with. The old
    explode -> groupBy(id, j) -> groupBy(id) formulation shuffled the
    corpus twice for the same answer.
    """
    xs = F.transform(
        F.array_distinct(tokens(text_col, normalized)),
        lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long"),
    )
    # NULL-text / zero-token docs have no signature: the explode-based
    # formulation (and the oracle's unnest) dropped them implicitly, so
    # the narrow rework must filter them explicitly to agree.
    withx = df.select(F.col(id_col).alias("id"), xs.alias("xs")).filter(
        F.col("xs").isNotNull() & (F.size("xs") > 0)
    )
    contribs = F.expr(
        f"aggregate(xs, CAST(array_repeat(0, {bits}) AS ARRAY<BIGINT>), "
        f"(acc, x) -> zip_with(acc, transform(sequence(0, {bits - 1}), "
        "j -> CAST(2 * pmod(shiftright(x, j), 2) - 1 AS BIGINT)), (a, b) -> a + b))"
    )
    return withx.select(
        "id",
        F.array_join(
            F.transform(contribs, lambda s: F.when(s > 0, "1").otherwise("0")), ""
        ).alias("simhash"),
    )


def incremental_dedup(
    batch: DataFrame,
    corpus: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    num_hashes: int = 16,
    band_size: int = 4,
    normalized: bool = False,
) -> DataFrame:
    """Dedup a NEW batch against an EXISTING corpus (cross-batch dedup).

    The production shape for a continuously-ingesting 100 TB pipeline:
    the corpus is never re-deduplicated -- each arriving batch is
    checked against it and only survivors are appended. Two membership
    probes, both against *derived* tables orders of magnitude smaller
    than the corpus text:

    - ``exact_dup``: the batch doc's normalized-text md5 exists in the
      corpus hash set (semi-join on the 16-byte hash);
    - ``near_dup``: any of the batch doc's MinHash band hashes collides
      with a corpus band hash (semi-join on (band, band_hash) -- the
      same banded-LSH index dedup_minhash_lsh builds, which at scale is
      a persisted table maintained across ingests, so the incremental
      cost is signatures(batch) + two equi-joins).

    Returns (id, exact_dup, near_dup, keep) for every batch doc, all
    bigint 0/1 flags; ``keep`` = neither probe hit. Corpus text never
    shuffles: both probe inputs are narrow projections (hash / HOF
    signatures), exactly like the full-corpus LSH pipeline.
    """
    b_hash = batch.select(
        F.col(id_col).alias("id"), F.md5(_tnorm(text_col, normalized)).alias("h")
    )
    c_hash = corpus.select(F.md5(_tnorm(text_col, normalized)).alias("h")).distinct()
    exact_ids = b_hash.join(c_hash, "h", "left_semi").select("id").distinct()

    b_sig = minhash_signatures(
        shingle_sets(batch, id_col, text_col, k=k, normalized=normalized),
        num_hashes, band_size,
    )
    c_sig = minhash_signatures(
        shingle_sets(corpus, id_col, text_col, k=k, normalized=normalized),
        num_hashes, band_size,
    ).select("band", "band_hash")
    near_ids = (
        b_sig.join(c_sig, ["band", "band_hash"], "left_semi").select("id").distinct()
    )

    flag = F.lit(1).cast("long")
    out = (
        batch.select(F.col(id_col).alias("id"))
        .join(exact_ids.withColumn("exact_dup", flag), "id", "left")
        .join(near_ids.withColumn("near_dup", flag), "id", "left")
    )
    zero = F.lit(0).cast("long")
    return out.select(
        "id",
        F.coalesce("exact_dup", zero).alias("exact_dup"),
        F.coalesce("near_dup", zero).alias("near_dup"),
        F.when(F.coalesce("exact_dup", zero) + F.coalesce("near_dup", zero) > 0, zero)
        .otherwise(F.lit(1).cast("long"))
        .alias("keep"),
    )


def containment_verify(pairs: DataFrame, sets: DataFrame) -> DataFrame:
    """Exact containment for candidate pairs: (a, b, containment).

    Containment = |A n B| / min(|A|, |B|) -- the ASYMMETRIC overlap
    measure: a short document fully embedded in a long one scores 1.0
    here but a low Jaccard (the union is dominated by the long doc),
    so this is the detector for quote/boilerplate/sub-document
    duplication that symmetric near-dedup underrates. Same scale shape
    as jaccard_verify (semi-join the shingle arrays down to the
    candidate neighborhood; caller owns the `pairs` persist
    lifecycle); counts are exact integers, one float division.
    """
    # no .distinct() on the probe side (r17): a left-semi build needs
    # only key EXISTENCE, so deduplicating the union first bought
    # nothing but a full exchange + two-level aggregate in front of
    # the semi-join. Dropping it removes that exchange at any scale
    # (the build relation hashes the ids anyway; duplicate build keys
    # cost at most 2x|pairs| 8-byte entries vs |ids|) -- measured
    # 1.90x on the warm verify stage at sf0.1 (7 -> 5 stage-jobs),
    # value-identical for every input including duplicate pairs.
    cand_ids = pairs.select(F.col("a").alias("id")).union(
        pairs.select(F.col("b").alias("id"))
    )
    cand_sets = sets.join(cand_ids, "id", "left_semi")
    n_inter = F.size(F.array_intersect("ss_a", "ss_b"))
    return (
        pairs.join(
            cand_sets.select(F.col("id").alias("a"), F.col("ss").alias("ss_a")), "a"
        )
        .join(cand_sets.select(F.col("id").alias("b"), F.col("ss").alias("ss_b")), "b")
        .select(
            "a",
            "b",
            (
                n_inter.cast("double")
                / F.least(F.size("ss_a"), F.size("ss_b"))
            ).alias("containment"),
        )
    )


def recall_sample_mod(n_docs: int, base_mod: int = 8, n_ref: int = 8192) -> int:
    """Corpus-size-scaled sampling modulus for recall evaluation:
    ``base_mod * 2^max(0, floor(log2(n_docs / n_ref)))``.

    sampled_truth_pairs' cost is ``(#shingles / sample_mod) * df_cap^2``
    and #shingles is linear in the corpus, so a FIXED mod means the
    eval grows with the corpus forever (97 s at sf10, VERDICT r7
    item 4). Doubling the mod per corpus doubling instead targets a
    fixed SAMPLED-PAIR BUDGET: the sampled-shingle count stays within
    2x of ``n_ref * shingles_per_doc / base_mod`` at any scale, making
    recall evaluation ~constant-cost. Power-of-two steps keep the
    small-SF moduli exactly ``base_mod`` (n_docs <= n_ref), so oracle
    results at the correctness-gate SFs are unchanged.

    Integer-exact (doubling loop, no float log) so Spark-side Python
    and the oracle's FLOOR(LOG2(...)) agree for every achievable
    n_docs; n_ref is a power of two so the oracle's double division is
    exact at the boundaries.
    """
    factor = 1
    while n_ref * factor * 2 <= n_docs:
        factor *= 2
    return base_mod * factor


def sampled_truth_pairs(
    sets: DataFrame, sample_mod: int = 8, df_min: int = 2, df_cap: int = 50
) -> DataFrame:
    """Scale-bounded ground-truth pair universe for recall evaluation.

    The exhaustive truth for "which document pairs are really similar"
    is the shingle-inverted-index self-join -- quadratic in co-shingle
    pairs, impossible at corpus scale (VERDICT r6 weak mark). This is
    the standard scale-safe estimator construction instead: a
    DETERMINISTIC hash-sample of the inverted index.

    - sample stratum: keep a shingle iff hex8(md5(shingle)) %
      ``sample_mod`` == 0 -- value-based, so both engines and every
      executor agree, and all postings of a sampled shingle survive
      together (the property that makes pair discovery well-defined);
    - frequency cap: drop sampled shingles with document frequency
      outside [``df_min``, ``df_cap``] -- df=1 shingles generate no
      pairs, and df > cap shingles are boilerplate stop-shingles whose
      posting self-join is the quadratic hot spot (they contribute
      almost nothing to similarity: a shingle shared by thousands of
      docs carries no pair signal). Cost is therefore bounded by
      #sampled_shingles * df_cap^2 -- LINEAR in the corpus;
    - pair discovery: self-join ONLY the sampled, capped postings.

    A truly similar pair (Jaccard >= 0.2 at k=3 shingles) shares many
    shingles, so it enters the sample with probability
    1 - (1 - 1/sample_mod)^shared -- >= 0.93 at 20 shared shingles
    (sample_mod=8) and ~1 beyond 50. Exact Jaccard is then computed
    ONLY on the sampled pairs (jaccard_verify's candidate-restricted
    shape), giving an unbiased recall estimate over the sampled truth
    stratum at linear cost.
    """
    sh = sets.select(F.col("id").alias("doc_id"), F.explode("ss").alias("shingle"))
    samp = sh.filter(_hex8_bigint(F.md5("shingle")) % sample_mod == 0)
    # df via a count window over the shingle partition: ONE pass over
    # the sampled postings (the aggregate+semi-join formulation
    # evaluated the explode+hash subplan twice -- once for the df
    # aggregate, once for the posting join)
    df_w = F.count(F.lit(1)).over(W.partitionBy("shingle"))
    post = (
        samp.withColumn("df", df_w)
        .filter((F.col("df") >= df_min) & (F.col("df") <= df_cap))
        .drop("df")
    )
    pa = post.select(F.col("doc_id").alias("a"), "shingle")
    pb = post.select(F.col("doc_id").alias("b"), "shingle")
    return (
        pa.join(pb, "shingle")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def embedding_lsh_candidate_pairs(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    bands: int = 4,
    planes_per_band: int | None = None,
    target_bucket: int = 64,
    n: int | None = None,
) -> DataFrame:
    """Corpus-scaled BANDED hyperplane-LSH candidate pairs for
    embedding near-dup -> (a, b), distinct.

    The single-band 8-plane shape (``dedup_embedding_cosine`` before
    its sanctioned r12 swap onto this path; ``bands=1,
    planes_per_band=8`` reproduces it) is
    oracle-exact at the gate SFs but QUADRATIC at fixed planes: its
    candidate volume measured 8.7k -> 965k -> 97.7M pairs across
    sf0.1 -> sf1 -> sf10 (~100x per 10x corpus; 255 buckets cannot
    absorb 200k vectors). The scale-correct construction mirrors the
    MinHash text path: ``bands`` independent plane sets (disjoint
    ``plane_offset`` ranges -> independent md5-derived planes), each
    wide enough that expected bucket occupancy stays ~``target_bucket``
    -- ``planes_per_band = max(8, ceil(log2(n / target_bucket)))`` --
    so per-band candidate volume is ~n * target_bucket / 2: LINEAR in
    the corpus, at any corpus, with recall restored by the band union
    (a near-dup pair colliding in ANY band is a candidate; for
    cosine >= 0.95 neighbors the per-plane agreement is ~0.9, so 4
    bands of 12 planes give ~1 - (1 - 0.9^12)^4 ~ 0.73 pair recall vs
    0.28 single-band, and planted-cluster recall is pinned ~1.0 in
    tests because real near-dups collide in several bands).

    ``n`` (corpus size) skips the sizing count; required for
    streaming inputs (cannot count an unbounded stream). Derivation
    is ONE narrow count job, driver-side ceil-log2 -- the codebook
    convention. Vectors failing the indexability contract are
    excluded (similarity.indexable).
    """
    import math as _math

    from .similarity import hyperplane_bucket, indexable

    e = emb.filter(indexable(vec_col)).select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v")
    )
    if planes_per_band is None:
        if n is None:
            if emb.isStreaming:
                raise ValueError(
                    "embedding_lsh_candidate_pairs on a streaming input "
                    "needs n= or planes_per_band= (sizing needs a count)"
                )
            n = e.count()
        planes_per_band = max(8, _math.ceil(_math.log2(max(n, 1) / target_bucket))
                              if n > target_bucket else 8)
    # ONE corpus scan: every band's bucket is computed in the same
    # projection and unpivoted with posexplode, then a single
    # self-join on (band, bucket) finds all bands' collisions -- a
    # per-band loop would rescan the (unpersisted) corpus once per
    # band at exactly the scale this operator exists for (review r10
    # finding #6; the minhash text path has the same shape)
    buckets = F.array(
        *[
            hyperplane_bucket(
                "v", dim, planes_per_band, plane_offset=band * planes_per_band
            )
            for band in range(bands)
        ]
    )
    bucketed = e.select("id", F.posexplode(buckets).alias("band", "bucket"))
    a = bucketed.select(F.col("id").alias("a"), "band", "bucket")
    b = bucketed.select(F.col("id").alias("b"), "band", "bucket")
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def embedding_cosine_pairs_scaled(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    threshold: float = 0.95,
    bands: int = 4,
    planes_per_band: int | None = None,
    target_bucket: int = 64,
    n: int | None = None,
) -> DataFrame:
    """Scale path for embedding-cosine near-dup: banded corpus-scaled
    LSH candidates (:func:`embedding_lsh_candidate_pairs`) verified
    with exact cosine -> (a, b, cosine, is_dup). Linear candidate
    volume instead of quadratic (measured decade table in BASELINE.md
    r10). Since the sanctioned r12 swap this IS the
    ``dedup_embedding_cosine`` registry plan (bands=4,
    target_bucket=64); the pre-swap fixed single-band 8-plane shape is
    its restriction ``bands=1, planes_per_band=8``."""
    from .similarity import _dot, _norm, indexable

    cand = embedding_lsh_candidate_pairs(
        emb, id_col, vec_col, dim, bands, planes_per_band, target_bucket, n
    )
    # per-ROW norms + a let-bound cosine (r16): the former per-pair
    # expression folded both 64-element norms per pair AND evaluated
    # the whole dot+norm tree TWICE (once under round(), once under the
    # threshold compare). Norms now fold once per row, and the cosine
    # double is bound once per pair with both consumers referencing the
    # bound value -- bit-identical outputs, ~6x fewer array folds per
    # candidate pair.
    from .textanalysis import let_bind

    vecs = emb.filter(indexable(vec_col)).select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_v"),
        _norm(vec_col).alias("_nrm"),
    )
    pairs = cand.join(
        vecs.withColumnRenamed("_id", "a")
        .withColumnRenamed("_v", "va")
        .withColumnRenamed("_nrm", "_a_nrm"),
        "a",
    ).join(
        vecs.withColumnRenamed("_id", "b")
        .withColumnRenamed("_v", "vb")
        .withColumnRenamed("_nrm", "_b_nrm"),
        "b",
    )
    cos = _dot("va", "vb") / (F.col("_a_nrm") * F.col("_b_nrm"))
    scored = let_bind(
        cos,
        lambda cv: F.struct(
            F.round(cv, 6).alias("cosine"), (cv >= threshold).alias("is_dup")
        ),
    )
    return pairs.select("a", "b", scored.alias("_s")).select(
        "a", "b", F.col("_s.cosine").alias("cosine"), F.col("_s.is_dup").alias("is_dup")
    )
