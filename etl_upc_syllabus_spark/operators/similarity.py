"""Approximate-nearest-neighbor search over embedding columns
(SURVEY.md north star: similarity search for LLM-data pipelines).

Two paths, same output shape (query_id, cand_id, cosine, rank):

- **brute force**: broadcast the (small) query set against the full
  corpus; dot products as zip_with/aggregate column expressions --
  JVM-side, no Python. Exact baseline; linear in corpus size, so it
  scales to 100 TB only when the query set is small (which is the
  common re-ranking / eval case).
- **random-hyperplane LSH**: 8 deterministic hyperplanes bucket every
  vector into a 256-way signature; queries only compare against
  same-bucket candidates. The bucket join is an equi-join on the
  signature -- shuffle-partitioned, no quadratic blowup. Recall is
  tunable via planes/bands; this is the 100 TB path.

Hyperplane weights derive from md5 (deterministic, reproducible in
the DuckDB oracle); cosine values are rounded to 6 decimals *before*
ranking so rank order is identical across engines.

**Indexability contract (element-level NULL, r10).** A vector is
*indexable* iff it is non-NULL AND contains no NULL element
(:func:`indexable`). Non-indexable vectors cannot seed a codebook,
serve as a query, be retrieved as a candidate, or receive a cluster
assignment -- every operator here filters them the way it always
filtered whole-NULL vectors. The element-level extension exists
because parquet legally stores ``[1.0, NULL, 2.0]`` and pandas->Arrow
*silently creates* it from NaN (r9 probe finding): before r10, such
vectors null-propagated whole Spark dot products while SQL SUM skipped
the NULL term -- silently divergent rankings -- and crashed the PQ
family's driver-side codebook collect with a bare TypeError. The
DuckDB oracles share the contract via the dims CTE's element-NULL
exclusion (plans/_fragments.dims_cte). For PREFIX SEEDS (the PQ/ADC
codebook collect) the two corruption shapes deliberately differ:

- an ELEMENT-NULL seed (exists, has NULL elements) is dropped from
  the codebook -- both engines see the same smaller codebook,
  original centroid ids preserved as codes;
- a WHOLE-NULL seed raises the same loud configuration error as an
  id absent from the corpus. This asymmetry is intentional, not an
  oversight (ADVICE r10 pinned it): the prefix collect filters
  ``isNotNull`` first, which is load-bearing for the all-NULL
  degenerate corpus (it must route to the clean empty-encode branch,
  whose guard is "no indexable vector exists", not to a spurious
  all-corrupt raise); a whole-NULL row in the seed prefix is the
  classic ungated-corpus signature (join miss, dead id) and is
  indistinguishable from a non-0-based id space without a second
  corpus probe. The DuckDB oracle's dims CTE would silently build a
  smaller codebook here -- the divergence is LOUD on the Spark side,
  never a silent wrong answer, which is the acceptable class.
  Pinned by tests/test_nonfinite_embeddings.py
  (test_whole_null_prefix_seed_raises_loudly). ``kmeans_lloyd`` is
  NOT under this rule: it seeds from the already-indexable-filtered
  corpus, so any non-indexable seed (whole- or element-NULL) drops
  silently on both sides -- its looser, documented contract.

**Width contract (r10 ragged probe).** The family additionally
assumes UNIFORM vector width: parquet list columns are not
fixed-width, and a ragged corpus (writer bug, schema drift) is
measured UB here -- Spark's ``zip_with`` NULL-pads the shorter side
and null-propagates the dot product while the SQL oracle's dims join
silently computes partial dot products over shared indices, and the
PQ LUT build dies on a truncated codebook seed (tools/nan_probe.py
--mode ragged: 1/11 parity, 6 silent, 4 loud). Feed corpora that are
not contractually fixed-width through
``curation.quarantine_vector_width`` first; the gate's clean side
restores oracle parity (pinned in tests/test_nonfinite_embeddings.py).
"""

from __future__ import annotations

import hashlib
import json
import math

from pyspark.sql import Column, DataFrame, Row
from pyspark.sql import functions as F
from pyspark.sql.types import DataType
from pyspark.sql.window import Window as W

# a driver-collected (cid, c_emb) codebook: (cid type, rows) -- see
# _collect_codebook; accepted anywhere a codebook DataFrame is, so
# multi-folding query builds pay ONE collect job
Codebook = tuple[DataType, list[Row]]

N_PLANES = 8
PLANE_MOD = 2001  # w = (hv % 2001 - 1000) / 1000  in [-1, 1]


def plane_weight(p: int, i: int) -> float:
    """Deterministic pseudo-random hyperplane weight (md5-derived).

    Mirrored exactly by the DuckDB oracle (strpos-Horner over md5 hex).
    """
    hv = int(hashlib.md5(f"{p}_{i}".encode()).hexdigest()[:8], 16)
    return (hv % PLANE_MOD - (PLANE_MOD - 1) // 2) / 1000.0


def _const_matrix(rows: list[list[float | None]]) -> Column:
    """A small K x dim matrix as ONE constant ``array<array<double>>``.

    Folding a codebook element-by-element (``F.array(*[F.lit(x) ...])``
    per centroid) costs K*dim py4j round-trips of pure DRIVER time --
    at production embedding widths that dwarfs the query itself (dim
    1536, K=16: ~14 s to build the assign expression vs 0.25 s to run
    it; measured r8). Shipping the matrix as a single JSON literal is
    one round-trip, and Catalyst's ConstantFolding evaluates the
    foldable ``from_json`` (and any ``F.get(mat, i)`` over it) at
    optimization time, so the optimized plan carries the same folded
    array literals as before -- value- and plan-equivalent, minus the
    driver tax. The double roundtrip is exact: ``json.dumps`` emits
    shortest-repr, Spark parses with ``Double.parseDouble``.

    NaN/Infinity are not JSON; such matrices (never produced by the
    finite-mean codebook trainers) fall back to per-literal folding.
    """
    vals = [[None if v is None else float(v) for v in r] for r in rows]
    if any(v is not None and not math.isfinite(v) for r in vals for v in r):
        return F.array(*[F.array(*[F.lit(v) for v in r]).cast("array<double>") for r in vals])
    return F.from_json(F.lit(json.dumps(vals)), "array<array<double>>")


def indexable(vec_col: Column | str) -> Column:
    """True iff the vector can participate in the ANN index: non-NULL
    and free of NULL ELEMENTS (see module docstring). ``forall`` is a
    codegen'd single pass over the array -- negligible next to the dot
    products that follow, and evaluated at the scan so non-indexable
    rows never reach a join or window."""
    vec = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    return vec.isNotNull() & F.forall(vec, lambda x: x.isNotNull())


def _dot(a: Column | str, b: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )


def cosine_topk_bruteforce(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_pred: Column | None = None,
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    query_pred selects the query subset (default vec_id < 10). The
    query side is broadcast, so the corpus is scanned exactly once
    with no shuffle -- the right plan when |queries| << |corpus|.
    """
    query_pred = query_pred if query_pred is not None else (F.col(id_col) < 10)
    # non-indexable vectors (NULL, or NULL elements) can neither query
    # nor be retrieved: without the filters their NULL cosines would
    # still occupy ranked output rows (and an element-NULL vector's dot
    # product null-propagates where SQL SUM would skip -- divergent)
    # norms are computed ONCE PER ROW on each join input (r16): the
    # former per-pair sim expression re-folded both 64-element norm
    # aggregates for every candidate pair -- 3 array folds per pair
    # where 1 suffices. Same fold on the same vector value, so the
    # double (and the rounded cosine) is bit-identical; per-pair work
    # drops to the dot product alone, and the saving grows with pair
    # fan-out (|queries| x |corpus| here).
    q = emb.filter(query_pred & indexable(vec_col)).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_emb"),
        _norm(vec_col).alias("_q_nrm"),
    )
    c = emb.filter(indexable(vec_col)).select(
        F.col(id_col).alias("cand_id"),
        F.col(vec_col).alias("c_emb"),
        _norm(vec_col).alias("_c_nrm"),
    )
    sim = F.round(_dot("q_emb", "c_emb") / (F.col("_q_nrm") * F.col("_c_nrm")), 6)
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("cand_id"))
    return (
        c.join(F.broadcast(q), F.col("query_id") != F.col("cand_id"))
        .select("query_id", "cand_id", sim.alias("cosine"))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def hyperplane_bucket(
    vec_col: Column | str, dim: int, n_planes: int = N_PLANES, plane_offset: int = 0
) -> Column:
    """LSH bucket signature: concatenated sign bits of `n_planes`
    deterministic hyperplane projections ('10110101'-style string).

    ``plane_offset`` selects which planes: indices [offset, offset +
    n_planes). plane_weight(p, i) is keyed by the absolute plane index
    p, so disjoint offsets yield INDEPENDENT plane sets -- the banding
    primitive for dedup.embedding_lsh_candidate_pairs (offset 0 =
    the historical planes, plan-neutral for existing callers)."""
    vec = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    mat = _const_matrix(
        [
            [plane_weight(p, i) for i in range(1, dim + 1)]
            for p in range(plane_offset, plane_offset + n_planes)
        ]
    )
    bits = []
    for p in range(n_planes):
        plane = F.get(mat, p)  # constant-folds to the per-plane literal
        proj = F.aggregate(
            F.zip_with(vec, plane, lambda x, w_: x.cast("double") * w_),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(proj > 0, "1").otherwise("0"))
    return F.concat(*bits)


def _sqdist(a: Column | str, b: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x.cast("double") - y.cast("double")) ** 2),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def assign_ivf_clusters(
    emb: DataFrame,
    centroids: DataFrame | Codebook,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF coarse quantization: assign every vector to its nearest
    centroid -> (id, v, cluster). Distances are rounded to 6 decimals
    before the argmin so assignment is engine-stable; distance ties
    break to the smaller centroid id (struct ordering), matching the
    oracle's row_number(ORDER BY dist, cid).

    centroids: (cid, c_emb). Production derives them with k-means
    (spark.ml KMeans); for deterministic oracle-checked runs the caller
    may pass any fixed set (e.g. the first n corpus vectors).

    ENTIRELY NARROW (r7 rework): the codebook is bounded by definition
    (K centroids), so it is collected once and folded into the
    expression tree as literals -- argmin is array_min over K structs
    per row, the pq_encode pattern. The previous formulation
    (broadcast join x K + row_number window) shuffled the corpus
    VECTORS on the window's partitionBy(id) exchange -- K copies of
    every embedding over the network, the exact scale-killer this
    operator exists to avoid at 100 TB. Now the corpus is scanned once
    with zero exchanges from vectors to assignments.
    """
    e = emb.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    # F.get (0-based) returns NULL past the end, where ANSI element_at
    # raises -- the empty-codebook degenerate branch yields an empty
    # probe array, and a NULL cluster correctly matches no join key.
    # A non-indexable vector (NULL, or NULL elements) likewise gets a
    # NULL cluster (its distances are NULL or null-propagated; letting
    # null-ordering pick an arbitrary centroid would silently index
    # unindexable rows).
    best = F.when(
        indexable(F.col("v")), F.get(_nearest_clusters("v", centroids, 1), 0)
    )
    return e.select("id", "v", best.alias("cluster"))


def _collect_codebook(centroids: DataFrame) -> Codebook:
    """One bounded driver collect of the (cid, c_emb) codebook, for
    query builds that fold it into more than one expression (assign +
    probe): collect once, fold twice -- one Spark job per build, not
    two (ADVICE r7). A centroid with a non-indexable vector (NULL, or
    NULL elements) is meaningless -- it cannot be folded into a finite
    distance expression -- and is dropped; the oracle's dims CTE drops
    the same vectors, so both engines see the same codebook."""
    return (
        centroids.schema["cid"].dataType,
        centroids.filter(indexable("c_emb")).select("cid", "c_emb").collect(),
    )


def _nearest_clusters(
    vec_col: Column | str, centroids: DataFrame | Codebook, n: int
) -> Column:
    """ARRAY of the ``n`` nearest centroid ids for a vector column,
    ordered by (rounded squared distance, cid) -- the narrow probe
    primitive shared by the IVF query paths. The bounded codebook is
    collected once and folded into the expression as literals;
    slice(array_sort(structs)) reproduces the row_number(ORDER BY
    dist, cid) <= n cut without any exchange.

    ``centroids`` is either the codebook DataFrame or the result of
    :func:`_collect_codebook` when the caller shares one collect
    across several foldings."""
    if isinstance(centroids, DataFrame):
        centroids = _collect_codebook(centroids)
    cid_type, rows = centroids
    if not rows:
        # Degenerate (empty) codebook -- an empty corpus under the
        # prefix-seed convention, or a k-means fit over zero vectors.
        # F.array() with no elements is typed VOID and crashes any
        # downstream field extraction, so return a correctly-typed
        # empty id array instead: element_at(.., 1) then yields NULL
        # (assign joins match nothing) and explode yields no probe
        # rows -- every IVF/k-means consumer degrades to empty output.
        return F.array().cast(f"array<{cid_type.simpleString()}>")
    mat = _const_matrix([list(r["c_emb"]) for r in rows])
    cands = F.array(
        *[
            F.struct(
                # F.get(mat, idx) constant-folds to the centroid literal
                F.round(_sqdist(vec_col, F.get(mat, idx)), 6).alias("dist"),
                F.lit(r["cid"]).cast(cid_type).alias("cid"),
            )
            for idx, r in enumerate(rows)
        ]
    )
    return F.transform(F.slice(F.array_sort(cands), 1, n), lambda s: s["cid"])


def kmeans_centroids(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    seed: int = 7,
    max_iter: int = 20,
) -> DataFrame:
    """Production coarse quantizer: spark.ml KMeans fit -> (cid, c_emb).

    KMeans is the right IVF codebook -- centroids track the corpus
    density so inverted lists are balanced and nprobe recall is
    meaningful (a recall@k pytest checks this against brute force).
    The fit is distributed; the k centers themselves are tiny by
    definition and come back to the driver only to be re-broadcast.
    Not engine-reproducible (iterative, init-dependent), so the
    oracle-checked registry query uses the deterministic prefix
    centroids instead.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = emb.select(
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features")
    )
    model = KMeans(k=k, seed=seed, maxIter=max_iter).fit(feats)
    rows = [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())]
    return emb.sparkSession.createDataFrame(rows, "cid int, c_emb array<double>")


def kmeans_lloyd(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 4,
    n_iter: int = 3,
) -> DataFrame:
    """Deterministic distributed Lloyd's k-means -> final assignment
    ``(id, cluster)`` after exactly ``n_iter`` assignment rounds.

    The iterative-algorithm shape done Spark-first: each round is one
    broadcast join against the (tiny) centroid table for the argmin
    assignment plus one narrow-row shuffle of (cluster, dim_index,
    value) triples for the element-wise mean -- the corpus vectors
    themselves never shuffle. Rounds are FIXED (no convergence test)
    and every engine-unstable boundary is rounded (squared distances
    and centroid means to 6 decimals), with centroid-id tiebreaks on
    equal distance -- so the DuckDB oracle replays the exact same
    trajectory by unrolling the iterations as CTEs. Production tuning
    (kmeans|| init, convergence deltas) lives in spark.ml KMeans
    (:func:`kmeans_centroids`); THIS path is the oracle-checkable one,
    and at 100 TB its per-round cost is a broadcast join + a k*dim
    aggregate, both linear.

    A cluster that loses all members simply drops out of the centroid
    table (same semantics in the SQL replay). Non-indexable vectors
    (NULL, or NULL elements) receive NO assignment row -- they are
    outside the index, exactly as the oracle's dims CTE never explodes
    them; a non-indexable seed (id < k) just drops out of the initial
    codebook on both sides.
    """
    e = emb.filter(indexable(vec_col)).select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v")
    )
    cent = e.filter(F.col("id") < k).select(
        F.col("id").cast("int").alias("cid"), F.col("v").alias("c_emb")
    )
    assigned = assign_ivf_clusters(e, cent, "id", "v")
    for _ in range(n_iter - 1):
        cent = (
            assigned.select("cluster", F.posexplode("v").alias("i", "x"))
            .groupBy("cluster", "i")
            .agg(F.round(F.avg("x"), 6).alias("m"))
            .groupBy("cluster")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("i", "m"))), lambda s: s["m"]
                ).alias("c_emb")
            )
            .select(F.col("cluster").cast("int").alias("cid"), "c_emb")
        )
        assigned = assign_ivf_clusters(e, cent, "id", "v")
    return assigned.select("id", F.col("cluster").cast("long").alias("cluster"))


def cosine_topk_ivf(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 8,
    nprobe: int = 2,
    k: int = 3,
    query_pred: Column | None = None,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF-style ANN: coarse-quantize the corpus into inverted lists
    (cluster -> vectors); each query probes only its `nprobe` nearest
    lists. At 100 TB the inverted lists are a partitioned table and a
    probe is an equi-join on cluster id touching |corpus| * nprobe / K
    vectors -- the classic IVF trade of recall for fan-in.

    `centroids` (cid, c_emb) selects the codebook: pass
    ``kmeans_centroids(emb)`` for the production path (recall-checked
    in tests); the default -- the first `n_centroids` corpus vectors --
    is deterministic and oracle-reproducible, for the correctness gate.
    """
    query_pred = query_pred if query_pred is not None else (
        (F.col(id_col) >= 10) & (F.col(id_col) < 20)
    )
    if centroids is None:
        centroids = emb.filter(F.col(id_col) < n_centroids).select(
            F.col(id_col).alias("cid"), F.col(vec_col).alias("c_emb")
        )
    codebook = _collect_codebook(centroids)
    assigned = assign_ivf_clusters(emb, codebook, id_col, vec_col)

    # queries probe their nprobe nearest centroids -- NARROW (r7): the
    # codebook folds into the expression as literals and the top-nprobe
    # cut is slice(array_sort(structs)) per row (same (dist, cid)
    # ordering as the former row_number window, without the window's
    # exchange that shuffled query VECTORS). Probe rows then carry
    # (query_id, q_emb, cluster) into the cluster join, where AQE
    # broadcasts the small probe side -- the corpus never shuffles.
    # Non-indexable query vectors are excluded: their all-NULL probe
    # distances sort FIRST in struct ordering, so without the filter
    # they would probe arbitrary lists and emit NULL-cosine ranked rows.
    # per-ROW norms before the probe explode / cluster join (r16): the
    # per-pair form re-folded both norms for every candidate pair
    # (see cosine_topk_bruteforce) -- bit-identical, strictly less work
    q = emb.filter(query_pred & indexable(vec_col)).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_emb"),
        _norm(vec_col).alias("_q_nrm"),
    )
    probes = q.select(
        "query_id", "q_emb", "_q_nrm",
        _nearest_clusters("q_emb", codebook, nprobe).alias("cluster"),
    ).withColumn("cluster", F.explode("cluster"))

    cand = probes.join(
        assigned.select(
            F.col("id").alias("cand_id"),
            F.col("v").alias("c_emb2"),
            _norm("v").alias("_c_nrm"),
            "cluster",
        ),
        "cluster",
    ).filter(F.col("query_id") != F.col("cand_id"))
    sim = F.round(_dot("q_emb", "c_emb2") / (F.col("_q_nrm") * F.col("_c_nrm")), 6)
    wr = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("cand_id"))
    return (
        cand.select("query_id", "cand_id", sim.alias("cosine"))
        .withColumn("rank", F.row_number().over(wr).cast("long"))
        .filter(F.col("rank") <= k)
    )


def cosine_topk_lsh(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    query_pred: Column | None = None,
    k: int = 3,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket.

    The bucket equi-join replaces the cross join -- at 100 TB this is
    a plain shuffled hash join on the signature string, with per-bucket
    fan-in ~ corpus/256 per band.
    """
    query_pred = query_pred if query_pred is not None else (F.col(id_col) < 50)
    # non-indexable vectors must not be bucketed at all: a NULL (or
    # null-propagated) projection falls through when(proj > 0)'s
    # otherwise-branch to bit '0', silently colliding corrupt vectors
    # into the all-zeros bucket while the oracle's dims CTE drops them
    # per-ROW norm computed alongside the bucket signature (r16): the
    # per-pair form re-folded both norms for every in-bucket pair
    # (see cosine_topk_bruteforce) -- bit-identical, strictly less work
    bucketed = emb.filter(indexable(vec_col)).select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        _norm(vec_col).alias("_nrm"),
        hyperplane_bucket(vec_col, dim).alias("bucket"),
    )
    q = bucketed.filter(query_pred).select(
        F.col("id").alias("query_id"),
        F.col("v").alias("q_emb"),
        F.col("_nrm").alias("_q_nrm"),
        "bucket",
    )
    c = bucketed.select(
        F.col("id").alias("cand_id"),
        F.col("v").alias("c_emb"),
        F.col("_nrm").alias("_c_nrm"),
        "bucket",
    )
    sim = F.round(_dot("q_emb", "c_emb") / (F.col("_q_nrm") * F.col("_c_nrm")), 6)
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("cand_id"))
    return (
        q.join(c, "bucket")
        .filter(F.col("query_id") != F.col("cand_id"))
        .select("query_id", "cand_id", sim.alias("cosine"))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def _prefix_vectors(
    emb: DataFrame, id_col: str, vec_col: str, n: int
) -> tuple[dict[int, list[float]], set[int]]:
    """({id: vector}, corrupt_ids) for the first ``n`` ids -- the one
    driver collect shared by the PQ encode codebook and the ADC query
    set. Rows with an ELEMENT-NULL vector (the r9 elemnull probe's
    TypeError site was float(None) here) are skipped from the dict but
    their ids are returned as ``corrupt``, so callers can tell a
    corrupt-but-present seed (drop it, like the oracle's dims
    exclusion) from an id absent from the corpus (a configuration
    error that must raise loudly). A WHOLE-NULL vector is filtered out
    BEFORE the collect (``isNotNull``), so its id lands in neither set
    and callers treat it exactly like an absent id: the loud raise.
    That prefilter is deliberate and load-bearing -- see the module
    docstring's prefix-seed contract (ADVICE r10) -- do not "fix" it
    by classifying whole-NULL into ``corrupt`` without reworking the
    all-NULL degenerate branches in pq_encode/ivf_pq_adc_topk/
    ivf_pq_rerank_topk, whose empty-corpus guards rely on an all-NULL
    corpus producing (empty dict, empty corrupt set)."""
    rows = (
        emb.filter((F.col(id_col) < n) & F.col(vec_col).isNotNull())
        .select(id_col, vec_col, indexable(vec_col).alias("_ok"))
        .orderBy(id_col)
        .collect()
    )
    good = {r[id_col]: [float(v) for v in r[vec_col]] for r in rows if r["_ok"]}
    corrupt = {r[id_col] for r in rows if not r["_ok"]}
    return good, corrupt


def _empty_encode(emb: DataFrame, id_col: str) -> DataFrame:
    """Zero-row (id, sub, code, dist) frame -- pq_encode's output schema
    with the id type taken from the source column."""
    return emb.limit(0).select(
        F.col(id_col).alias("id"),
        F.lit(0).cast("long").alias("sub"),
        F.lit(0).cast("long").alias("code"),
        F.lit(0.0).alias("dist"),
    )


def _empty_topk(emb: DataFrame, id_col: str) -> DataFrame:
    """Zero-row (query_id, cand_id, adc_dist, rank) frame -- the ADC
    top-k output schema for the empty-corpus degenerate case."""
    return emb.limit(0).select(
        F.col(id_col).alias("query_id"),
        F.col(id_col).alias("cand_id"),
        F.lit(0.0).alias("adc_dist"),
        F.lit(0).cast("long").alias("rank"),
    )


def pq_encode(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 4,
    k: int = 4,
    dim: int = 64,
    cents: list[list[float]] | None = None,
    cent_ids: list[int] | None = None,
) -> DataFrame:
    """Product-quantization encode: (id, sub, code, dist) long form.

    The vector splits into ``m`` contiguous subspaces of dim/m dims;
    each subvector is assigned to its nearest of ``k`` per-subspace
    centroids (squared L2, rounded to 6 dp BEFORE argmin for
    engine-stable assignment -- the IVF convention; ties break to the
    smaller centroid id via struct ordering). Centroids are the
    prefix-seed codebook: slices of the first ``k`` corpus vectors,
    broadcast into the expression tree as literals -- so the encode is
    entirely NARROW (zero shuffles): one codegen'd projection over the
    corpus, which is what makes PQ the memory-compression layer of a
    100 TB ANN index (64 floats -> m small codes). Production swaps
    the prefix codebook for per-subspace k-means fits; the plan shape
    is identical.
    """
    dsub = dim // m
    if cents is None:
        # collect the prefix codebook from the not-yet-indexable-
        # filtered corpus so an ELEMENT-NULL seed is classified corrupt
        # (dropped, id preserved), not missing (loud raise); a
        # WHOLE-NULL seed intentionally stays on the loud-raise path --
        # see _prefix_vectors / module docstring (ADVICE r10)
        pv, corrupt = _prefix_vectors(emb, id_col, vec_col, k)
    # a non-indexable vector (NULL, or NULL elements) has no finite
    # subvectors to quantize: excluded from the index (the same
    # contract as assign_ivf_clusters' NULL cluster)
    emb = emb.filter(indexable(vec_col))
    if cents is None:
        if not pv and not corrupt and emb.isEmpty():
            # empty corpus under the prefix-seed convention: nothing to
            # encode and no codebook to encode against -- the degenerate
            # slice a backfill hits constantly at scale. Empty result
            # with the documented schema (id keeps the source id type).
            # The guard is "no INDEXABLE vector exists at all" -- a
            # corpus that has indexable vectors but none below id k is
            # a configuration error and falls through to the loud raise.
            return _empty_encode(emb, id_col)
        missing = [i for i in range(k) if i not in pv and i not in corrupt]
        if missing:
            # an id ABSENT from the corpus -- or present with a
            # WHOLE-NULL vector, which the prefix collect deliberately
            # conflates with absent (module docstring) -- is a real
            # configuration error (non-0-based id space / ungated
            # corpus): refuse loudly rather than encode against a
            # silently smaller codebook. A seed that exists but is
            # ELEMENT-NULL was dropped above -- the oracle's dims CTE
            # drops it identically, so both engines encode against the
            # same reduced codebook with surviving ORIGINAL ids as
            # codes.
            raise ValueError(f"need {k} seed vectors, found {len(pv)}")
        if not pv:
            # EVERY prefix seed exists but is corrupt: there is no
            # codebook at all, and an empty cents list downstream would
            # build a zero-struct (VOID-typed) candidate array. Data
            # loss this total is a loud error, not an empty encode
            # (review r10 finding #1).
            raise ValueError(
                f"all {k} prefix codebook seed vectors are non-indexable "
                "(NULL or NULL-element); cannot build a PQ codebook"
            )
        cents = [pv[i] for i in sorted(pv)]
        cent_ids = sorted(pv)
    elif len(cents) != k:
        # an explicitly passed partial codebook is a caller bug
        raise ValueError(f"need {k} seed vectors, found {len(cents)}")
    if cent_ids is None:
        cent_ids = list(range(len(cents)))

    # ONE folded matrix PER SUBSPACE (kc x dsub), not one full kc x dim
    # matrix: ConstantFolding evaluates from_json once per REFERENCE,
    # and sub_dist references the codebook m*kc times -- against the
    # full matrix that re-parses the whole K*dim JSON per reference
    # (m=64, kc=32, dim=1536: 2048 parses of a 1.2 MB literal =
    # optimizer-side OOM, measured r8). Per-subspace folding keeps
    # each reference's parse at kc*dsub.
    smats = [
        _const_matrix([list(c[j * dsub : (j + 1) * dsub]) for c in cents])
        for j in range(m)
    ]

    def sub_dist(sl: Column, c: int, j: int) -> Column:
        # get(smats[j], c) constant-folds to the subspace literal
        carr = F.get(smats[j], c)
        return F.round(
            F.aggregate(
                F.zip_with(
                    sl, carr, lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ),
            6,
        )

    subs = []
    for j in range(m):
        sl = F.slice(vec_col, j * dsub + 1, dsub)
        cands = F.array(
            *[
                F.struct(
                    sub_dist(sl, c, j).alias("dist"),
                    # the code is the centroid's ORIGINAL id (= position
                    # for trained codebooks; = surviving prefix vec_id
                    # when a corrupt seed was dropped) -- the oracle's
                    # cdims carries vec_id as cid, so codes must too
                    F.lit(cent_ids[c]).cast("long").alias("cid"),
                )
                for c in range(len(cents))
            ]
        )
        best = F.array_min(cands)
        subs.append(
            F.struct(
                F.lit(j).cast("long").alias("sub"),
                best["cid"].alias("code"),
                best["dist"].alias("dist"),
            )
        )
    return emb.select(
        F.col(id_col).alias("id"), F.explode(F.array(*subs)).alias("b")
    ).select("id", "b.sub", "b.code", "b.dist")


def _adc_lut(
    spark,
    vecs: dict[int, list[float]],
    cents: list[list[float]],
    m: int,
    dsub: int,
    query_lo: int,
    query_hi: int,
    cent_ids: list[int] | None = None,
) -> DataFrame:
    """ADC lookup table (query_id, sub, code, d) for queries with
    query_lo <= id < query_hi. ``cent_ids`` maps codebook position to
    the code value pq_encode emitted (original prefix vec_ids when a
    corrupt seed was dropped; positional otherwise).

    Raw doubles are built with the engines' exact fold order (per-term
    squares summed left-to-right), so they match bit-for-bit; the 6-dp
    fence is applied as a SPARK round (SQL half-away-from-zero), never
    Python round() (banker's half-to-even) -- the cross-engine rounding
    convention shared by the encode path and the oracles."""
    if cent_ids is None:
        cent_ids = list(range(len(cents)))
    rows = []
    for qid, qv in vecs.items():
        if not (query_lo <= qid < query_hi):
            continue
        for j in range(m):
            for c in range(len(cents)):
                d = sum(
                    (qv[j * dsub + t] - cents[c][j * dsub + t]) ** 2
                    for t in range(dsub)
                )
                rows.append((qid, j, cent_ids[c], d))
    return spark.createDataFrame(
        rows, "query_id BIGINT, sub BIGINT, code BIGINT, d DOUBLE"
    ).select("query_id", "sub", "code", F.round("d", 6).alias("d"))


def pq_adc_topk(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 4,
    kc: int = 4,
    dim: int = 64,
    n_queries: int = 10,
    k: int = 5,
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k search over PQ codes.

    The query path of a product-quantized ANN index: per query, a tiny
    lookup table d[sub][code] of exact squared distances from the
    query's subvectors to every subspace centroid; a candidate's
    approximate distance is then just m table lookups + adds over its
    CODES -- the raw vectors are never touched at query time. That is
    the point at 100 TB: the corpus-side state is m small ints per
    vector (the pq_encode output, built narrowly), the LUT is
    |queries| x m x kc rows broadcast to every executor, and the scan
    is one codegen'd join + sum. Distances are rounded at 6 dp (the
    repo ANN convention); ranking ties break by candidate id.
    """
    dsub = dim // m
    # ONE driver collect covers both the codebook prefix and the query
    # set; the codebook is handed to pq_encode so it is not re-collected
    vecs, corrupt = _prefix_vectors(emb, id_col, vec_col, max(kc, n_queries))
    if not vecs and not corrupt and emb.filter(indexable(vec_col)).isEmpty():
        # empty corpus: no codebook, no queries -- empty top-k, not a
        # crash (the schema-stable degenerate branch; isEmpty keeps a
        # non-0-based id space falling through to the loud raise)
        return _empty_topk(emb, id_col)
    missing = [i for i in range(kc) if i not in vecs and i not in corrupt]
    if missing:
        raise ValueError(f"prefix codebook ids missing: {missing}")
    # a corrupt (non-indexable) seed is dropped from the codebook with
    # its ORIGINAL id kept as the code -- mirroring the oracle, whose
    # dims CTE never sees the corrupt vector (module docstring)
    cent_ids = [i for i in range(kc) if i in vecs]
    if not cent_ids:
        raise ValueError(
            f"all {kc} prefix codebook seed vectors are non-indexable "
            "(NULL or NULL-element); cannot build a PQ codebook"
        )
    cents = [vecs[i] for i in cent_ids]
    codes = pq_encode(
        emb, id_col, vec_col, m=m, k=len(cents), dim=dim,
        cents=cents, cent_ids=cent_ids,
    )
    lut = _adc_lut(
        emb.sparkSession, vecs, cents, m, dsub, 0, n_queries, cent_ids
    )
    adc = (
        codes.join(F.broadcast(lut), ["sub", "code"])
        .filter(F.col("query_id") != F.col("id"))
        .groupBy("query_id", F.col("id").alias("cand_id"))
        .agg(F.round(F.sum("d"), 6).alias("adc_dist"))
    )
    w = W.partitionBy("query_id").orderBy("adc_dist", "cand_id")
    return adc.withColumn("rank", F.row_number().over(w).cast("long")).filter(
        F.col("rank") <= k
    )


#: Embedding width above which plain ADC ranking is a recall trap
#: (see ivf_pq_adc_topk's wide-dim warning).
ADC_SAFE_DIM = 256


def ivf_pq_adc_topk(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 8,
    nprobe: int = 2,
    m: int = 4,
    kc: int = 4,
    dim: int = 64,
    query_lo: int = 10,
    query_hi: int = 20,
    k: int = 5,
    centroids: DataFrame | None = None,
    cents: list[list[float]] | None = None,
    warn_wide_dim: bool = True,
) -> DataFrame:
    """IVF-PQ composed ANN search: coarse probe -> ADC rank within the
    probed inverted lists only -- the production query shape of a
    100 TB vector index (FAISS's IVFADC layout, done relationally).

    **Wide-dim recall warning.** ADC distances rank CLUSTERS, not
    neighbors within a cluster: once same-cluster candidates quantize
    to similar codes, their ADC distances tie and the id tie-break is
    arbitrary. At production embedding widths this collapses recall
    however large ``m`` gets (measured, tools/ann_production_eval.py):

    ========  ====  =========  ======================================
    dim       m     recall@5   remedy
    ========  ====  =========  ======================================
    64 (gate) 4     0.98+      plain ADC fine (codes resolve corpus)
    768       4-64  0.02-0.04  ivf_pq_rerank_topk, shortlist >= tie
    1536      4-64  0.02-0.04  width (~corpus/n_centroids; m=16 +
                               shortlist 250 measured recall 1.000)
    ========  ====  =========  ======================================

    A call at ``dim >= ADC_SAFE_DIM`` without the re-rank therefore
    emits a RuntimeWarning pointing at :func:`ivf_pq_rerank_topk`
    (which sets ``warn_wide_dim=False`` on its internal shortlist
    call); results are unchanged -- the plan at any gate-checked
    configuration is byte-identical.

    ``centroids`` (cid, c_emb) overrides the IVF coarse codebook and
    ``cents`` the PQ codebook -- pass spark.ml KMeans fits for the
    production path; the deterministic prefix defaults keep the
    registry query oracle-reproducible.

    The two halves that exist separately as ``cosine_topk_ivf`` and
    ``pq_adc_topk`` compose here the way a deployed index runs them:

    - the corpus is coarse-quantized once into inverted lists
      (``assign_ivf_clusters``; prefix centroids for oracle
      determinism, spark.ml KMeans in production);
    - corpus vectors are PQ-encoded once into m codes each
      (``pq_encode`` -- narrow, zero-shuffle, codebook as literals);
    - a query probes its ``nprobe`` nearest lists (broadcast centroid
      table), and ranks ONLY those lists' members by ADC distance --
      m broadcast-LUT lookups + adds over the codes. Per query the
      scan touches ~|corpus| * nprobe / n_centroids CODE rows (ints),
      never a raw vector and never the full corpus: the memory story
      of PQ under the fan-in story of IVF.

    Determinism fences match both parents: squared distances rounded
    at 6 dp before every argmin/rank, centroid/candidate-id
    tiebreaks, LUT rounding pushed into a Spark expression (SQL
    half-away-from-zero semantics).
    """
    if warn_wide_dim and dim >= ADC_SAFE_DIM:
        import warnings

        warnings.warn(
            f"ivf_pq_adc_topk at dim {dim}: plain ADC distances tie within "
            f"clusters at production embedding widths (measured recall@5 "
            f"0.02-0.04 at dim 768/1536 for any m) -- use ivf_pq_rerank_topk "
            f"with shortlist >= the expected ADC tie width "
            f"(~corpus/n_centroids; m=16 + shortlist 250 measured recall "
            f"1.000, see tools/ann_production_eval.py).",
            RuntimeWarning,
            stacklevel=2,
        )
    # one bounded driver collect covers the PQ codebook (ids < kc) and
    # the query vectors (ids in [query_lo, query_hi))
    vecs, corrupt = _prefix_vectors(emb, id_col, vec_col, max(kc, query_hi))
    if cents is None:
        if not vecs and not corrupt and emb.filter(indexable(vec_col)).isEmpty():
            # empty corpus: degrade to an empty, schema-stable top-k
            # (isEmpty keeps a non-0-based id space raising loudly)
            return _empty_topk(emb, id_col)
        missing = [i for i in range(kc) if i not in vecs and i not in corrupt]
        if missing:
            raise ValueError(f"prefix codebook ids missing: {missing}")
        # corrupt prefix seeds drop out with original ids kept as codes
        # (both engines see the same reduced codebook -- module docstring)
        cent_ids = [i for i in range(kc) if i in vecs]
        if not cent_ids:
            raise ValueError(
                f"all {kc} prefix codebook seed vectors are non-indexable "
                "(NULL or NULL-element); cannot build a PQ codebook"
            )
        cents = [vecs[i] for i in cent_ids]
    else:
        if len(cents) != kc:
            raise ValueError(f"need {kc} PQ codebook vectors, found {len(cents)}")
        cent_ids = list(range(kc))
    codes = pq_encode(
        emb, id_col, vec_col, m=m, k=len(cents), dim=dim,
        cents=cents, cent_ids=cent_ids,
    )

    if centroids is None:
        centroids = emb.filter(F.col(id_col) < n_centroids).select(
            F.col(id_col).alias("cid"), F.col(vec_col).alias("c_emb")
        )
    codebook = _collect_codebook(centroids)
    assigned = assign_ivf_clusters(emb, codebook, id_col, vec_col).select(
        "id", "cluster"
    )

    # narrow probe: top-nprobe centroids per query via
    # slice(array_sort(structs)) over the literal-folded codebook --
    # no window exchange, no query vector ever shuffles (ADC needs
    # only the LUT downstream, so probes carry bare (query_id, cluster))
    q = emb.filter(
        (F.col(id_col) >= query_lo)
        & (F.col(id_col) < query_hi)
        & indexable(vec_col)  # non-indexable queries: no LUT, no probes
    ).select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_emb"))
    probes = q.select(
        "query_id", _nearest_clusters("q_emb", codebook, nprobe).alias("cluster")
    ).withColumn("cluster", F.explode("cluster"))

    dsub = dim // m
    lut = _adc_lut(
        emb.sparkSession, vecs, cents, m, dsub, query_lo, query_hi, cent_ids
    )

    # candidates = members of the probed lists only (each corpus vector
    # sits in exactly one list, so (query, cand) is already unique)
    cand = probes.join(assigned, "cluster").filter(
        F.col("query_id") != F.col("id")
    ).select("query_id", F.col("id").alias("cand_id"))
    adc = (
        cand.join(codes.withColumnRenamed("id", "cand_id"), "cand_id")
        .join(F.broadcast(lut), ["query_id", "sub", "code"])
        .groupBy("query_id", "cand_id")
        .agg(F.round(F.sum("d"), 6).alias("adc_dist"))
    )
    wr = W.partitionBy("query_id").orderBy("adc_dist", "cand_id")
    return adc.withColumn("rank", F.row_number().over(wr).cast("long")).filter(
        F.col("rank") <= k
    )


def pq_train_codebook(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 4,
    kc: int = 16,
    dim: int = 64,
    seed: int = 7,
    max_iter: int = 20,
) -> list[list[float]]:
    """Production PQ codebook: per-SUBSPACE k-means (the real PQ
    training step) -> ``kc`` full-dim vectors whose j-th slice is
    subspace j's c-th centroid.

    Proper product quantization clusters each dim/m-dim slice
    INDEPENDENTLY -- slices of full-vector centroids (or the prefix
    seeds the oracle-deterministic registry config uses) share one
    global structure across subspaces and quantize far worse: measured
    on the embeddings fixture, recall@5 vs brute force goes 0.08 ->
    0.36 (m=8, kc=32) when the codebook is trained this way. The
    return shape is 'virtual full vectors' so pq_encode / pq_adc_topk /
    ivf_pq_adc_topk consume it via their existing ``cents`` parameter
    (they slice per subspace internally) with no signature change.

    The m fits are spark.ml KMeans over sliced projections --
    distributed, one pass per subspace; the codebook itself is tiny
    (m * kc * dsub floats) and returns to the driver only to be folded
    back into expression literals. Not engine-reproducible (iterative,
    init-dependent), so oracle-checked registry queries keep the
    prefix codebook; THIS is the quality path a deployment trains.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    dsub = dim // m
    books = []
    for j in range(m):
        feats = emb.select(
            array_to_vector(
                F.slice(F.col(vec_col).cast("array<double>"), j * dsub + 1, dsub)
            ).alias("features")
        )
        model = KMeans(k=kc, seed=seed + j, maxIter=max_iter).fit(feats)
        books.append([[float(x) for x in c] for c in model.clusterCenters()])
    return [[x for j in range(m) for x in books[j][c]] for c in range(kc)]


def ivf_pq_rerank_topk(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 8,
    nprobe: int = 2,
    m: int = 4,
    kc: int = 4,
    dim: int = 64,
    query_lo: int = 10,
    query_hi: int = 20,
    shortlist: int = 50,
    k: int = 5,
    centroids: DataFrame | None = None,
    cents: list[list[float]] | None = None,
) -> DataFrame:
    """IVF-PQ search with an EXACT re-rank of the ADC shortlist --
    FAISS's IVFADC+refine, the full production query shape at real
    embedding widths.

    ADC distances rank CLUSTERS, not neighbors-within-a-cluster: once
    candidates quantize to similar codes (same-cluster points differ
    only by noise the codebook never resolves), their ADC distances
    tie and the tie-break is arbitrary -- measured recall@5 of plain
    `ivf_pq_adc_topk` collapses to ~k/cluster_size at dim 768+ however
    large m gets (tools/ann_production_eval.py --dim 768). Deployed
    systems therefore take the ADC top-``shortlist`` and re-score just
    those with exact distances. Per query that touches ``shortlist``
    raw vectors instead of |corpus| -- the memory story of PQ, the
    fan-in story of IVF, and brute-force exactness where it matters.

    Plan shape: the shortlist (|queries| * shortlist id pairs, a few
    KB) broadcasts into joins against the corpus for the candidate and
    query vectors, so raw embeddings are projected at the scan and
    never shuffle; exact cosine is rounded to 6 dp before the final
    rank (the repo ANN convention, candidate-id tie-break).
    """
    adc = ivf_pq_adc_topk(
        emb,
        id_col,
        vec_col,
        n_centroids=n_centroids,
        nprobe=nprobe,
        m=m,
        kc=kc,
        dim=dim,
        query_lo=query_lo,
        query_hi=query_hi,
        k=shortlist,
        centroids=centroids,
        cents=cents,
        warn_wide_dim=False,  # this IS the wide-dim remedy
    ).select("query_id", "cand_id")
    # per-ROW norm on the vector side of the re-rank joins (r16): the
    # per-pair form re-folded both norms per shortlist pair
    # (see cosine_topk_bruteforce) -- bit-identical, strictly less work
    vecs = emb.select(
        F.col(id_col).alias("_vid"),
        F.col(vec_col).alias("_v"),
        _norm(vec_col).alias("_nrm"),
    )
    pairs = (
        F.broadcast(adc)
        .join(
            vecs.withColumnRenamed("_vid", "cand_id")
            .withColumnRenamed("_v", "c_emb")
            .withColumnRenamed("_nrm", "_c_nrm"),
            "cand_id",
        )
        .join(
            vecs.withColumnRenamed("_vid", "query_id")
            .withColumnRenamed("_v", "q_emb")
            .withColumnRenamed("_nrm", "_q_nrm"),
            "query_id",
        )
    )
    sim_col = F.round(_dot("q_emb", "c_emb") / (F.col("_q_nrm") * F.col("_c_nrm")), 6)
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("cand_id"))
    return (
        pairs.select("query_id", "cand_id", sim_col.alias("cosine"))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )
