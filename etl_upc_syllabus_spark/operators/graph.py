"""Distributed PageRank as pure DataFrame ops (iterative-algorithm
surface, alongside k-means in ``similarity`` and connected components
in ``components``).

Deterministic, oracle-replayable formulation: fixed iteration count,
and every engine-divergence point is fenced -- rank updates are rounded
at 12 decimals each round, so double summation order (which differs
between Spark partial aggregation and DuckDB) cannot change the
trajectory. All divisions/products act on identical operands in both
engines and are IEEE-exact.

Scale shape (per round): join ranks into the weighted edge list on the
src key, aggregate contributions by dst -- two hash exchanges whose
payload is (node, double) pairs, never any wider row. At 100 TB the
edge list would be bucketed by src so the per-round join is
exchange-free on the edge side; ranks (one double per node) are the
only moving state. ``localCheckpoint`` truncates lineage per round,
exactly as in connected components (an unbounded iterative plan
otherwise grows exponentially).

Reference scope: none -- the syllabus reference has no graph surface;
this is part of the brief's large-scale-pipeline extension (domain/
entity ranking for corpus curation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DAMPING = 0.85
ROUND_DP = 12  # per-round rounding fence (see module docstring)


def pagerank(
    edges: DataFrame,
    n_iter: int = 3,
    src: str = "src",
    dst: str = "dst",
    damping: float = DAMPING,
) -> DataFrame:
    """Fixed-round PageRank over a directed edge list: (node, pr).

    Assumes no dangling nodes (every node appears as a src) -- true for
    symmetric graphs like co-occurrence; callers with genuinely
    directed graphs should add back-edges or a dangling-mass term.
    ``n_iter`` is deliberately fixed (not convergence-tested) so the
    DuckDB oracle can replay the identical trajectory with unrolled
    CTEs.
    """
    from pyspark import StorageLevel

    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    # contribution weight 1/deg: identical-operand division, exact in
    # both engines. MATERIALIZED once: without this, every round's
    # action re-runs the upstream edge build (e.g. copurchase_edges'
    # self-join + distinct) from scratch -- measured 3x the whole
    # query's cost at sf0.1. persist(MEMORY_AND_DISK), NOT
    # localCheckpoint: the edge list is the big loop invariant
    # (~|edges| rows), and localCheckpoint truncates lineage, so a
    # cache block evicted under memory pressure is unrecoverable --
    # observed as 'Block rdd_N does not exist' executor failures at
    # sf10. persist keeps the lineage for recompute, and DISK_ONLY
    # keeps the big cache out of the unified memory pool entirely --
    # MEMORY_AND_DISK's protected storage half starved the distinct's
    # hash aggregate at sf10 (SparkOutOfMemoryError); one sequential
    # disk read per round is the honest, bounded cost. localCheckpoint remains correct for the
    # SMALL per-round rank vector below, where truncation is the
    # point and the state always fits.
    w = (
        e.join(deg, "src")
        .select("src", "dst", (F.lit(1.0) / F.col("d")).alias("wt"))
        .persist(StorageLevel.DISK_ONLY)
    )
    try:
        nodes = w.select(F.col("src").alias("node")).distinct()
        n = nodes.count()
        if n == 0:
            # empty edge list (an empty date slice at a backfill
            # boundary): zero vertices means zero rank rows, not a
            # 1/n division error -- schema-stable degenerate branch
            return nodes.withColumn("pr", F.lit(0.0))
        base = 1.0 - damping
        pr = nodes.withColumn("pr", F.lit(1.0 / n)).localCheckpoint(eager=True)
        for _ in range(n_iter):
            s = (
                w.join(pr, w.src == pr.node)
                .groupBy(F.col("dst").alias("node"))
                .agg(F.round(F.sum(F.col("pr") * F.col("wt")), ROUND_DP).alias("s"))
            )
            pr = s.select(
                "node",
                F.round(F.lit(base / n) + F.lit(damping) * F.col("s"), ROUND_DP).alias("pr"),
            ).localCheckpoint(eager=True)
        # the final pr is checkpoint-materialized and no longer references
        # w's lineage
        return pr
    finally:
        # release the cached edge copy even if a round fails, so repeated
        # calls in one session never accumulate |E|-sized storage
        w.unpersist()


def copurchase_edges(lineitem: DataFrame) -> DataFrame:
    """Symmetric part co-purchase edges: parts sharing an order.

    Within-order pair expansion is quadratic only in lines-per-order
    (bounded small -- <= 7 in TPC-H-shaped data), so the edge build is
    a single co-partitioned self-join on the order key, linear in the
    fact table at any scale.
    """
    li = lineitem.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk"))
    a, b = li.alias("a"), li.alias("b")
    return (
        a.join(b, (F.col("a.ok") == F.col("b.ok")) & (F.col("a.pk") != F.col("b.pk")))
        .select(F.col("a.pk").alias("src"), F.col("b.pk").alias("dst"))
        .distinct()
    )


def copurchase_und(lineitem: DataFrame) -> DataFrame:
    """Canonical UNDIRECTED co-purchase edges: (a, b) with a < b, distinct.

    The a < b join predicate emits each unordered pair ONCE, so the
    single distinct here replaces copurchase_edges' two-step shape
    (emit both directions, distinct 2x|pairs| rows, then re-canonicalize
    and distinct AGAIN inside _oriented) -- half the self-join output
    and one exchange+aggregate fewer, identical edge set (measured r17:
    2.31 s -> 1.40 s for the und build at sf0.1, 1.196M edges equal).
    Feed it to the triangle family with ``canonical=True``; directed
    consumers (pagerank) keep :func:`copurchase_edges`.
    """
    li = lineitem.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk"))
    a, b = li.alias("a"), li.alias("b")
    return (
        a.join(b, (F.col("a.ok") == F.col("b.ok")) & (F.col("a.pk") < F.col("b.pk")))
        .select(F.col("a.pk").alias("a"), F.col("b.pk").alias("b"))
        .distinct()
    )


def _oriented(edges: DataFrame, canonical: bool = False):
    """(und, deg, oriented) shared by the triangle family.

    und (distinct undirected edges) and the oriented list are persisted
    MEMORY_AND_DISK and materialized eagerly -- see triangle_counts
    docstring for why. ``canonical=True`` asserts the input is already
    (a, b) with a < b and distinct (copurchase_und), skipping the
    re-canonicalization distinct.
    """
    from pyspark import StorageLevel

    if canonical:
        und = edges.select("a", "b").persist(StorageLevel.MEMORY_AND_DISK)
    else:
        und = (
            edges.select(
                F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
            )
            .filter(F.col("a") != F.col("b"))
            .distinct()
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
    und.count()
    deg = (
        und.select(F.col("a").alias("node"))
        .unionAll(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    j = und.join(
        deg.select(F.col("node").alias("a"), F.col("d").alias("da")), "a"
    ).join(deg.select(F.col("node").alias("b"), F.col("d").alias("db")), "b")
    a_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    o = j.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(a_first, F.col("db")).otherwise(F.col("da")).alias("dv"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    o.count()
    return und, deg, o


def triangle_counts(edges: DataFrame, canonical: bool = False) -> DataFrame:
    """Per-node triangle counts -> (node, n_triangles).

    Degree-ordered edge orientation (the MapReduce triangle-counting
    formulation): each undirected edge is oriented from its
    lower-(degree, id) endpoint to the higher one, so every triangle is
    enumerated exactly once from its lowest vertex and -- critically for
    skewed graphs -- wedge fan-out per node is bounded by the node's
    ORIENTED out-degree, O(sqrt(|E|)) even at hub nodes. The naive
    all-wedges join is quadratic in hub degree and dies at 100 TB; this
    one survives because hubs (high degree) sit on the receiving end of
    almost all their edges.

    The undirected edge list feeds two consumers (degree aggregate +
    orientation join) and the ORIENTED list feeds three (both wedge
    sides + the closing-edge probe); Catalyst does not share common
    subplans across consumers, so both are persisted MEMORY_AND_DISK
    with lineage intact (the pagerank edge-invariant lesson: persist
    big loop/DAG invariants, never localCheckpoint them) and
    materialized EAGERLY so every consumer is guaranteed an
    InMemoryTableScan -- without this the plan re-derives the whole
    distinct+join chain per consumer (32 exchanges measured; 4 in the
    final plan with). Payload is (long, long, long) tuples throughout
    -- no attribute data moves.

    Measured frontier (r6 sf10 smoke): the co-purchase graph carries
    ~34 wedges per oriented edge (41M wedges at sf0.1, measured), so
    the closing-edge semi-join shuffles ~4.1B wedge rows at sf10 --
    ~100 GB of spill, beyond one box's free disk (the run died with
    SPILL_OUT_OF_MEMORY: No space left on device). The plan itself is
    the right one for a cluster, where that exchange spreads across
    executors' aggregate disk; single-box benching of this operator
    stops at sf1 (4.7x for 10x data, sub-linear).
    """
    und, _, o = _oriented(edges, canonical=canonical)
    # materialize the SMALL node-level result (localCheckpoint is the
    # sanctioned tool for bounded state), then release the big edge
    # caches -- same discipline as pagerank's w.unpersist(): without it
    # every graph query leaves |E|-sized pinned caches competing with
    # later queries' hash aggregates for the unified memory pool.
    # try/finally so a wedge-join/checkpoint failure (e.g. the sf10
    # disk-spill death) cannot leak the |E|-sized caches for the
    # session -- the leak class commit 66228f8 fixed elsewhere.
    try:
        return _tri_of(o).localCheckpoint(eager=True)
    finally:
        und.unpersist()
        o.unpersist()


def _tri_of(o: DataFrame) -> DataFrame:
    """(node, n_triangles) from a persisted oriented edge list.

    Both joins carry SHUFFLE_HASH hints (r17, guide section 3.1): the
    default sort-merge plan SORTS the wedge stream -- |wedges| is ~34x
    |E| on this graph (41M rows at sf0.1) and the sort is pure
    overhead when a per-partition hash of the |E|-row build side
    suffices. The build side is the ORIENTED EDGE LIST, |E|/N rows per
    partition at N shuffle partitions -- the bounded side of this join
    at any scale (wedges grow superlinearly, edges linearly), which is
    exactly the shuffled-hash sweet spot; AQE skew-split still applies.
    Measured r17: wedge+semi stage 4.56 s -> 2.80 s (1.63x), counts
    identical.
    """
    x, y = o.alias("x"), o.hint("shuffle_hash").alias("y")
    v_first = (F.col("x.dv") < F.col("y.dv")) | (
        (F.col("x.dv") == F.col("y.dv")) & (F.col("x.v") < F.col("y.v"))
    )
    wedges = x.join(y, (F.col("x.u") == F.col("y.u")) & v_first).select(
        F.col("x.u").alias("u"), F.col("x.v").alias("v"), F.col("y.v").alias("w")
    )
    closing = o.select(F.col("u").alias("v"), F.col("v").alias("w")).hint(
        "shuffle_hash"
    )
    tri = wedges.join(closing, ["v", "w"], "left_semi")
    return (
        tri.select(F.explode(F.array("u", "v", "w")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )


def clustering_coefficient(edges: DataFrame, canonical: bool = False) -> DataFrame:
    """Local clustering coefficient -> (node, d, n_triangles, cc).

    cc(v) = 2*T(v) / (d(v)*(d(v)-1)) for d(v) >= 2: the fraction of a
    node's neighbor pairs that are themselves connected -- the
    community-structure signal on top of raw triangle counts. Shares
    the persisted oriented wedge pipeline with triangle_counts via
    _oriented; the degree aggregate is narrow and joins the triangle
    counts LEFT so triangle-free nodes report cc = 0 instead of
    vanishing.
    """
    und, deg, o = _oriented(edges, canonical=canonical)
    try:
        tri = _tri_of(o)
        return (
            deg.filter(F.col("d") >= 2)
            .join(tri, "node", "left")
            .select(
                "node",
                "d",
                F.coalesce(F.col("n_triangles"), F.lit(0)).alias("n_triangles"),
                F.round(
                    2.0
                    * F.coalesce(F.col("n_triangles"), F.lit(0))
                    / (F.col("d") * (F.col("d") - 1)),
                    6,
                ).alias("cc"),
            )
        ).localCheckpoint(eager=True)  # small node-level state; see triangle_counts
    finally:
        # release even on failure -- same rationale as triangle_counts
        und.unpersist()
        o.unpersist()


def triangle_total_estimate(edges: DataFrame, sample_inv: int = 1) -> DataFrame:
    """Global triangle-count ESTIMATE via deterministic edge sampling
    -> 1 row (sampled_triangles, sample_inv, est_triangles).

    The DOULION estimator (Tsourakakis et al., KDD'09, public): keep
    each undirected edge with probability p = 1/``sample_inv``, count
    triangles EXACTLY on the sampled graph with the same
    degree-oriented wedge pipeline as :func:`triangle_counts`, and
    scale by ``sample_inv``^3 (a triangle survives iff all 3 of its
    edges do, probability p^3, so the scaled count is unbiased:
    E[est] = T). Published variance bound:
    Var[est] <= T*(1/p^3 - 1) + 2*k*(1/p - 1) where k counts triangle
    pairs sharing an edge -- relative error shrinks as 1/sqrt(T), so
    on triangle-rich graphs (the co-purchase graph has millions) the
    estimate is tight: measured +-1-2% at p=1/4 on the sf1 fixture
    against the exact count.

    Sampling is value-hash-deterministic (hex8(md5(a|b)) %
    sample_inv == 0, the sampled_truth_pairs convention): both engines
    and every executor agree on the kept edge set, runs are
    reproducible, and no RNG state ships with the plan.

    WHY: the exact wedge pipeline is cluster-correct but its closing
    semi-join shuffles ~34 wedges/edge; at sf10 on ONE box that is
    ~100 GB of spill -- more than the free disk (triangle_counts
    docstring). Sampling at 1/p cuts wedge volume by ~p^2 (both wedge
    edges must survive), so p=1/4 turns the un-runnable sf10 exact
    count into a ~6 GB-spill estimate with single-digit-percent error.
    On a cluster, the same knob trades error for wedge volume when
    even aggregate disk is the constraint.
    """
    from .dedup import _hex8_bigint

    if sample_inv > 1:
        key = F.concat_ws(
            "|",
            F.least("src", "dst").cast("string"),
            F.greatest("src", "dst").cast("string"),
        )
        edges = edges.filter(_hex8_bigint(F.md5(key)) % sample_inv == 0)
    tri = triangle_counts(edges)
    # per-node counts triple-count each triangle (one count at each
    # corner), so the global total is sum/3
    # coalesce: an empty sampled graph (sample_inv >> |E|) must report
    # an honest 0 estimate, not NULL (sum over zero rows is NULL)
    total = tri.agg(
        F.coalesce((F.sum("n_triangles") / 3).cast("long"), F.lit(0)).alias(
            "sampled_triangles"
        )
    )
    return total.select(
        "sampled_triangles",
        F.lit(sample_inv).cast("long").alias("sample_inv"),
        (F.col("sampled_triangles") * sample_inv**3)
        .cast("long")
        .alias("est_triangles"),
    )
