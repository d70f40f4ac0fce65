"""Distributed connected components: duplicate-cluster resolution.

Near-dup detection (operators.dedup) emits PAIRS; pipelines need
CLUSTERS ("keep one doc per duplicate group"). The bridge is connected
components over the candidate-pair graph. The reference has nothing of
the kind (single-entity pipeline, reference etl_pipeline.py); this is
north-star LLM-pipeline surface.

Algorithm: iterative min-label propagation, pure DataFrame ops --
each round every node adopts the minimum label in its closed
neighborhood, so labels flood monotonically toward each component's
minimum id. Rounds needed = graph diameter. Duplicate graphs are
near-cliques (diameter 2-3 in practice), so the loop terminates in a
few rounds; the iteration cap guards pathological chains.

Scale design (the part that matters at 100 TB):

- each round is one join + one groupBy, both hash-partitioned on the
  SAME node key, so AQE reuses the exchange instead of re-shuffling;
- ``localCheckpoint`` truncates lineage each round -- without it the
  plan doubles per iteration and the job dies on plan-compile time
  long before data size matters;
- convergence is detected with a distributed count of changed labels
  (no collect of the label table, ever);
- for graphs with huge skewed components (web-crawl link graphs, long
  chains) use ``connected_components_lss`` -- alternating
  large-star/small-star (Kiveris et al., "Connected Components in
  MapReduce and Beyond", SoCC'14): the same (join + groupBy)
  primitives, but O(log n) rounds on ANY diameter and degree-balanced
  intermediate edges. Shape-compatible drop-in for
  ``connected_components``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "a",
    dst: str = "b",
    max_iterations: int = 20,
) -> DataFrame:
    """Resolve undirected ``edges`` into ``(id, component)``.

    ``component`` is the minimum node id of the component -- a
    deterministic, engine-independent cluster key. Nodes appearing in
    no edge are not emitted (callers union singletons back if needed).
    """
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
    )
    if max_iterations < 1:
        raise ValueError(f"max_iterations must be >= 1, got {max_iterations}")
    labels = sym.select("u").distinct().select("u", F.col("u").alias("label"))
    labels = labels.localCheckpoint(eager=True)

    for _ in range(max_iterations):
        # min label over the closed neighborhood: the node's own label
        # (labels side) folded with its neighbors' labels (message side).
        # Qualified aliases throughout: sym and labels share lineage, so
        # unqualified column refs would be ambiguous self-join attrs.
        msgs = (
            sym.alias("e")
            .join(labels.alias("l"), F.col("e.v") == F.col("l.u"))
            .select(F.col("e.u").alias("u"), F.col("l.label").alias("label"))
            .groupBy("u")
            .agg(F.min("label").alias("nbr_min"))
        )
        updated = (
            labels.alias("lab")
            .join(msgs.alias("m"), F.col("lab.u") == F.col("m.u"), "left")
            .select(
                F.col("lab.u").alias("u"),
                F.least(
                    F.col("lab.label"), F.coalesce(F.col("m.nbr_min"), F.col("lab.label"))
                ).alias("new_label"),
                F.col("lab.label").alias("label"),
            )
        )
        updated = updated.localCheckpoint(eager=True)
        n_changed = updated.filter(F.col("new_label") < F.col("label")).count()
        labels = updated.select("u", F.col("new_label").alias("label"))
        if n_changed == 0:
            break
    else:
        # Fell through the cap with labels still moving: the graph's
        # diameter exceeds max_iterations and the labels are NOT final
        # component ids. Returning them silently would hand wrong
        # clusters to a dedup pipeline, so fail loudly instead.
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} "
            f"iterations ({n_changed} labels still changing); raise "
            "max_iterations or switch to the large-star/small-star variant"
        )

    return labels.select(F.col("u").alias("id"), F.col("label").alias("component"))


def connected_components_lss(
    edges: DataFrame,
    src: str = "a",
    dst: str = "b",
    max_iterations: int = 30,
) -> DataFrame:
    """``connected_components`` via alternating large-star/small-star.

    Same contract as ``connected_components`` -- resolve undirected
    ``edges`` into ``(id, component)`` where ``component`` is the
    minimum node id -- but converges in O(log n) rounds on ANY graph
    diameter (Kiveris et al., SoCC'14), where min-label propagation
    needs diameter-many rounds and dies on chains. Use this for
    web-crawl-shaped dup graphs (long paths, giant skewed components);
    min-label remains marginally cheaper on near-clique dup clusters.

    Round = one large-star + one small-star, each a groupBy + join on
    the node key over an edge set that only shrinks toward the star
    forest; ``localCheckpoint`` truncates lineage per round. The state
    is edges (hi > lo), never a dense neighbor list, so a high-degree
    hub costs a wide groupBy -- not a collect -- and AQE's skew
    handling applies.
    """
    if max_iterations < 1:
        raise ValueError(f"max_iterations must be >= 1, got {max_iterations}")
    # Canonical star-edge orientation: hi > lo, self-loops dropped.
    stars = (
        edges.select(
            F.greatest(F.col(src), F.col(dst)).alias("hi"),
            F.least(F.col(src), F.col(dst)).alias("lo"),
        )
        .filter(F.col("hi") != F.col("lo"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_edges = stars.count()

    for _ in range(max_iterations):
        # Large-star: every node u links its strictly-LARGER neighbors
        # to m = min(closed neighborhood of u). Processing the
        # symmetric edge list means each edge is rewritten from both
        # endpoints' perspectives; output keeps the hi > lo invariant
        # because v > u >= m.
        sym = stars.select(F.col("hi").alias("u"), F.col("lo").alias("v")).union(
            stars.select(F.col("lo").alias("u"), F.col("hi").alias("v"))
        )
        lmins = (
            sym.groupBy("u")
            .agg(F.min("v").alias("mn"))
            .select("u", F.least("mn", "u").alias("m"))
        )
        large = (
            sym.join(lmins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("hi"), F.col("m").alias("lo"))
            .filter(F.col("hi") != F.col("lo"))
            .distinct()
        )
        # Small-star: every node hi links its smaller neighbors AND
        # itself to m = min of those neighbors (all < hi after
        # large-star). Emits (v, m) for v in nbrs ∪ {hi}, v != m.
        smins = large.groupBy("hi").agg(F.min("lo").alias("m"))
        relinked = (
            large.join(smins, "hi")
            .filter(F.col("lo") != F.col("m"))
            .select(F.col("lo").alias("hi"), F.col("m").alias("lo"))
        )
        centers = smins.select("hi", F.col("m").alias("lo"))
        new_stars = relinked.union(centers).distinct().localCheckpoint(eager=True)

        n_new = new_stars.count()
        converged = n_new == n_edges and new_stars.subtract(stars).isEmpty()
        stars, n_edges = new_stars, n_new
        if converged:
            break
    else:
        raise RuntimeError(
            f"connected_components_lss did not converge in {max_iterations} "
            "rounds; this should be ~log2(n) -- check for label-type "
            "overflow or raise max_iterations"
        )

    # Fixed point is a star forest rooted at each component's minimum:
    # every non-root appears exactly once as hi, roots only as lo.
    return stars.select(F.col("hi").alias("id"), F.col("lo").alias("component")).union(
        stars.select("lo", "lo").distinct().toDF("id", "component")
    )


def dedup_clusters(
    pairs: DataFrame, a: str = "a", b: str = "b"
) -> DataFrame:
    """Cluster summary over near-dup pairs: one row per duplicate group.

    Returns ``(component, n_members, keeper_id)`` where the keeper is
    the minimum doc id -- the row a curation pipeline keeps. Downstream
    drop-list = members minus keepers (a semi-join, never a collect).
    """
    cc = connected_components(pairs, src=a, dst=b)
    return cc.groupBy("component").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.min("id").alias("keeper_id"),
    )
