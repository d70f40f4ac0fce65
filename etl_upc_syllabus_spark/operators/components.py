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
- for graphs with huge skewed components (web-crawl link graphs, not
  dup clusters) swap the neighborhood-min step for alternating
  large-star/small-star (Kiveris et al., "Connected Components in
  MapReduce and Beyond", SoCC'14): same primitive ops, O(log n)
  rounds, degree-balanced. The API is shape-compatible.
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
