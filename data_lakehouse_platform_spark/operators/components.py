"""Connected components over a candidate-pair edge list — the step
that turns near-dup PAIRS into dedup CLUSTERS (pick one keeper per
cluster), completing the fuzzy-dedup pipeline:

    shingle -> MinHash -> LSH pairs -> components -> keep min-id doc

Algorithm: iterative min-label propagation. Every node starts labeled
with its own id; each round every node takes the min label among
itself and its neighbors; fixpoint = each node holds the min node id
of its component.

Scale posture (100 TB corpus, 1000 executors):

* The edge list is the LSH candidate output — already tiny relative
  to the corpus (near-dup pairs only), so each round is a bounded
  shuffle keyed by node id, never touching document bodies.
* Rounds needed = graph diameter. Near-dup graphs are dense clumps of
  copies of the same underlying document — diameter is almost always
  1-3, so the loop exits after 2-4 rounds. For adversarial long-chain
  graphs, swap the body for the large-star/small-star alternation
  (Kiveris et al., "Connected Components in MapReduce"), which
  converges in O(log n) rounds with the same join shape.
* Each round ends in ``localCheckpoint`` so the plan stays O(1) deep
  instead of growing per-iteration lineage, and convergence is
  detected with a 1-row aggregate (sum of labels strictly decreases
  until fixpoint) — the only driver-side data is that scalar.

Reference analog: the reference dedups exact row versions via xxhash64
change detection (gold_dim_products.py:85-87); clustering generalizes
that to transitive content similarity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame, src: str = "src", dst: str = "dst", max_iter: int = 25
) -> DataFrame:
    """Label each node with the min node id of its connected component.

    ``edges``: undirected pair list (one row per pair, either order).
    Returns (node, component). Nodes with no edges are absent — union
    singletons in afterwards if the caller wants total coverage.
    """
    sym = (
        edges.select(F.col(src).alias("node"), F.col(dst).alias("nbr"))
        .union(edges.select(F.col(dst).alias("node"), F.col(src).alias("nbr")))
        .distinct()
        .localCheckpoint(eager=True)  # reused every round — materialize once
    )
    labels = (
        sym.select("node")
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )

    def _label_sum(df: DataFrame):
        # decimal accumulator: overflow-proof convergence metric
        return df.agg(F.sum(F.col("label").cast("decimal(38,0)"))).collect()[0][0]

    prev = _label_sum(labels)
    for _ in range(max_iter):
        nbr_labels = (
            sym.alias("e")
            .join(labels.alias("l"), F.col("e.nbr") == F.col("l.node"))
            .select(F.col("e.node").alias("node"), F.col("l.label").alias("label"))
        )
        new_labels = (
            labels.union(nbr_labels)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=True)
        )
        cur = _label_sum(new_labels)
        labels = new_labels
        if cur == prev:  # min-label is monotone; equal sum == fixpoint
            break
        prev = cur
    return labels.select("node", F.col("label").alias("component"))
