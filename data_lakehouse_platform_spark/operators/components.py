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
    converged = False
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
            converged = True
            break
        prev = cur
    if not converged:
        # Silent wrong labels (one component split across several) are
        # far worse than a loud stop: propagation needs diameter
        # rounds, so a long-chain graph should use the O(log n)
        # star-contraction twin instead.
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            "(graph diameter exceeds max_iter); raise max_iter or use "
            "connected_components_starred for long-diameter graphs"
        )
    return labels.select("node", F.col("label").alias("component"))


def connected_components_starred(
    edges: DataFrame, src: str = "src", dst: str = "dst", max_iter: int = 40
) -> DataFrame:
    """Connected components via the large-star/small-star alternation
    (Kiveris et al., "Connected Components in MapReduce and Beyond") —
    the O(log n)-round twin of :func:`connected_components` for
    ADVERSARIAL graphs whose diameter is large (long chains), where
    min-label propagation needs diameter rounds.

    Both half-steps are one partial-aggregatable groupBy (per-node min
    neighbor) plus one co-partitioned join back to the edge list —
    never a collect, never per-node Python:

    * large-star: every node connects its strictly-LARGER neighbors to
      the minimum of its neighborhood (incl. itself) — long chains
      contract exponentially;
    * small-star: edges oriented larger→smaller; every node connects
      its smaller neighbors (and itself) to the neighborhood minimum
      — turns contracted clumps into stars.

    Fixpoint = the edge set is a union of stars rooted at component
    minima; convergence is detected with a 2-scalar aggregate (edge
    count + xxhash64 sum), the only driver-side data. Returns
    (node, component), singletons absent — same contract as
    :func:`connected_components` (equality property-tested, including
    a path graph that the label-propagation loop needs 25 rounds on).
    """
    e = (
        edges.select(
            F.greatest(F.col(src), F.col(dst)).alias("u"),
            F.least(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )

    def _sig(df: DataFrame):
        row = df.agg(
            F.count(F.lit(1)),
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")),
        ).collect()[0]
        return (row[0], row[1])

    def _large(df: DataFrame) -> DataFrame:
        sym = df.union(df.select(F.col("v").alias("u"), F.col("u").alias("v")))
        m = sym.groupBy("u").agg(F.min("v").alias("mv"))
        m = m.select("u", F.least("mv", "u").alias("m"))
        return (
            sym.join(m, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )

    def _small(df: DataFrame) -> DataFrame:
        # df is larger→smaller oriented: every neighbor v < u, so the
        # neighborhood min is just min(v).
        m = df.groupBy("u").agg(F.min("v").alias("m"))
        moved = (
            df.join(m, "u")
            .filter(F.col("v") != F.col("m"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )
        return moved.union(m.select(F.col("u"), F.col("m").alias("v")))

    sig = _sig(e)
    converged = False
    for _ in range(max_iter):
        e = (
            _small(_large(e))
            .select(
                F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
            )
            .filter(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint(eager=True)  # O(1)-deep plan per round
        )
        new_sig = _sig(e)
        if new_sig == sig:
            converged = True
            break
        sig = new_sig
    if not converged:
        raise RuntimeError(
            f"connected_components_starred did not converge in {max_iter} "
            "rounds — unexpected for O(log n) star contraction; raise "
            "max_iter"
        )

    roots = e.select(F.col("v").alias("node")).distinct()
    return (
        e.select(F.col("u").alias("node"), F.col("v").alias("component"))
        .union(roots.select("node", F.col("node").alias("component")))
        .distinct()
    )


_PR_SCALE = 1_000_000_000_000  # 1e12: rank unit in exact int64


def pagerank_fixed(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    rounds: int = 2,
    damping_pct: int = 85,
) -> DataFrame:
    """PageRank on an undirected graph in EXACT fixed-point arithmetic:
    ranks are int64 multiples of 1e-12, contributions divide by degree
    with integer division, damping is (x * pct) // 100 — so every
    round is bit-deterministic under any partitioning (same property
    as kmeans's fixed-point means), and the result is oracle-checkable.

    Per round: one join of the rank vector against the edge list
    (shuffle keyed on node id) + one grouped sum — the standard
    scalable PageRank shape; the symmetric edge list has no dangling
    nodes, so no global mass-correction term is needed. Returns
    (node, rank_scaled, rank).
    """
    sym = (
        edges.select(F.col(src).alias("node"), F.col(dst).alias("nbr"))
        .union(edges.select(F.col(dst).alias("node"), F.col(src).alias("nbr")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = sym.groupBy("node").agg(F.count(F.lit(1)).alias("deg"))
    base = int(_PR_SCALE * (100 - damping_pct) // 100)
    ranks = deg.select("node", F.lit(_PR_SCALE).cast("bigint").alias("r"))
    for _ in range(rounds):
        contrib = (
            ranks.join(deg, "node")
            .join(sym, "node")
            .select(F.col("nbr").alias("node"), F.expr("r div deg").alias("c"))
        )
        ranks = (
            contrib.groupBy("node")
            .agg(F.expr(f"(sum(c) * {damping_pct}) div 100").alias("__s"))
            .select("node", (F.lit(base) + F.col("__s")).cast("bigint").alias("r"))
            .localCheckpoint(eager=True)
        )
    return ranks.select(
        "node",
        F.col("r").alias("rank_scaled"),
        (F.col("r").cast("double") / _PR_SCALE).alias("rank"),
    )
