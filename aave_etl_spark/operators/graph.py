"""Distributed connected components over an edge (pair) table.

The missing last stage of a near-dup pipeline: LSH + verify emit PAIRS
(operators/dedup.py), but a dedup decision needs CLUSTERS — one keeper per
group of transitively-connected documents. At 100 TB the pair graph does
not fit on the driver, so the clustering must itself be a dataflow.

Algorithm: iterative min-label propagation with pointer jumping (label
compression), the DataFrame form of the map-reduce CC family (large-star /
small-star, Kiveris et al., "Connected Components in MapReduce and
Beyond"). Each iteration:

1. neighbor-min — every node receives its neighbors' current labels and
   keeps the min: one shuffle keyed by node id.
2. pointer jumping — label(v) := label(label(v)): a self-join on the label
   table. This is the doubling step: the hop distance a min label still
   has to travel shrinks geometrically, so convergence is O(log diameter)
   iterations, not O(diameter). Near-dup clusters are short-diameter, but
   the bound is what makes the operator safe on adversarial graphs
   (long chains of pairwise-similar documents).

Every round ends in a `localCheckpoint` — without it the lineage doubles
per iteration and Catalyst plan compilation, not the data, becomes the
bottleneck. Rounds are batched between convergence checks (lazy cuts
mid-batch, one eager cut + one changed-count per batch) so the driver
round-trips scale with batches, not rounds. On a real cluster swap
localCheckpoint for `checkpoint()` on reliable storage if executor loss
during the loop must be survivable.

Labels are node ids and the propagated min is the component's global min
id, so the final label doubles as the canonical "keeper" pick — no second
pass needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def connected_components(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    src: str = "id_a",
    dst: str = "id_b",
    id_col: str = "node",
    max_iter: int = 25,
    rounds_per_check: int = 2,
) -> DataFrame:
    """Connected components of the undirected graph in ``edges``.

    Returns (``id_col``, component) with component = MIN node id reachable
    from the node (ids compared by their column type's ordering — the same
    min the DuckDB recursive-CTE oracle computes). ``nodes`` optionally
    supplies the full vertex set (single-column DataFrame) so isolated
    nodes appear as their own singleton component; by default the vertex
    set is derived from the edges.

    Raises RuntimeError if labels still change after ``max_iter``
    iterations — with pointer jumping that means diameter > ~2^max_iter,
    i.e. something is structurally wrong with the input, and a silent
    partial answer would mislabel components.

    ``rounds_per_check`` batches propagation rounds between convergence
    checks: only the LAST round of a batch ends in the eager checkpoint +
    changed-count driver round-trip; mid-batch rounds cut lineage lazily
    (materialized once inside the batch-end job — the next round consumes
    the frame in three branches). One round is a deterministic function f
    of the labels, and f(x) = x exactly at the fixpoint, so checking only
    the final round's changed flag detects the same convergence; a round
    executed past convergence is idempotent. Halves the driver
    actions/checkpoint jobs per round — at small scale these dominate the
    iteration (guide §5: the driver should do almost no work per round).
    """
    if rounds_per_check < 1:
        raise ValueError("rounds_per_check must be >= 1")
    # checkpoint the edge table BEFORE symmetrizing: the union references it
    # twice, and edges often arrive at the end of an expensive pipeline
    # (LSH -> verify) that must not run once per branch
    edges = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).localCheckpoint(
        eager=False
    )
    sym = edges.unionByName(edges.select(F.col("b").alias("a"), F.col("a").alias("b")))
    if nodes is None:
        vertices = sym.select(F.col("a").alias(id_col)).distinct()
    else:
        vertices = nodes.toDF(id_col).distinct()
    # duplicate edges only inflate the neighbor-min join; drop them once
    sym = sym.distinct().localCheckpoint(eager=False)

    labels = vertices.select(F.col(id_col).alias("node"), F.col(id_col).alias("comp"))
    labels = labels.localCheckpoint(eager=True)
    comp_t = labels.schema["comp"].dataType

    def one_round(labels: DataFrame) -> DataFrame:
        # 1. neighbor-min: node b receives a's label; keep the min of
        # own+received. The node's OLD label rides the union as `_old`
        # (exactly one labels row per node, so max(_old) recovers it) —
        # this folds what used to be a third per-round join (labels back
        # onto the jumped frame just to compute the changed flag) into the
        # same groupBy exchange: one fewer shuffle per iteration, values
        # identical (guide §2.4)
        msgs = sym.join(
            labels.select(F.col("node").alias("a"), "comp"), "a"
        ).select(
            F.col("b").alias("node"), "comp", F.lit(None).cast(comp_t).alias("_old")
        )
        stepped = (
            labels.select("node", "comp", F.col("comp").alias("_old"))
            .unionByName(msgs)
            .groupBy("node")
            .agg(F.min("comp").alias("comp"), F.max("_old").alias("_old"))
            # a message-only node (edge endpoint outside the vertex set)
            # has no labels row, hence null _old — the former inner join
            # dropped such rows; keep that contract
            .filter(F.col("_old").isNotNull())
        )
        # 2. pointer jumping: comp := comp's own comp (labels are node ids,
        # so the label table resolves them; left+coalesce keeps the row if
        # a label somehow isn't a vertex — cannot happen, but cheap safety)
        return stepped.join(
            stepped.select(F.col("node").alias("comp"), F.col("comp").alias("_c2")),
            "comp",
            "left",
        ).select(
            "node",
            F.coalesce("_c2", F.col("comp")).alias("comp"),
            (F.coalesce("_c2", F.col("comp")) != F.col("_old")).alias("_chg"),
        )

    done = 0
    while done < max_iter:
        batch = min(rounds_per_check, max_iter - done)
        jumped = labels  # placate the linter; reassigned below
        for j in range(batch):
            # mid-batch rounds cut lineage LAZILY (no driver job: the RDD
            # caches when the batch-end eager job first computes it, and
            # the next round's three consumers share that one pass); only
            # the batch-END round pays the eager materialization, and the
            # changed flag then reads cached blocks via a limit-1 scan
            jumped = one_round(labels).localCheckpoint(eager=(j == batch - 1))
            labels = jumped.select("node", "comp")
        done += batch
        changed = jumped.filter("_chg").limit(1).count()
        if changed == 0:
            return labels.select(F.col("node").alias(id_col), F.col("comp").alias("component"))
    raise RuntimeError(f"connected_components did not converge in {max_iter} iterations")


def dedup_clusters(
    pairs: DataFrame,
    all_ids: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Near-dup PAIRS → dedup CLUSTER table: (id, component, cluster_size,
    is_keeper). ``all_ids`` is the full document id set (one column) so
    every document lands in a cluster — unpaired docs as singletons.

    component = the cluster's min id, so ``is_keeper`` (the canonical doc a
    dedup retains) is simply id == component: the keeper pick costs nothing
    beyond the CC itself. cluster_size comes from one window over the
    component key — cluster cardinality, bounded by the largest dup group.
    """
    cc = connected_components(pairs, nodes=all_ids, id_col=id_col)
    w = Window.partitionBy("component")
    return cc.select(
        F.col(id_col),
        "component",
        F.count(F.lit(1)).over(w).cast("long").alias("cluster_size"),
        F.when(F.col(id_col) == F.col("component"), F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("is_keeper"),
    )
