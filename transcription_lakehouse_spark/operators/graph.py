"""Connected components over near-duplicate pair graphs — the final stage
of a corpus dedup pipeline (pairs → clusters → one canonical keeper per
cluster).

The reference stops at pair detection (`/root/reference/src/lakehouse/
quality/metrics/integrity.py:459-616` reports duplicate pairs and leaves
removal to the operator); at training-data scale the pairs must be folded
into transitive clusters, else A~B and B~C dedup to two independent
deletions that can drop both B and C while a later A~C pair re-flags A.

Algorithm: iterative **min-label propagation with pointer jumping**
(hash-to-min, Rastogi et al. 2013 "Finding Connected Components in
Map-Reduce in Logarithmic Rounds"):

- every node starts labeled with itself;
- each round takes the min of its own label and its neighbors' labels
  (one equi-join edge⋈label + map-side-combined min groupBy), then
  *pointer-jumps* — re-labels through the label's own label (one more
  equi-join) — which short-circuits long chains logarithmically;
- rounds stop at fixpoint (no label changed).

Each round is 3 bounded equi-join shuffles on the label relation (size =
#nodes-in-pairs, which for dedup graphs is a small fraction of the corpus);
``localCheckpoint`` truncates lineage so the plan doesn't grow with
iterations. The per-round ``count()`` is a fixpoint test on the label
relation, not a corpus scan.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

__all__ = ["connected_components", "dup_clusters"]


def connected_components(
    edges: DataFrame, src: str, dst: str, max_iter: int = 25
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``; component =
    min node id reachable (undirected). Nodes with no edges are not emitted
    (a dedup caller treats absent = singleton = keep).

    Raises if ``max_iter`` rounds don't reach the fixpoint — with pointer
    jumping that needs a component diameter around 2^25, i.e. pathological
    input, and a silent partial merge would corrupt downstream dedup.
    """
    # materialize the edge list BEFORE symmetrizing: the union would
    # otherwise evaluate the (often expensive — e.g. an LSH rescore)
    # upstream plan once per branch
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d")).localCheckpoint()
    sym = (
        e.union(e.select(F.col("d").alias("s"), F.col("s").alias("d")))
        .filter(F.col("s") != F.col("d"))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        sym.select(F.col("s").alias("n"))
        .distinct()
        .withColumn("l", F.col("n"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        nbr = (
            sym.join(
                labels.select(F.col("n").alias("_dn"), F.col("l").alias("_dl")),
                sym["d"] == F.col("_dn"),
            )
            .groupBy("s")
            .agg(F.min("_dl").alias("_nbr_min"))
        )
        stepped = labels.join(nbr, labels["n"] == nbr["s"], "left").select(
            "n", F.least("l", F.coalesce("_nbr_min", "l")).alias("_l1"), "l"
        )
        ptr = stepped.select(F.col("n").alias("_pn"), F.col("_l1").alias("_pl"))
        jumped = stepped.join(ptr, stepped["_l1"] == F.col("_pn"), "left").select(
            "n",
            F.least("_l1", F.coalesce("_pl", "_l1")).alias("_l2"),
            "l",
        )
        # ONE materialization per round: the checkpoint backs both the
        # fixpoint probe and the next round's labels (a lazy select over
        # checkpointed rows adds no lineage and costs no second job)
        jumped = jumped.localCheckpoint()
        labels = jumped.select("n", F.col("_l2").alias("l"))
        if jumped.filter(F.col("_l2") != F.col("l")).limit(1).count() == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds"
        )
    return labels.select(F.col("n").alias("node"), F.col("l").alias("component"))


def dup_clusters(
    pairs: DataFrame, id_1: str, id_2: str, max_iter: int = 25
) -> DataFrame:
    """Fold near-dup pairs into clusters: (doc_id, component_id, is_keeper)
    where component_id = min doc id in the cluster and the keeper is that
    minimum (deterministic canonical-doc policy — swap in a quality-ranked
    argmax upstream by re-mapping ids if needed). Only clustered docs are
    emitted; absent docs are singletons and always kept."""
    cc = connected_components(pairs, id_1, id_2, max_iter=max_iter)
    return cc.select(
        F.col("node").alias("doc_id"),
        F.col("component").alias("component_id"),
        (F.col("node") == F.col("component")).alias("is_keeper"),
    )
