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

from ..ckpt import cut_lineage

__all__ = ["connected_components", "dup_clusters"]

# Edge cap for the driver union-find fast path (symmetrized rows; ~2x the
# undirected pair count). Dedup pair graphs at any one maintenance window
# are usually far below this; past it the distributed loop runs as before.
# 2^18 symmetrized edges collect to a few MB — bounded by construction.
CC_DRIVER_MAX_EDGES = 1 << 18


def _driver_components(sym: DataFrame) -> DataFrame:
    """Union-find over a COLLECTED edge list (either direction, self-loops
    pre-filtered, duplicates harmless) — the fast path for small pair
    graphs (guide §1.2: at 256 pairs the iterative loop's ~6 jobs/round of
    scheduling overhead IS the cost; a driver fold is milliseconds). Gated
    by CC_DRIVER_MAX_EDGES on the already-checkpointed relation, so the
    collect is bounded and the distributed loop remains the scale path.
    Output is row-identical to the iterative fixpoint: component = min
    reachable node id."""
    import pandas as pd
    from pyspark.sql.types import StructField, StructType

    pdf = sym.toPandas()
    parent: dict = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    for s, d in zip(pdf["s"], pdf["d"]):
        if s not in parent:
            parent[s] = s
        if d not in parent:
            parent[d] = d
        rs, rd = find(s), find(d)
        if rs != rd:
            parent[rs] = rd
    comp_min: dict = {}
    for n in parent:
        r = find(n)
        m = comp_min.get(r)
        if m is None or n < m:
            comp_min[r] = n
    nodes = list(parent.keys())
    out = pd.DataFrame(
        {"node": nodes, "component": [comp_min[find(n)] for n in nodes]}
    )
    dt = sym.schema["s"].dataType
    return sym.sparkSession.createDataFrame(
        out,
        StructType(
            [StructField("node", dt), StructField("component", dt)]
        ),
    )


def _two_phase_components(sym: DataFrame, max_iter: int) -> DataFrame:
    """Large-star/small-star alternation (Kiveris et al. 2014, "Connected
    Components in MapReduce and Beyond") — converges in O(log n) rounds even
    on chain-heavy graphs where hash-to-min's per-round frontier only moves
    by pointer jumps. Each round is two groupBy-min + two equi-joins over
    the EDGE relation (which two-phase monotonically shrinks toward stars),
    vs hash-to-min's joins over the label relation.

    large-star: every node connects its strictly-larger neighbors to
    min(N(u) ∪ {u}); small-star: every node connects its smaller neighbors
    (and itself) to that min. Fixpoint = the edge set stops changing, at
    which point edges ARE the (component-min → node) label pairs."""
    edges = cut_lineage(
        sym.filter(F.col("s") < F.col("d"))
        .select(F.col("s").alias("a"), F.col("d").alias("b"))
        .distinct()
    )
    if edges.limit(1).count() == 0:
        return edges.select(
            F.col("a").alias("node"), F.col("b").alias("component")
        )
    for _ in range(max_iter):
        # LARGE-STAR: directed both ways; (v, m(u)) for neighbors v > u
        nb = edges.select(F.col("a").alias("u"), F.col("b").alias("v")).union(
            edges.select(F.col("b").alias("u"), F.col("a").alias("v"))
        )
        mins = nb.groupBy("u").agg(F.min("v").alias("mn"))
        mins = mins.select("u", F.least("mn", F.col("u")).alias("m"))
        large = (
            nb.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("m").alias("a"), F.col("v").alias("b"))
            .filter(F.col("a") != F.col("b"))  # m <= u < v keeps a < b
            .distinct()
        )
        # SMALL-STAR: per node u over its smaller neighbors N⁻(u);
        # m = min(N⁻(u)); emit (m, v) for v ∈ N⁻(u)\{m} and (m, u)
        nb2 = large.select(F.col("b").alias("u"), F.col("a").alias("v"))
        mins2 = nb2.groupBy("u").agg(F.min("v").alias("mn"))
        small_nbrs = (
            nb2.join(mins2, "u")
            .select(F.col("mn").alias("a"), F.col("v").alias("b"))
            .filter(F.col("a") != F.col("b"))
        )
        small_self = mins2.select(F.col("mn").alias("a"), F.col("u").alias("b"))
        new_edges = cut_lineage(small_nbrs.union(small_self).distinct())
        # fixpoint: both sides are distinct canonical sets, so equal counts
        # + empty one-direction difference ⇒ identical
        if (
            new_edges.count() == edges.count()
            and new_edges.exceptAll(edges).limit(1).count() == 0
        ):
            edges = new_edges
            break
        edges = new_edges
    else:
        raise RuntimeError(
            f"two-phase connected components did not converge in "
            f"{max_iter} rounds"
        )
    # stars: every non-center node appears exactly once as b with its
    # component min as a; centers label themselves
    members = edges.select(F.col("b").alias("node"), F.col("a").alias("component"))
    centers = (
        edges.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
    )
    return members.union(centers)


def connected_components(
    edges: DataFrame,
    src: str,
    dst: str,
    max_iter: int = 25,
    algorithm: str = "hash-to-min",
    driver_max_edges: int | None = None,
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``; component =
    min node id reachable (undirected). Nodes with no edges are not emitted
    (a dedup caller treats absent = singleton = keep).

    ``algorithm``: "hash-to-min" (default — min-label propagation with
    pointer jumping; 3 label-relation shuffles/round) or "two-phase"
    (large-star/small-star; edge-relation shuffles but provably O(log n)
    rounds — prefer it for chain-heavy graphs whose diameter approaches the
    node count).

    ``driver_max_edges`` (default CC_DRIVER_MAX_EDGES; 0 disables): when
    the symmetrized edge relation — already materialized for the loop —
    has at most this many rows, a bounded driver union-find replaces the
    iterative job rounds (identical output, milliseconds instead of
    seconds of scheduling overhead). The count probe runs on the
    checkpointed relation, not the upstream lineage.

    Raises if ``max_iter`` rounds don't reach the fixpoint — with pointer
    jumping that needs a component diameter around 2^25, i.e. pathological
    input, and a silent partial merge would corrupt downstream dedup.
    """
    if algorithm not in ("hash-to-min", "two-phase"):
        # validate BEFORE the checkpoints below run real jobs on a possibly
        # expensive (LSH-rescore) lineage
        raise ValueError(f"unknown algorithm {algorithm!r}")
    # materialize the edge list BEFORE symmetrizing: the union would
    # otherwise evaluate the (often expensive — e.g. an LSH rescore)
    # upstream plan once per branch
    e = cut_lineage(edges.select(F.col(src).alias("s"), F.col(dst).alias("d")))
    if driver_max_edges is None:
        driver_max_edges = CC_DRIVER_MAX_EDGES
    if driver_max_edges > 0 and e.count() <= driver_max_edges:
        # union-find is direction-agnostic, so the RAW checkpointed edges
        # feed it directly — the symmetrize+distinct checkpoint (a second
        # plan compile + job) exists only for the distributed loops. The
        # self-loop filter preserves the sym semantics exactly: a node
        # with only self-edges was never emitted. Raw rows ≤ symmetrized
        # rows, so the cap still bounds the collect.
        return _driver_components(e.filter(F.col("s") != F.col("d")))
    sym = cut_lineage(
        e.union(e.select(F.col("d").alias("s"), F.col("s").alias("d")))
        .filter(F.col("s") != F.col("d"))
        .distinct()
    )
    if algorithm == "two-phase":
        return _two_phase_components(sym, max_iter)
    labels = cut_lineage(
        sym.select(F.col("s").alias("n"))
        .distinct()
        .withColumn("l", F.col("n"))
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
        jumped = cut_lineage(jumped)
        labels = jumped.select("n", F.col("_l2").alias("l"))
        if jumped.filter(F.col("_l2") != F.col("l")).limit(1).count() == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds"
        )
    return labels.select(F.col("n").alias("node"), F.col("l").alias("component"))


def dup_clusters(
    pairs: DataFrame,
    id_1: str,
    id_2: str,
    max_iter: int = 25,
    algorithm: str = "hash-to-min",
) -> DataFrame:
    """Fold near-dup pairs into clusters: (doc_id, component_id, is_keeper)
    where component_id = min doc id in the cluster and the keeper is that
    minimum (deterministic canonical-doc policy — swap in a quality-ranked
    argmax upstream by re-mapping ids if needed). Only clustered docs are
    emitted; absent docs are singletons and always kept."""
    cc = connected_components(
        pairs, id_1, id_2, max_iter=max_iter, algorithm=algorithm
    )
    return cc.select(
        F.col("node").alias("doc_id"),
        F.col("component").alias("component_id"),
        (F.col("node") == F.col("component")).alias("is_keeper"),
    )
