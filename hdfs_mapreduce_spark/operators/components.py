"""Connected components over a pair relation — the clustering step that
turns near-duplicate PAIRS (minhash/simhash/ngram/embedding) into
deduplication GROUPS with one canonical survivor per group. The reference
has no graph operator at all; a training-data pipeline cannot ship pair
lists to a filter, it needs `doc → canonical doc`, which is exactly a
connected-components labeling with min-id as the canonical choice.

Algorithm: iterative min-label propagation —

    label_0(v)   = v
    label_i+1(v) = min(label_i(v), min over neighbors u of label_i(u))

which converges in O(component diameter) rounds; near-dup graphs are
overwhelmingly tiny cliques (diameter 1-2), so 2-4 rounds close them. Each
round is one join + one min-aggregate: plain shuffles Catalyst plans well.
(For adversarial long-chain graphs the published fix is hash-to-min /
large-star-small-star [Rastogi et al., "Finding Connected Components in
Map-Reduce in Logarithmic Rounds", ICDE'13] — same join/agg primitives,
log rounds; not needed for dedup-shaped graphs.)

Execution contract (the part that matters in a long-lived session): the
convergence loop runs on eagerly localCheckpoint'ed iterates — truncated
lineage, one tiny action per round — and once the round count k is known
every checkpoint is unpersisted and the function returns a PURE
k-round-unrolled plan: no cached state outlives the call (the r1 verdict's
persist-leak rule), and Catalyst's ReusedExchange serves the repeated edge
subplan from one shuffle write. At 100 TB prefer materializing the edge
list as a table first so the probe and the final plan scan parquet instead
of recomputing the pair pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType

# Edge lists at or below this size are solved driver-side with union-find.
# The edge relation is the LSH-*reduced* pair graph — orders of magnitude
# smaller than the corpus — so even petabyte corpora usually land under it;
# 1M edges of two longs is ~30 MB on the driver, and union-find closes them
# in one pass where the distributed loop pays O(diameter) Spark jobs. The
# same small-model-locally reasoning as the IVF centroid collect
# (operators/similarity.py). Above the limit, the distributed min-label
# loop takes over; tests assert the two paths agree on random graphs.
LOCAL_EDGE_LIMIT = 1_000_000


def _symmetric(edges: DataFrame, src: str, dst: str) -> DataFrame:
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    return e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )


def _initial_labels(sym: DataFrame) -> DataFrame:
    return sym.select("src").distinct().select(
        F.col("src").alias("node"), F.col("src").alias("label")
    )


def _propagate(labels: DataFrame, sym: DataFrame) -> DataFrame:
    """One min-label round: every node takes the min of its own label and
    its neighbors' labels. Join on src + min-groupBy on node — two plain
    hash shuffles, AQE-splittable."""
    nbr = sym.join(labels, sym["src"] == labels["node"]).select(
        F.col("dst").alias("node"), F.col("label")
    )
    return (
        labels.unionByName(nbr).groupBy("node").agg(F.min("label").alias("label"))
    )


def _local_components(edges: DataFrame, src: str, dst: str, rows) -> DataFrame:
    """Driver-side union-find over a collected edge list. Union-by-min-root
    keeps every root the minimum id of its component, so ``find`` yields the
    same labeling the distributed min-propagation converges to."""
    parent: dict = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    for r in rows:
        ra, rb = find(r[0]), find(r[1])
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra

    nodes = set()
    for r in rows:
        nodes.add(r[0])
        nodes.add(r[1])
    node_type = edges.schema[src].dataType
    schema = StructType(
        [StructField("node", node_type), StructField("label", node_type)]
    )
    return edges.sparkSession.createDataFrame(
        [(n, find(n)) for n in sorted(nodes)], schema
    )


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
    local_limit: int = LOCAL_EDGE_LIMIT,
) -> DataFrame:
    """(node, label) for every node in ``edges``, where label is the
    smallest node id in the node's connected component. Nodes absent from
    ``edges`` are absent from the result (singletons label themselves —
    callers coalesce on join, see dedup_components).

    Edge lists that fit the driver (``local_limit``) are closed with
    union-find in one collect; larger graphs run the distributed probe +
    unroll described in the module docstring. Both paths return the same
    labeling (property-tested); the distributed result is an uncached pure
    plan."""
    if local_limit > 0:
        head = edges.select(src, dst).limit(local_limit + 1).collect()
        if len(head) <= local_limit:
            return _local_components(edges, src, dst, head)

    sc = edges.sparkSession.sparkContext
    # DataFrame.unpersist() does not release localCheckpoint storage (the
    # cache lives on the internal RDD, not the DF persist API), so free the
    # probe's checkpoints by id-diffing the context's persistent RDD map.
    before = set(sc._jsc.getPersistentRDDs().keySet())
    try:
        sym_probe = _symmetric(edges, src, dst).localCheckpoint(eager=True)
        labels = _initial_labels(sym_probe).localCheckpoint(eager=True)
        # Labels only ever decrease, so the fixpoint test is "sum of labels
        # unchanged" — one small aggregate per round instead of a self-join.
        prev_sum = labels.agg(F.sum("label")).collect()[0][0]
        k = 0
        converged = False
        while k < max_iter:
            nxt = _propagate(labels, sym_probe).localCheckpoint(eager=True)
            k += 1
            cur_sum = nxt.agg(F.sum("label")).collect()[0][0]
            labels = nxt
            if cur_sum == prev_sum:
                # Round k changed nothing — the fixpoint was already reached
                # after k-1 rounds, so the pure unrolled plan needs one round
                # fewer than the probe ran.
                converged = True
                break
            prev_sum = cur_sum
    finally:
        jmap = sc._jsc.getPersistentRDDs()
        for rid in set(jmap.keySet()) - before:
            jmap.get(rid).unpersist()

    sym = _symmetric(edges, src, dst)
    out = _initial_labels(sym)
    for _ in range(k - 1 if converged else k):
        out = _propagate(out, sym)
    return out


def canonical_assignment(
    nodes: DataFrame,
    node_col: str,
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """(node, canonical) for EVERY row of ``nodes``: the min id of the
    node's near-dup component, or the node itself when it has no edges.
    ``keep = canonical == node`` is the dedup survivor predicate."""
    labels = connected_components(edges, src, dst)
    return nodes.select(F.col(node_col).alias("node")).join(
        labels, "node", "left"
    ).select(
        F.col("node").alias(node_col),
        F.coalesce("label", "node").alias("canonical"),
    )
