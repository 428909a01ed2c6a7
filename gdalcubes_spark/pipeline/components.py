"""Connected components over near-duplicate pair graphs.

Pairwise dedup (minhash_lsh_pairs / simhash_near_pairs / jaccard_pairs)
yields EDGES; an actual dedup pass needs CLUSTERS — every document labeled
with its duplicate-group id so one representative survives. At corpus scale
the graph has billions of edges, so we use the alternating large-star /
small-star algorithm (Kiveris et al., "Connected Components in MapReduce and
Beyond", SoCC'14 — public literature): each round is two groupBy shuffles on
node id, and the edge set converges to a star per component in O(log n)
rounds even for path-shaped graphs (min-label propagation would need
O(diameter) rounds).

Spark shape: edges live in a DataFrame (src, dst); each star operation is a
single groupBy(node).agg(min) joined back — all JVM aggregations, no Python.
Lineage is cut with localCheckpoint every round (iterative plans otherwise
stack O(rounds) shuffles into one Catalyst tree and planning time explodes);
convergence is an aggregate equality check on (sum, count) of the edge set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# localCheckpoint block handles from CONVERGED component edge sets. These are
# deliberately NOT in dedup._CACHED: checkpoint lineage is truncated, so a
# released result can never recompute — while dedup's registry holds
# recomputable caches that other library functions (knn_tiles,
# minhash_signatures) free unilaterally between queries. Sharing one registry
# let those calls silently invalidate an un-collected dedup_clusters result.
_CKPT_CACHED: list = []


def release_checkpoints() -> None:
    """Free the converged edge sets' localCheckpoint blocks. Collect or
    persist any outstanding connected_components / dedup_clusters result
    FIRST — released checkpoints cannot recompute (truncated lineage)."""
    while _CKPT_CACHED:
        try:
            _CKPT_CACHED.pop().unpersist()
        except Exception:
            pass


def _large_star(edges: DataFrame) -> DataFrame:
    """Connect every neighbor larger than u to u's minimum neighborhood label.

    large-star(u): m = min(N(u) ∪ {u}); emit (v, m) for v ∈ N(u), v > u.

    Plan shape: the per-node minimum is a window aggregate over
    partitionBy(src) — ONE exchange — instead of the groupBy + join-back
    formulation (two exchanges over the same rows). No trailing distinct:
    duplicate edges do not change any window minimum, and _small_star's
    final distinct (the only place the edge SET matters — the convergence
    signature) dedupes once per round instead of twice."""
    from pyspark.sql import Window as W
    sym = edges.union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    m = F.least(F.min("dst").over(W.partitionBy("src")), F.col("src").cast("long"))
    return (sym.withColumn("m", m)
            .filter(F.col("dst") > F.col("src"))
            .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
            .filter(F.col("src") != F.col("dst")))


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient edges to the smaller endpoint, then connect each node's small
    neighbors (and itself) to the minimum of that set.

    small-star(u): N⁻ = {v ∈ N(u) : v < u}; m = min(N⁻ ∪ {u});
    emit (v, m) for v ∈ N⁻ ∪ {u}, v ≠ m.

    Same window-aggregate shape as _large_star (one exchange for the
    minimum; both union branches reuse the same windowed subtree), one
    distinct for the whole round's output. Every output edge has
    src > dst: to_min emits (v, m) with m ≤ min(N⁻) < v, the self edge
    (u, m) has m < u — the signature relies on this orientation."""
    from pyspark.sql import Window as W
    directed = (edges.select(F.greatest("src", "dst").alias("src"),
                             F.least("src", "dst").alias("dst"))
                .filter(F.col("src") != F.col("dst")))
    d2 = directed.withColumn("m", F.min("dst").over(W.partitionBy("src")))
    to_min = d2.select(F.col("dst").alias("src"), F.col("m").alias("dst"))
    self_edge = d2.select("src", F.col("m").alias("dst"))
    return (to_min.union(self_edge)
            .filter(F.col("src") != F.col("dst"))
            .distinct())


def connected_components(pairs: DataFrame, src: str = "ida", dst: str = "idb",
                         max_rounds: int = 25) -> DataFrame:
    """Label every node of the pair graph with its component's MINIMUM id.

    Returns (id, component). Isolated nodes don't appear in `pairs`, so they
    don't appear here either — left-join and coalesce(component, id) at the
    call site to label a full corpus."""
    sc = pairs.sparkSession.sparkContext

    def checkpointed(df: DataFrame):
        """localCheckpoint + the JVM RDD handles it persisted. DataFrame.
        unpersist() does NOT free checkpoint blocks (verified: the persistent
        RDD count stays put), so release needs the JavaRDD handles."""
        before = set(sc._jsc.getPersistentRDDs().keySet().toArray())
        out = df.localCheckpoint()
        jmap = sc._jsc.getPersistentRDDs()
        handles = [jmap.get(i) for i in jmap.keySet().toArray() if i not in before]
        return out, handles

    edges, live = checkpointed(
        pairs.select(F.col(src).cast("long").alias("src"),
                     F.col(dst).cast("long").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct())

    def signature(e: DataFrame):
        # `e` is always a _small_star output: already distinct with src > dst
        # on every row, so the canonical (least, greatest) re-projection and
        # its distinct shuffle are redundant — a single partial-aggregated
        # scan over the checkpointed blocks (no exchange beyond the final
        # 1-row merge) computes the same set identity. xxhash64(dst, src)
        # equals the old xxhash64(least, greatest).
        r = (e.agg(F.count("*").alias("n"),
                   F.sum(F.pmod(F.xxhash64("dst", "src"), F.lit(1 << 40))).alias("s"))
             .collect()[0])
        return (r["n"], r["s"])

    # canonical signature of the INPUT edge set: both star operators depend
    # only on the canonical (least, greatest) set, so if one round leaves
    # that set unchanged the input was already a fixpoint and the loop can
    # stop after round 0 instead of confirming with a second full round.
    # Near-dup graphs are often pure clone pairs (already stars) — this
    # halves their CC cost. Sound without a distinct: if the input holds
    # both orientations of an edge, its count exceeds the canonical set's
    # and the signatures simply cannot match (no false positive).
    r0 = (edges.agg(F.count("*").alias("n"),
                    F.sum(F.pmod(F.xxhash64(F.least("src", "dst"),
                                            F.greatest("src", "dst")),
                                 F.lit(1 << 40))).alias("s"))
          .collect()[0])
    prev = (r0["n"], r0["s"])
    for _ in range(max_rounds):
        old_live = live
        edges, live = checkpointed(_small_star(_large_star(edges)))
        # localCheckpoint is eager: the new edge set is materialized, so the
        # superseded round's blocks can go NOW — otherwise every round leaks
        # a persisted RDD that neither catalog.clearCache() nor
        # DataFrame.unpersist() touches, and long sessions degrade
        for h in old_live:
            h.unpersist()
        cur = signature(edges)
        if cur == prev:
            break
        prev = cur
    # the converged edge set backs the returned (lazy) DataFrame — register
    # its block handles in the checkpoint-only registry so a long session can
    # free them with release_checkpoints() AFTER collecting the result
    # (dedup.release_caches() no longer touches these: see _CKPT_CACHED)
    _CKPT_CACHED.extend(live)
    # converged state: a star — every non-root points at its component min
    comp = (edges.select(F.greatest("src", "dst").alias("id"),
                         F.least("src", "dst").alias("component"))
            .groupBy("id").agg(F.min("component").alias("component")))
    roots = comp.select(F.col("component").alias("id"), F.col("component")).distinct()
    return comp.unionByName(roots).distinct()


def dedup_clusters(df: DataFrame, pairs: DataFrame, id_col: str = "doc_id",
                   src: str = "ida", dst: str = "idb") -> DataFrame:
    """Full-corpus duplicate clustering: every row of `df` labeled with its
    cluster id (component min; singletons label themselves), plus the cluster
    size and a keep flag on the representative. One broadcast-sized join per
    corpus row — the expensive part is the pair graph, already bucketed."""
    from pyspark.sql import Window as W
    comp = connected_components(pairs, src, dst)
    labeled = (df.select(F.col(id_col).cast("long").alias("id"))
               .join(comp, "id", "left")
               .select("id", F.coalesce("component", F.col("id")).alias("cluster")))
    # cluster_size as a window count over the same key: one exchange instead
    # of the groupBy + join-back pair (identical values — count over the
    # unbounded partition frame IS the group size)
    return (labeled.withColumn("cluster_size", F.count("*").over(W.partitionBy("cluster")))
            .select(F.col("id").alias(id_col), "cluster", "cluster_size",
                    (F.col("id") == F.col("cluster")).alias("keep")))
