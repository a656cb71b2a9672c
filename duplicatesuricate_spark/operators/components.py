"""Connected components via alternating large-star / small-star (stage B8).

The reference clusters greedily: pick a random unassigned seed, match it,
majority-vote a gid, propagate (duplicatesuricate/merger.py:367-447).  That
is order-dependent and non-deterministic (np.random.choice at merger.py:386).
Its deterministic, order-independent closure over the SAME thresholded pair
set is connected components; we compute them with the large-star/small-star
algorithm of Kiveris et al., "Connected Components in MapReduce and Beyond"
(SoCC'14) — O(log^2 n) rounds, each round two shuffles, no driver-side
graph state, which is what survives at 10^12 edges where GraphX/NetworkX
style vertex programs do not.

    large-star: every node attaches its STRICTLY LARGER neighbors to the
                minimum of its neighborhood (including itself);
    small-star: every node attaches its not-larger neighbors (and itself)
                to that minimum.

Each iteration ``localCheckpoint``s the edge set — without it the lineage
(and the planner's stack) grows without bound.  Convergence = the edge
multiset is stable (checked with a cheap count + hash-sum aggregate, not a
full subtract).

``cluster_id`` is the component minimum doc_id — the deterministic stand-in
for the reference's sha1-of-first-seen gid (merger.py:439-447).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _large_star(edges: DataFrame) -> DataFrame:
    bi = edges.select(F.col("id_a").alias("u"), F.col("id_b").alias("v")).unionAll(
        edges.select(F.col("id_b").alias("u"), F.col("id_a").alias("v"))
    )
    mins = bi.groupBy("u").agg(F.min("v").alias("mv"))
    mins = mins.select("u", F.least("mv", "u").alias("m"))
    return (
        bi.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("id_a"), F.col("m").alias("id_b"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    oriented = edges.select(
        F.greatest("id_a", "id_b").alias("u"), F.least("id_a", "id_b").alias("v")
    ).where(F.col("u") != F.col("v"))
    mins = oriented.groupBy("u").agg(F.min("v").alias("m"))
    leaf = (
        oriented.join(mins, "u")
        .where(F.col("v") != F.col("m"))
        .select(F.col("v").alias("id_a"), F.col("m").alias("id_b"))
    )
    root = mins.select(F.col("u").alias("id_a"), F.col("m").alias("id_b"))
    return leaf.unionByName(root).distinct()


def _signature(edges: DataFrame) -> tuple[int, int]:
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.bit_xor(F.xxhash64("id_a", "id_b")), F.lit(0)).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])


def _driver_union_find(edges_rows: list) -> list[tuple[int, int]]:
    """Union-find on collected edges; labels = component min (identical to
    the distributed algorithm's output)."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.setdefault(r, r) != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    for a, b in edges_rows:
        ra, rb = find(a), find(b)
        if ra != rb:
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb
    return [(n, find(n)) for n in parent]


def connected_components(
    pairs: DataFrame,
    max_iterations: int = 50,
    checkpoint: bool = True,
    driver_threshold: int = 2_000_000,
) -> DataFrame:
    """(id_a, id_b) edge list -> (doc_id, cluster_id) for every node that
    appears in an edge.  Nodes absent from ``pairs`` are singletons and are
    handled by the caller (left join + coalesce to own id).

    Size-adaptive: below ``driver_threshold`` edges the component labels
    are computed with driver-side union-find (the dup-pair set after
    thresholding is typically tiny relative to the corpus — paying 4+
    shuffles per large-star round for a few thousand edges is pure
    overhead); above it, the distributed large-star/small-star loop runs.
    Both paths emit identical labels (component min), so the switch is
    invisible to callers and to tests."""
    edges = pairs.select("id_a", "id_b").where(F.col("id_a") != F.col("id_b"))
    if driver_threshold > 0:
        # ONE driver job decides the gate AND fetches the edges: collect up
        # to threshold+1 rows via limit + Arrow toPandas.  The old
        # persist + count + toPandas shape paid two full jobs (plus a
        # cached table) to learn the same thing; CollectLimit additionally
        # ramps up partition-by-partition, so a small edge set costs one
        # task, not one task per cached partition.  If the probe overflows
        # (giant graph), the distributed loop below recomputes the edge
        # lineage once into its first localCheckpoint — the same single
        # pass the old count() spent on the gate.
        probe = edges.limit(driver_threshold + 1).toPandas()
        if len(probe) <= driver_threshold:
            # Arrow both ways: row-at-a-time py4j collect() / createDataFrame
            # serialize a few hundred thousand edges in tens of seconds of
            # pure driver time — toPandas + a pandas round-trip move the
            # same rows as two Arrow batches
            rows = list(zip(probe["id_a"].tolist(), probe["id_b"].tolist()))
            import pandas as pd

            out = pd.DataFrame(
                _driver_union_find(rows), columns=["doc_id", "cluster_id"]
            )
            spark = pairs.sparkSession
            return spark.createDataFrame(out, "doc_id long, cluster_id long")
    if checkpoint:
        edges = edges.localCheckpoint()
    prev_sig = None
    for _ in range(max_iterations):
        edges = _small_star(_large_star(edges))
        if checkpoint:
            edges = edges.localCheckpoint()
        sig = _signature(edges)
        if sig == prev_sig:
            break
        prev_sig = sig
    else:
        raise RuntimeError(f"connected_components: no fixpoint in {max_iterations} iters")

    # after convergence edges form stars (node -> component min); the root
    # itself appears only on the right side
    members = edges.select(F.col("id_a").alias("doc_id"), F.col("id_b").alias("cluster_id"))
    roots = edges.select(F.col("id_b").alias("doc_id"), F.col("id_b").alias("cluster_id"))
    return (
        members.unionByName(roots)
        .groupBy("doc_id")
        .agg(F.min("cluster_id").alias("cluster_id"))
    )


def assignments_with_singletons(corpus_ids: DataFrame, components: DataFrame) -> DataFrame:
    """corpus (doc_id, content_sha256) x components -> full assignment table;
    docs in no dup pair become their own cluster (reference semantics: a new
    gid is minted for unmatched seeds, merger.py:433-447 — here the mint is
    the doc's own id, deterministic)."""
    return corpus_ids.join(components, "doc_id", "left").select(
        "doc_id",
        "content_sha256",
        F.coalesce("cluster_id", "doc_id").alias("cluster_id"),
    )
