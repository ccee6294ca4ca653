"""Iterative connected components — large-star / small-star.

The clustering stage (S6) the reference leaves implicit (mentions linked to
the same QID are the same entity; see SURVEY.md §0).  Algorithm: Kiveris et
al., "Connected Components in MapReduce and Beyond" (the one GraphFrames
uses) — alternating large-star / small-star contractions; converges in
O(log^2 n) rounds and handles high-degree hubs (promiscuous alias keys) by
design.

Pure DataFrame implementation:
  - node ids are int64 (callers hash string keys via ``xxhash64``);
  - each iteration costs two shuffles (groupBy on each orientation);
  - lineage is truncated per iteration with ``localCheckpoint`` so the plan
    doesn't grow unboundedly — iterative driver loops are the one place
    Catalyst can't help (SURVEY.md §4);
  - convergence detected via a cheap (count, xxhash-sum) fingerprint of the
    edge set — one aggregate per iteration, no exceptAll shuffle.

At 100 TB the per-iteration shuffle is the cost driver: components shrink
geometrically, AQE coalesces the shrinking shuffle outputs, and the edge set
after star-contraction is bounded by the node count, not the input pair
count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _canonical(edges: DataFrame, dedup: bool = True) -> DataFrame:
    """Undirected edge set: collapse to src < dst, drop self-loops, dedupe.

    ``dedup=False`` skips the duplicate-elimination exchange when the
    caller asserts pair-uniqueness (see ``connected_components``); the
    orientation/self-loop projection is shuffle-free either way."""
    out = (
        edges.select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
    )
    return out.dropDuplicates(["src", "dst"]) if dedup else out


def _large_star(edges: DataFrame) -> DataFrame:
    """For each u: connect every strictly-larger neighbor to min(Γ(u)∪{u}).

    Both orientations come from ONE scan via ``explode`` — the former
    ``edges.union(edges.reversed)`` form scanned the per-iteration edge
    checkpoint twice per evaluation, and ``nbr`` is evaluated twice (the
    group-mins build and the join probe), so the union form cost 4 full
    checkpoint scans per large-star where this costs 2 (measured in the r5
    per-stage profile: the CC-iteration stages each read 2x the checkpoint
    size as input)."""
    nbr = edges.select(
        F.explode(
            F.array(
                F.struct(F.col("src").alias("u"), F.col("dst").alias("v")),
                F.struct(F.col("dst").alias("u"), F.col("src").alias("v")),
            )
        ).alias("p")
    ).select(F.col("p.u").alias("src"), F.col("p.v").alias("dst"))
    mins = nbr.groupBy("src").agg(
        F.least(F.first("src"), F.min("dst")).alias("min_nbr")
    )
    return (
        nbr.join(mins, "src")
        .where(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("min_nbr").alias("dst"))
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient src >= dst; for each u connect all smaller neighbors (and u)
    to the minimum of that set.

    The two output rows per joined edge ((dst -> m) and (src -> m)) come
    from ONE evaluation of the join via ``explode`` — the former
    two-branch union re-executed ``oriented.join(mins)`` once per branch
    (the r5 per-stage profile showed the join's shuffle output read 3x
    per iteration: once by each union branch of small-star, once by the
    next iteration's canonicalize)."""
    oriented = edges.select(
        F.greatest("src", "dst").alias("src"),
        F.least("src", "dst").alias("dst"),
    )
    mins = oriented.groupBy("src").agg(
        F.least(F.first("src"), F.min("dst")).alias("min_nbr")
    )
    return (
        oriented.join(mins, "src")
        .select(
            F.explode(F.array(F.col("dst"), F.col("src"))).alias("src"),
            F.col("min_nbr").alias("dst"),
        )
    )


def _is_star_shaped(edges: DataFrame) -> bool:
    """True iff the canonical edge set is already the CC fixpoint.

    The large-star/small-star fixpoint is exactly the star form: every
    edge is (component_min = src, member = dst), i.e. each ``dst``
    appears exactly once and never as a ``src``.  Assignment graphs
    (mention -> entity with entities numbered below mentions, each
    mention keeping one winner) arrive in this form, so the O(log n)
    loop — ~6 exchanges for the no-op confirm pass alone — is skippable
    after ONE cheap role-count aggregate (r6, guide §2.4).  For
    non-star inputs the check costs one aggregate over 2|E| slim rows
    and the loop proceeds unchanged."""
    roles = edges.select(
        F.explode(
            F.array(
                F.struct(F.col("src").alias("node"),
                         F.lit(0).alias("is_dst")),
                F.struct(F.col("dst").alias("node"),
                         F.lit(1).alias("is_dst")),
            )
        ).alias("r")
    ).select(F.col("r.node").alias("node"), F.col("r.is_dst").alias("is_dst"))
    bad = (
        roles.groupBy("node")
        .agg(F.sum("is_dst").alias("nd"), F.count("*").alias("n"))
        # a dst that repeats, or a node that is both dst and src
        .where((F.col("nd") > 1) | ((F.col("nd") > 0) & (F.col("n") > F.col("nd"))))
        .limit(1)
    )
    return len(bad.take(1)) == 0


def _fingerprint(edges: DataFrame) -> tuple:
    row = edges.agg(
        F.count("*").alias("n"),
        F.bit_xor(F.xxhash64("src", "dst")).alias("h"),
    ).first()
    return (row["n"], row["h"])


def connected_components(
    edges: DataFrame,
    max_iterations: int = 25,
    emit_isolated: bool = True,
    workdir: str | None = None,
    edges_unique: bool = False,
) -> DataFrame:
    """Edges ``(src:long, dst:long)`` -> ``(node:long, component:long)``.

    ``component`` = minimum node id in the component (deterministic label).
    Nodes appearing only in self-loops / isolated still get a row.

    ``emit_isolated=False`` is a caller assertion that every node it cares
    about has a non-self-loop edge (true for assignment graphs where each
    kept mention has exactly one entity edge) OR that the caller coalesces
    missing nodes itself (``coalesce(component, node)`` after a left
    join, as the cluster stages do).  It skips the node-set
    union+distinct+left-join — three shuffles over 2x the edge count.

    ``edges_unique=True`` is a caller assertion that no (src, dst) pair
    repeats (in either orientation), so the canonicalization skips its
    dedup exchange (r6).  The assertion is safe even when wrong: a
    duplicate edge fails the star-shaped fast-path check (repeated dst),
    and the iteration loop re-canonicalizes WITH dedup every round, so
    results are unchanged — only the fast path's benefit is lost.

    ``workdir`` (r3 VERDICT missing #4): per-iteration state lands as a
    durable manifest-validated snapshot instead of an executor-memory
    ``localCheckpoint``, so a driver/executor loss mid-loop resumes from
    the last completed iteration rather than restarting CC.  Resume keys
    on the INPUT's canonical-edge fingerprint — a changed input invalidates
    every saved iteration.  Iteration snapshots are GC'd on successful
    completion (the caller's stage layer snapshots the *result*)."""
    import os
    import shutil

    from wdel_spark.sources.snapshot import (
        read_snapshot, snapshot_is_valid, write_snapshot)

    # materialize the input ONCE when it has two consumers (node set +
    # canonical edges).  With emit_isolated=False the canonical pass is
    # the only consumer, so the extra checkpoint would be a pure second
    # materialization of the (possibly expensive) upstream plan (r6).
    e0 = edges.select("src", "dst")
    nodes = None
    if emit_isolated:
        e0 = e0.localCheckpoint(eager=True)
        nodes = (
            e0.select(F.col("src").alias("node"))
            .union(e0.select(F.col("dst").alias("node")))
            .distinct()
        )
    e = _canonical(e0, dedup=not edges_unique)
    if workdir is None:
        # lazy persist: the star check's aggregate materializes the
        # cache, the emit reads it — one fewer standalone job than an
        # eager checkpoint; the loop path keeps eager checkpoints (it
        # needs lineage truncation per iteration)
        e = e.persist()
    else:
        e = e.localCheckpoint(eager=True)
    if workdir is None and _is_star_shaped(e):
        # already the fixpoint — skip the loop (and its fingerprints)
        return _emit_components(e, nodes, star=True)
    prev_fp = _fingerprint(e)
    start = 0
    if workdir is not None:
        spark = edges.sparkSession
        base = f"cc:{prev_fp[0]}:{prev_fp[1]}"
        iter_path = lambda i: os.path.join(workdir, f"cc_iter_{i:03d}")
        for i in range(max_iterations, 0, -1):
            if snapshot_is_valid(iter_path(i), "cc_iter", f"{base}:{i}"):
                e = read_snapshot(spark, iter_path(i)).localCheckpoint(
                    eager=True)
                prev_fp = _fingerprint(e)
                start = i
                break
    converged = False
    for it in range(start, max_iterations):
        e_new = _canonical(_small_star(_large_star(e)))
        if workdir is not None:
            write_snapshot(e_new, iter_path(it + 1), "cc_iter",
                           f"{base}:{it + 1}")
            e = read_snapshot(spark, iter_path(it + 1)).localCheckpoint(
                eager=True)
        else:
            e = e_new.localCheckpoint(eager=True)
        fp = _fingerprint(e)
        if fp == prev_fp:
            converged = True
            break
        prev_fp = fp
    if workdir is not None and os.path.isdir(workdir):
        # pin the converged edge set before deleting the files it reads.
        # localCheckpoint(eager) above already copied the blocks into the
        # block manager, so the parquet dirs are safe to drop.
        for name in os.listdir(workdir):
            if name.startswith("cc_iter_"):
                shutil.rmtree(os.path.join(workdir, name),
                              ignore_errors=True)
    return _emit_components(e, nodes, star=converged)


def _emit_components(e: DataFrame, nodes: DataFrame | None,
                     star: bool = False) -> DataFrame:
    # Fixpoint is star-shaped: canonical orientation makes every edge
    # (component_min=src, member=dst); the center maps to itself.
    # NB a "cheap" star emit (member rows unioned with distinct centers,
    # no groupBy) was A/B'd and REVERTED (r6): it removes the node-keyed
    # aggregate but also the hash partitioning the downstream
    # cluster-attach join reuses, so the exchange it saved reappeared —
    # larger — at the join.  ``star`` currently only records that the
    # fixpoint was verified; the groupBy emit is kept for its output
    # partitioning.
    del star
    comp = (
        e.select(F.col("dst").alias("node"),
                 F.col("src").alias("component"))
        .union(e.select(F.col("src").alias("node"),
                        F.col("src").alias("component")))
        .groupBy("node")
        .agg(F.min("component").alias("component"))
    )
    if nodes is None:
        return comp
    return (
        nodes.join(comp, "node", "left")
        .select("node", F.coalesce("component", "node").alias("component"))
    )


def incremental_components(
    prev: DataFrame | None,
    new_edges: DataFrame,
    max_iterations: int = 25,
) -> DataFrame:
    """Merge a NEW edge batch into an existing component assignment
    without reprocessing the historical edge log.

    Prior state compresses losslessly into star edges (node ->
    component): each prior component is connectivity-equivalent to its
    star, and the component label (its min node id) is itself a member
    node, so CC over (stars ∪ new_edges) produces exactly the partition
    and labels that CC over (full history ∪ new_edges) would.  Streaming
    state is therefore O(live nodes), not O(edges ever seen) — the
    incremental-CC operator round 1 left as a placeholder
    (stream_pipeline re-clustered the full log each trigger)."""
    if prev is None:
        return connected_components(new_edges, max_iterations)
    stars = prev.select(
        F.col("node").alias("src"), F.col("component").alias("dst"))
    merged = stars.unionByName(new_edges.select("src", "dst"))
    return connected_components(merged, max_iterations)
