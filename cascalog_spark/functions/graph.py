"""Link-graph centrality for corpus curation.

A training-data pipeline meets graphs in two places: the NEAR-DUP graph
(which copy of a duplicate cluster is the canonical one? — the most
central, not an arbitrary min-id) and SOURCE authority (pages/domains
linked from many well-linked places are better keep candidates than
orphans; the CommonCrawl-curation literature weights by exactly this).
``pagerank`` is the shared primitive: damped random-walk mass over an
edge list.

Scale shape: one shuffle per iteration (contributions grouped by
destination) plus a 1-row dangling-mass aggregate folded in-plan via a
broadcast cross join — rank state is node-sized, never edge-sized, and
no driver-side collection happens at any size.  The edge list and
degree table are persisted for the loop and released via
``release_pagerank_cache`` (same handle contract as ``tf_idf``).
Iteration lineage is cut with a ``localCheckpoint`` every round by
default — each round reads the previous ranks TWICE (contributions +
the dangling aggregate), so an uncut loop re-derives round k's frame
2^(rounds since the last cut) times: an exponential wall blowup the
scaling smoke caught at 5 iterations, not a linear plan-growth
nuisance.

The reference engine has no graph ops — extension tier (SURVEY.md §2
extension packs), sibling of the dedup family's connected components
(dedup.py star contraction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(edges: DataFrame, src_col: str = "src",
             dst_col: str = "dst", nodes: DataFrame | None = None,
             node_col: str | None = None, damping: float = 0.85,
             iters: int = 10, undirected: bool = False,
             checkpoint_every: int = 1,
             materialize: bool = True,
             reset: DataFrame | None = None,
             reset_col: str | None = None,
             weight_col: str | None = None,
             tol: float | None = None) -> DataFrame:
    """Damped PageRank over an edge list → ``(node, rank)``.

    ``r_{k+1}(v) = (1−d)/n + d·(Σ_{u→v} r_k(u)/deg(u) + D_k/n)`` where
    ``D_k`` is the total rank held by dangling nodes (no out-edges) —
    redistributed uniformly, so total rank mass is EXACTLY 1 every
    iteration (pinned in tests; a formulation that leaks dangling mass
    ranks sinks absurdly high).

    ``nodes`` (default: the distinct edge endpoints) fixes the node
    universe — pass the full corpus id table to give isolated documents
    their baseline rank instead of silently dropping them.
    ``undirected=True`` adds the reversed copy of every edge (the
    near-dup-graph case).  Edge multiplicity is respected (parallel
    edges contribute twice) — ``.distinct()`` upstream for simple-graph
    semantics.

    ``reset`` turns this into PERSONALIZED PageRank — the
    seed-expansion move in data curation: pass a frame of known-good
    nodes (first column = node id, optional ``reset_col`` weight,
    default 1), and the walk teleports back to the seeds instead of
    uniformly, so mass concentrates on the seeds' graph neighborhood:
    ``r_{k+1}(v) = (1−d)·p₀(v) + d·(Σ contribs + D_k·p₀(v))`` with
    ``p₀`` the normalized seed distribution (init state too).  A
    uniform reset over all nodes equals the plain formulation (pinned
    in tests to 1e-12; the two group float terms differently).

    ``weight_col`` makes the walk WEIGHTED: a src distributes its rank
    proportionally to edge weight (out-"degree" = sum of outgoing
    weights; zero/negative-total-weight sources count as dangling).
    The near-dup-graph use: weight by similarity so near-identical
    copies exchange more mass than borderline pairs.

    ``tol`` adds CONVERGENCE early-stop: after each round the L1 delta
    ``Σ|r_{k+1} − r_k|`` (one node-sized join + a 1-row aggregate — the
    same broadcast shape as the dangling term) is checked and the loop
    exits once it drops below ``tol``; ``iters`` becomes the cap.  The
    actual round count is surfaced as ``result._pagerank_iters`` —
    fixed ``iters`` either over-runs (wasted shuffles) or under-runs
    (unconverged ranks) on real dup graphs.
    """
    if not 0.0 < damping < 1.0:
        raise ValueError(f"pagerank: damping must be in (0, 1), "
                         f"got {damping}")
    if iters < 0:
        raise ValueError("pagerank: iters must be >= 0")
    if tol is not None and tol <= 0:
        raise ValueError("pagerank: tol must be > 0 (or None)")
    from pyspark import StorageLevel

    w = (F.col(weight_col).cast("double") if weight_col is not None
         else F.lit(1.0))
    e = edges.select(F.col(src_col).alias("__s"),
                     F.col(dst_col).alias("__t"), w.alias("__w"))
    if undirected:
        e = e.unionByName(e.select(F.col("__t").alias("__s"),
                                   F.col("__s").alias("__t"), "__w"))
    if nodes is not None:
        nc = node_col or nodes.columns[0]
        nd = nodes.select(F.col(nc).alias("node")).distinct()
    else:
        nd = (e.select(F.col("__s").alias("node"))
              .unionByName(e.select(F.col("__t").alias("node")))
              .distinct())
    caches = []
    if materialize:
        e = e.persist(StorageLevel.MEMORY_AND_DISK)
        nd = nd.persist(StorageLevel.MEMORY_AND_DISK)
        caches += [e, nd]
    n = nd.count()
    if n == 0:
        out = nd.withColumn("rank", F.lit(0.0))
        out._pagerank_cache = caches
        return out
    # weighted out-degree = Σ outgoing weights; a non-positive total
    # (all-zero weights) cannot distribute mass -> treated as dangling
    deg = (e.groupBy(F.col("__s").alias("node"))
           .agg(F.sum("__w").alias("__deg"))
           .where(F.col("__deg") > 0))
    if materialize:
        deg = deg.persist(StorageLevel.MEMORY_AND_DISK)
        caches.append(deg)
    if reset is not None:
        rc = reset_col
        rcols = reset.columns
        seed = reset.select(
            F.col(rcols[0]).alias("node"),
            (F.col(rc).cast("double") if rc else F.lit(1.0))
            .alias("__w"))
        # normalize by the IN-UNIVERSE weight total: a seed id absent
        # from the node universe must not deflate teleport mass (the
        # 'total rank mass is EXACTLY 1' invariant) — it is dropped
        # loudly instead (ADVICE r6)
        # eager=False: the weight-total action right below materializes
        # the checkpoint — one driver job instead of two
        seeded = (nd.join(seed, on="node", how="left")
                  .select("node", F.coalesce(F.col("__w"), F.lit(0.0))
                          .alias("__w"))
                  .localCheckpoint(eager=False))
        wtot = seeded.agg(F.sum("__w").alias("t")).first()["t"]
        if not wtot or wtot <= 0:
            raise ValueError(
                "pagerank: reset weights must sum > 0 inside the node "
                "universe — check that seed ids appear in nodes/edges")
        p0 = seeded.select("node", (F.col("__w")
                                    / F.lit(float(wtot))).alias("__p0"))
        ranks = p0.select("node", F.col("__p0").alias("rank"))
    else:
        p0 = None
        ranks = nd.withColumn("rank", F.lit(1.0 / n))
    base = (1.0 - damping) / n
    n_done = 0
    for i in range(iters):
        withdeg = ranks.join(deg, on="node", how="left")
        contrib = (e.join(withdeg.where(F.col("__deg").isNotNull()),
                          on=[e["__s"] == withdeg["node"]])
                   .groupBy(F.col("__t").alias("node"))
                   .agg(F.sum(F.col("rank") * F.col("__w")
                              / F.col("__deg"))
                        .alias("__in")))
        dangling = (withdeg.where(F.col("__deg").isNull())
                    .agg(F.coalesce(F.sum("rank"), F.lit(0.0))
                         .alias("__dm")))
        merged = (nd.join(contrib, on="node", how="left")
                  .crossJoin(F.broadcast(dangling)))
        if p0 is not None:
            merged = merged.join(p0, on="node")
            newrank = (F.lit(1.0 - damping) * F.col("__p0")
                       + F.lit(damping)
                       * (F.coalesce(F.col("__in"), F.lit(0.0))
                          + F.col("__dm") * F.col("__p0")))
        else:
            newrank = (F.lit(base) + F.lit(damping)
                       * (F.coalesce(F.col("__in"), F.lit(0.0))
                          + F.col("__dm") / F.lit(float(n))))
        prev = ranks
        ranks = merged.select("node", newrank.alias("rank"))
        n_done = i + 1
        last = n_done == iters
        # each round consumes the previous ranks TWICE (contributions +
        # the dangling aggregate), so an unmaterialized loop re-derives
        # iteration k's frame 2^(rounds since last cut) times — measured
        # as an exponential wall blowup, not a constant factor.  The
        # node-sized localCheckpoint every round is the standard Pregel
        # superstep materialization; raise checkpoint_every only for
        # tiny graphs where per-job latency dominates.
        #
        # eager=False: the plan is truncated NOW (localCheckpoint wraps
        # the physical plan's RDD immediately), but the materializing
        # job is deferred to the first consumer — the tol delta action
        # below, or the next round's dangling broadcast job, or the
        # caller's action.  The first computing job caches every
        # partition (LocalRDDCheckpointData completes at job end), so
        # re-derivation is still impossible; this just removes one
        # driver job per iteration.
        if checkpoint_every and n_done % checkpoint_every == 0 \
                and (not last or tol is not None):
            ranks = ranks.localCheckpoint(eager=False)
        if tol is not None and not last:
            # L1 convergence check: node-sized join, 1-row aggregate —
            # one extra action per round, same broadcast shape as the
            # dangling term.  ranks is checkpointed above, so the delta
            # job and the next round share the materialized frame.
            delta = (ranks.join(prev.withColumnRenamed("rank", "__prev"),
                                on="node")
                     .agg(F.sum(F.abs(F.col("rank") - F.col("__prev")))
                          .alias("d")).first()["d"])
            if delta is not None and delta < tol:
                break
    ranks._pagerank_cache = caches
    ranks._pagerank_iters = n_done
    return ranks


def graph_report(edges: DataFrame, src_col: str = "src",
                 dst_col: str = "dst", nodes: DataFrame | None = None,
                 node_col: str | None = None,
                 undirected: bool = False) -> DataFrame:
    """One-row graph pre-flight before running CC / PageRank at scale:
    ``(n_nodes, n_edges, n_isolated, max_out_degree, avg_out_degree,
    n_self_loops, n_parallel_edges)`` — the numbers that predict
    trouble (a max-degree hub = a skewed contribution shuffle; parallel
    edges = double-counted walk mass; a large isolated fraction =
    wasted rank state unless that's intended).

    One edge aggregate + one degree aggregate; ``nodes`` widens the
    universe like ``pagerank`` does (isolated = nodes with no edge in
    EITHER direction of the, possibly undirected, edge set)."""
    e = edges.select(F.col(src_col).alias("__s"),
                     F.col(dst_col).alias("__t"))
    if undirected:
        e = e.unionByName(e.select(F.col("__t").alias("__s"),
                                   F.col("__s").alias("__t")))
    endpoints = (e.select(F.col("__s").alias("node"))
                 .unionByName(e.select(F.col("__t").alias("node")))
                 .distinct())
    if nodes is not None:
        nc = node_col or nodes.columns[0]
        nd = nodes.select(F.col(nc).alias("node")).distinct()
    else:
        nd = endpoints
    # coalesce: sums/max over ZERO edges are NULL in Spark, but the
    # report contract (and the DuckDB oracle) says exact integer
    # aggregates — an empty graph reads 0, not NULL (ADVICE r6)
    deg = (e.groupBy("__s").agg(F.count(F.lit(1)).alias("d")))
    degstats = deg.agg(
        F.coalesce(F.max("d"), F.lit(0)).alias("max_out_degree"),
        F.coalesce(F.sum("d"), F.lit(0)).alias("__degsum"))
    estats = e.agg(
        F.count(F.lit(1)).alias("n_edges"),
        F.coalesce(F.sum((F.col("__s") == F.col("__t")).cast("long")),
                   F.lit(0)).alias("n_self_loops"),
        (F.count(F.lit(1)) - F.countDistinct("__s", "__t"))
        .alias("n_parallel_edges"))
    nstats = (nd.join(endpoints.withColumn("__e", F.lit(1)),
                      on="node", how="left")
              .agg(F.count(F.lit(1)).alias("n_nodes"),
                   F.sum(F.when(F.col("__e").isNull(), 1).otherwise(0))
                   .alias("n_isolated")))
    return (nstats.crossJoin(F.broadcast(estats))
            .crossJoin(F.broadcast(degstats))
            .select("n_nodes", "n_edges", "n_isolated",
                    "max_out_degree",
                    F.round(F.col("__degsum")
                            / F.col("n_nodes"), 6).alias("avg_out_degree"),
                    "n_self_loops", "n_parallel_edges"))


def release_pagerank_cache(df: DataFrame) -> bool:
    """Unpersist the edge/node/degree frames a ``pagerank`` call pinned
    (same release contract as ``release_tfidf_cache``)."""
    caches = getattr(df, "_pagerank_cache", None)
    if not caches:
        return False
    for c in caches:
        c.unpersist()
    return True
