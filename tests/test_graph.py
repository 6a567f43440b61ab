"""PageRank: mass conservation, hand-computed values, dangling
redistribution, pure-Python differential, checkpoint invariance."""

import pytest
from pyspark.sql import functions as F

from cascalog_spark.functions import pagerank, release_pagerank_cache


def _py_pagerank(edges, nodes, d=0.85, iters=10):
    """Single-process replica of the exact formulation."""
    out = {}
    for s, t in edges:
        out.setdefault(s, []).append(t)
    n = len(nodes)
    r = {v: 1.0 / n for v in nodes}
    for _ in range(iters):
        dm = sum(r[v] for v in nodes if v not in out)
        nxt = {v: (1 - d) / n + d * dm / n for v in nodes}
        for s, ts in out.items():
            share = r[s] / len(ts)
            for t in ts:
                nxt[t] += d * share
        r = nxt
    return r


def test_mass_conservation_and_hand_values(spark):
    # A -> B, A -> C, B -> C, C dangling
    edges = spark.createDataFrame([("a", "b"), ("a", "c"), ("b", "c")],
                                  "src string, dst string")
    pr = pagerank(edges, iters=2, damping=0.85)
    got = {r["node"]: r["rank"] for r in pr.collect()}
    release_pagerank_cache(pr)
    exp = _py_pagerank([("a", "b"), ("a", "c"), ("b", "c")],
                       ["a", "b", "c"], iters=2)
    assert got.keys() == exp.keys()
    for v in exp:
        assert got[v] == pytest.approx(exp[v], abs=1e-12)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-12)


def test_mass_is_one_every_iteration_with_dangling(spark):
    edges = spark.createDataFrame(
        [(1, 2), (3, 2), (4, 2)], "src long, dst long")  # 2 dangles
    for it in (1, 3, 7):
        pr = pagerank(edges, iters=it)
        total = pr.agg(F.sum("rank")).first()[0]
        release_pagerank_cache(pr)
        assert total == pytest.approx(1.0, abs=1e-12)


def test_star_center_dominates_undirected(spark):
    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 9)], "src long, dst long")
    pr = pagerank(edges, iters=10, undirected=True)
    got = {r["node"]: r["rank"] for r in pr.collect()}
    release_pagerank_cache(pr)
    assert got[0] > max(v for k, v in got.items() if k != 0) * 3


def test_isolated_nodes_via_node_universe(spark):
    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    nodes = spark.createDataFrame([(i,) for i in range(5)], "id long")
    pr = pagerank(edges, nodes=nodes, iters=4)
    got = {r["node"]: r["rank"] for r in pr.collect()}
    release_pagerank_cache(pr)
    assert set(got) == {0, 1, 2, 3, 4}
    exp = _py_pagerank([(1, 2)], list(range(5)), iters=4)
    for v in exp:
        assert got[v] == pytest.approx(exp[v], abs=1e-12)
    # isolated nodes share the same baseline; the linked-to node wins
    assert got[0] == pytest.approx(got[3], abs=1e-12)
    assert got[2] > got[1] >= got[0]


def test_differential_on_real_neardup_graph(spark, sf_dir):
    from cascalog_spark.functions import minhash_lsh_candidates

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = minhash_lsh_candidates(docs, "doc_id").collect()
    edges = [(r["id_a"], r["id_b"]) for r in pairs]
    nodes = [r["doc_id"] for r in docs.select("doc_id").collect()]
    pr = pagerank(
        spark.createDataFrame(pairs, "id_a long, id_b long"),
        src_col="id_a", dst_col="id_b",
        nodes=docs.select("doc_id"), iters=3, undirected=True)
    got = {r["node"]: r["rank"] for r in pr.collect()}
    release_pagerank_cache(pr)
    und = edges + [(b, a) for a, b in edges]
    exp = _py_pagerank(und, nodes, iters=3)
    assert got.keys() == exp.keys()
    for v in exp:
        assert got[v] == pytest.approx(exp[v], rel=1e-9, abs=1e-12)


def test_checkpoint_cadence_does_not_change_results(spark):
    edges = spark.createDataFrame(
        [(i, (i * 3 + 1) % 10) for i in range(10)],
        "src long, dst long")
    a = pagerank(edges, iters=6, checkpoint_every=2)
    b = pagerank(edges, iters=6, checkpoint_every=0)
    ga = sorted((r["node"], round(r["rank"], 12)) for r in a.collect())
    gb = sorted((r["node"], round(r["rank"], 12)) for r in b.collect())
    release_pagerank_cache(a)
    release_pagerank_cache(b)
    assert ga == gb


def test_validation_and_empty(spark):
    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError, match="damping"):
        pagerank(edges, damping=1.0)
    with pytest.raises(ValueError, match="iters"):
        pagerank(edges, iters=-1)
    empty = spark.createDataFrame([], "src long, dst long")
    pr = pagerank(empty, iters=2)
    assert pr.count() == 0
    release_pagerank_cache(pr)


# ---- hypothesis fuzz: random digraphs vs the pure-Python replica ----

import os

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SET = settings(max_examples=int(os.environ.get("CSPARK_FUZZ", "4")),
                deadline=None,
                suppress_health_check=[
                    HealthCheck.function_scoped_fixture,
                    HealthCheck.too_slow])

_edges = st.lists(
    st.tuples(st.integers(min_value=0, max_value=7),
              st.integers(min_value=0, max_value=7)),
    min_size=1, max_size=20)


@given(edges=_edges, iters=st.integers(min_value=0, max_value=4),
       und=st.booleans())
@_SET
def test_pagerank_fuzz_vs_python(spark, edges, iters, und):
    """Any small digraph (self-loops, parallel edges, dangling nodes),
    any iteration count, directed or not: distributed == replica and
    mass is exactly 1."""
    df = spark.createDataFrame(edges, "src long, dst long")
    pr = pagerank(df, iters=iters, undirected=und, materialize=False)
    got = {r["node"]: r["rank"] for r in pr.collect()}
    e = edges + ([(b, a) for a, b in edges] if und else [])
    nodes = sorted({v for p in e for v in p})
    exp = _py_pagerank(e, nodes, iters=iters)
    assert got.keys() == exp.keys()
    for v in exp:
        assert got[v] == pytest.approx(exp[v], rel=1e-9, abs=1e-12)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_near_dedup_keep_central(spark, sf_dir):
    """keep='central' keeps exactly one member per duplicate cluster —
    the argmax-PageRank member (12dp, id tiebreak) — verified against a
    union-find + replica-pagerank reference on real near-dup docs."""
    from cascalog_spark.functions import (minhash_lsh_candidates,
                                          near_dedup)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    kept = {r["doc_id"] for r in
            near_dedup(docs, keep="central", pr_iters=5)
            .select("doc_id").collect()}
    pairs = [(r["id_a"], r["id_b"]) for r in
             minhash_lsh_candidates(docs, "doc_id").collect()]
    assert pairs, "fixture needs near-dup docs"
    # union-find clusters
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    clusters = {}
    for v in list(parent):
        clusters.setdefault(find(v), set()).add(v)
    # replica pagerank over the undirected pair graph
    und = pairs + [(b, a) for a, b in pairs]
    nodes = sorted({v for p in und for v in p})
    pr = _py_pagerank(und, nodes, iters=5)
    all_ids = {r["doc_id"] for r in docs.select("doc_id").collect()}
    expected_losers = set()
    for members in clusters.values():
        win = min(members, key=lambda v: (-round(pr[v], 12), v))
        expected_losers |= members - {win}
    assert kept == all_ids - expected_losers
    # one representative per cluster survived
    for members in clusters.values():
        assert len(members & kept) == 1


def test_near_dedup_keep_validation(spark, sf_dir):
    from cascalog_spark.functions import near_dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    with pytest.raises(ValueError, match="keep"):
        near_dedup(docs, keep="middle")


def _py_ppr(edges, nodes, p0, d=0.85, iters=10):
    out = {}
    for s, t in edges:
        out.setdefault(s, []).append(t)
    r = dict(p0)
    for _ in range(iters):
        dm = sum(r[v] for v in nodes if v not in out)
        nxt = {v: (1 - d) * p0[v] + d * dm * p0[v] for v in nodes}
        for s, ts in out.items():
            share = r[s] / len(ts)
            for t in ts:
                nxt[t] += d * share
    # note: d*share added AFTER the base — matches engine term grouping
        r = nxt
    return r


def test_personalized_pagerank_seed_expansion(spark):
    """PPR with a single seed: mass conserved, the seed and its graph
    neighborhood dominate far nodes, replica agrees."""
    # two chains from 0 and from 5; seed only node 0
    edges = [(0, 1), (1, 2), (2, 3), (5, 6), (6, 7)]
    df = spark.createDataFrame(edges, "src long, dst long")
    seeds = spark.createDataFrame([(0,)], "node long")
    nodes = spark.createDataFrame([(i,) for i in range(8)], "id long")
    pr = pagerank(df, nodes=nodes, iters=6, reset=seeds,
                  materialize=False)
    got = {r["node"]: r["rank"] for r in pr.collect()}
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
    # seed-side chain outranks the unseeded chain
    assert got[0] > got[5] and got[1] > got[6] and got[2] > got[7]
    assert got[5] == pytest.approx(0.0, abs=1e-12)  # unreachable, no p0
    p0 = {v: (1.0 if v == 0 else 0.0) for v in range(8)}
    exp = _py_ppr(edges, list(range(8)), p0, iters=6)
    for v in exp:
        assert got[v] == pytest.approx(exp[v], rel=1e-9, abs=1e-12)


def test_uniform_reset_equals_plain(spark):
    edges = spark.createDataFrame(
        [(i, (i * 3 + 1) % 9) for i in range(9)], "src long, dst long")
    seeds = spark.createDataFrame([(i, 2.5) for i in range(9)],
                                  "node long, w double")
    a = pagerank(edges, iters=4, materialize=False)
    b = pagerank(edges, iters=4, reset=seeds, reset_col="w",
                 materialize=False)
    ga = {r["node"]: r["rank"] for r in a.collect()}
    gb = {r["node"]: r["rank"] for r in b.collect()}
    for v in ga:
        assert gb[v] == pytest.approx(ga[v], abs=1e-12)


def test_reset_weight_validation(spark):
    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    zero = spark.createDataFrame([(1, 0.0)], "node long, w double")
    with pytest.raises(ValueError, match="reset weights"):
        pagerank(edges, reset=zero, reset_col="w")


def test_graph_report(spark):
    """Hand-built graph: 5 nodes (one isolated via explicit universe),
    a self-loop, a parallel edge, a degree-2 hub."""
    from cascalog_spark.functions import graph_report

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 2), (3, 1), (3, 1)],
        "src long, dst long")
    nodes = spark.createDataFrame([(i,) for i in range(5)], "id long")
    r = graph_report(edges, nodes=nodes).first()
    assert r["n_nodes"] == 5 and r["n_edges"] == 5
    assert r["n_isolated"] == 2          # 0 and 4 touch no edge
    assert r["n_self_loops"] == 1        # (2,2)
    assert r["n_parallel_edges"] == 1    # (3,1) twice
    assert r["max_out_degree"] == 2
    assert r["avg_out_degree"] == 1.0    # 5 out-edges / 5 nodes
    # undirected doubles edges and symmetrizes degrees
    ru = graph_report(edges, undirected=True).first()
    assert ru["n_edges"] == 10 and ru["n_nodes"] == 3


def test_weighted_pagerank_matches_python(spark):
    """Weighted walk vs a hand-rolled python reference on a small graph
    with non-uniform weights, a dangling node, and an isolated node."""
    edges = [(1, 2, 3.0), (1, 3, 1.0), (2, 3, 2.0), (4, 1, 5.0)]
    nodes = list(range(1, 6))  # 5 is isolated, 3 is dangling
    e = spark.createDataFrame(edges, "src long, dst long, w double")
    nd = spark.createDataFrame([(n,) for n in nodes], "id long")
    got = {r["node"]: r["rank"]
           for r in pagerank(e, nodes=nd, weight_col="w",
                             iters=4).collect()}

    # python reference
    n = len(nodes)
    deg = {}
    for s, _, w in edges:
        deg[s] = deg.get(s, 0.0) + w
    rank = {v: 1.0 / n for v in nodes}
    for _ in range(4):
        contrib = {v: 0.0 for v in nodes}
        for s, t, w in edges:
            contrib[t] += rank[s] * w / deg[s]
        dm = sum(rank[v] for v in nodes if v not in deg)
        rank = {v: 0.15 / n + 0.85 * (contrib[v] + dm / n)
                for v in nodes}
    for v in nodes:
        assert got[v] == pytest.approx(rank[v], abs=1e-12)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
    # unit weights == unweighted (exactly: *1.0 is a float no-op)
    e1 = spark.createDataFrame([(s, t, 1.0) for s, t, _ in edges],
                               "src long, dst long, w double")
    a = {r["node"]: r["rank"]
         for r in pagerank(e1, nodes=nd, weight_col="w",
                           iters=3).collect()}
    b = {r["node"]: r["rank"]
         for r in pagerank(e1.drop("w"), nodes=nd, iters=3).collect()}
    assert a == b


def test_pagerank_tol_early_stop(spark):
    """tol= stops the loop once the L1 delta converges; iters caps it.
    A symmetric 2-clique reaches its fixed point after one round (every
    node identical by symmetry), so round 2's delta is ~0 and the loop
    must exit well before the 50-iteration cap."""
    e = spark.createDataFrame([(1, 2), (2, 1), (3, 4), (4, 3)],
                              "src long, dst long")
    pr = pagerank(e, iters=50, tol=1e-9)
    assert pr._pagerank_iters <= 3          # converged, not capped
    ranks = [r["rank"] for r in pr.collect()]
    assert all(v == pytest.approx(0.25, abs=1e-12) for v in ranks)
    # tol loose enough to stop immediately still returns valid ranks
    pr2 = pagerank(e, iters=50, tol=10.0)
    assert pr2._pagerank_iters == 1
    assert sum(r["rank"] for r in pr2.collect()) == pytest.approx(1.0)
    # converged result equals the fixed-iteration result
    full = {r["node"]: r["rank"]
            for r in pagerank(e, iters=10).collect()}
    conv = {r["node"]: r["rank"] for r in pr.collect()}
    for v in full:
        assert conv[v] == pytest.approx(full[v], abs=1e-9)
    with pytest.raises(ValueError, match="tol"):
        pagerank(e, tol=0.0)


def test_ppr_out_of_universe_seed(spark):
    """A seed outside the node universe must not deflate teleport mass
    (ADVICE r6): in-universe seeds renormalize to full mass; an
    all-outside seed set raises."""
    e = spark.createDataFrame([(1, 2), (2, 1)], "src long, dst long")
    seeds_mixed = spark.createDataFrame([(1,), (99,)], "node long")
    pr = pagerank(e, reset=seeds_mixed, iters=3)
    assert sum(r["rank"] for r in pr.collect()) == pytest.approx(
        1.0, abs=1e-9)
    seeds_in = spark.createDataFrame([(1,)], "node long")
    a = {r["node"]: r["rank"]
         for r in pagerank(e, reset=seeds_in, iters=3).collect()}
    b = {r["node"]: r["rank"]
         for r in pagerank(e, reset=seeds_mixed, iters=3).collect()}
    for v in a:
        assert b[v] == pytest.approx(a[v], abs=1e-12)
    seeds_out = spark.createDataFrame([(99,)], "node long")
    with pytest.raises(ValueError, match="node universe"):
        pagerank(e, reset=seeds_out, iters=2)


def test_graph_report_empty_edges(spark):
    """Zero-edge graph: integer aggregates coalesce to 0, never NULL
    (ADVICE r6)."""
    from cascalog_spark.functions import graph_report

    edges = spark.createDataFrame([(1, 2)], "src long, dst long") \
                 .where("src > 100")
    nodes = spark.createDataFrame([(i,) for i in range(3)], "id long")
    r = graph_report(edges, nodes=nodes).first()
    assert r["n_nodes"] == 3 and r["n_edges"] == 0
    assert r["n_isolated"] == 3
    assert r["n_self_loops"] == 0
    assert r["n_parallel_edges"] == 0
    assert r["max_out_degree"] == 0
    assert r["avg_out_degree"] == 0.0
