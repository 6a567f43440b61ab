"""Behavioral analytics (functions/behavior.py): funnel progression,
cohort retention, transition matrix — plus ngram_novelty (text.py).

Reference shape: these are the sorted-buffer queries of api_test.clj
(defbufferfn with :sort over per-user event tuples); the tests pin the
window rewrites to hand-computed expectations on small fixed data.
"""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from cascalog_spark.functions import (funnel_report, funnel_stages,
                                      ngram_novelty, retention_cohorts,
                                      transition_matrix)


def _ts(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture()
def funnel_df(spark):
    rows = [
        # u1: clean signup -> click -> purchase
        (1, _ts("2024-01-01T00:00:00"), "signup"),
        (1, _ts("2024-01-01T01:00:00"), "click"),
        (1, _ts("2024-01-01T02:00:00"), "purchase"),
        # u2: purchase BEFORE signup must not count; no click afterwards
        (2, _ts("2024-01-01T00:00:00"), "purchase"),
        (2, _ts("2024-01-01T01:00:00"), "signup"),
        # u3: click at the exact signup timestamp -> strictly-later rule
        # rejects it; the later click counts
        (3, _ts("2024-01-02T00:00:00"), "signup"),
        (3, _ts("2024-01-02T00:00:00"), "click"),
        (3, _ts("2024-01-02T05:00:00"), "click"),
        # u4: only noise events -> filtered out entirely (no row)
        (4, _ts("2024-01-01T00:00:00"), "view"),
        # u5: second stage outside a 1h horizon
        (5, _ts("2024-01-03T00:00:00"), "signup"),
        (5, _ts("2024-01-03T02:00:00"), "click"),
    ]
    return spark.createDataFrame(rows, ["user_id", "ts", "event_type"])


STAGES = ["signup", "click", "purchase"]


def test_funnel_stages_semantics(funnel_df):
    out = {r["user_id"]: r for r in
           funnel_stages(funnel_df, "ts", "user_id", "event_type",
                         STAGES).collect()}
    assert set(out) == {1, 2, 3, 5}
    assert out[1]["stage_reached"] == 3
    assert out[1]["ts_purchase"] == _ts("2024-01-01T02:00:00")
    # u2: purchase-before-signup does not complete the funnel
    assert out[2]["stage_reached"] == 1
    assert out[2]["ts_click"] is None and out[2]["ts_purchase"] is None
    # u3: equal-timestamp click rejected, later click accepted
    assert out[3]["ts_click"] == _ts("2024-01-02T05:00:00")
    assert out[3]["stage_reached"] == 2
    assert out[5]["stage_reached"] == 2


def test_funnel_horizon(funnel_df):
    out = {r["user_id"]: r for r in
           funnel_stages(funnel_df, "ts", "user_id", "event_type",
                         STAGES, horizon=3600.0).collect()}
    # u5's click is 2h after signup -> outside the 1h horizon
    assert out[5]["stage_reached"] == 1
    # u1's chain is within 2h but click at +1h / purchase at +2h:
    # purchase exceeds the horizon measured from stage 0
    assert out[1]["stage_reached"] == 2


def test_funnel_report(funnel_df):
    rep = {r["stage"]: r for r in
           funnel_report(funnel_df, "ts", "user_id", "event_type",
                         STAGES).collect()}
    assert rep["signup"]["n_users"] == 4
    assert rep["click"]["n_users"] == 3
    assert rep["purchase"]["n_users"] == 1
    assert rep["click"]["conv_from_prev"] == 0.75
    assert rep["purchase"]["conv_from_first"] == 0.25
    assert rep["signup"]["conv_from_prev"] == 1.0


def test_funnel_validation(funnel_df):
    with pytest.raises(ValueError):
        funnel_stages(funnel_df, "ts", "user_id", "event_type", [])
    with pytest.raises(ValueError):
        funnel_stages(funnel_df, "ts", "user_id", "event_type",
                      ["a", "a"])


def test_funnel_single_shuffle(funnel_df):
    plan = funnel_stages(funnel_df, "ts", "user_id", "event_type",
                         STAGES)._jdf.queryExecution().executedPlan() \
        .toString()
    # chained windows + the dedup all reuse ONE user_id exchange
    assert plan.count("Exchange hashpartitioning") == 1


def test_retention_cohorts(spark):
    rows = [
        # cohort Mon 2024-01-01: u1 active weeks 0 and 1, u2 week 0 only
        (1, _ts("2024-01-02T10:00:00")),
        (1, _ts("2024-01-10T10:00:00")),
        (2, _ts("2024-01-03T10:00:00")),
        # cohort Mon 2024-01-08: u3 weeks 0 and 2
        (3, _ts("2024-01-08T00:00:00")),
        (3, _ts("2024-01-22T00:00:00")),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts"])
    out = {(r["cohort"].date().isoformat(), r["period_offset"]): r["n_active"]
           for r in retention_cohorts(df, "ts", "user_id").collect()}
    assert out[("2024-01-01", 0)] == 2
    assert out[("2024-01-01", 1)] == 1
    assert out[("2024-01-08", 0)] == 1
    assert out[("2024-01-08", 2)] == 1
    assert ("2024-01-08", 1) not in out

    daily = {(r["cohort"].date().isoformat(), r["period_offset"]): r["n_active"]
             for r in retention_cohorts(df, "ts", "user_id",
                                        period="day").collect()}
    assert daily[("2024-01-02", 0)] == 1
    assert daily[("2024-01-02", 8)] == 1
    with pytest.raises(ValueError):
        retention_cohorts(df, "ts", "user_id", period="year")


def test_transition_matrix(spark):
    rows = [
        (1, 1, "a"), (1, 2, "b"), (1, 3, "a"), (1, 4, "c"),
        (2, 1, "a"), (2, 2, "b"),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
    out = {(r["from_type"], r["to_type"]): (r["n"], r["p"])
           for r in transition_matrix(df, "ts", "user_id",
                                      "event_type").collect()}
    assert out[("a", "b")] == (2, 0.666667)
    assert out[("a", "c")] == (1, 0.333333)
    assert out[("b", "a")] == (1, 1.0)
    assert ("c", "a") not in out  # c is u1's last event
    raw = transition_matrix(df, "ts", "user_id", "event_type",
                            normalize=False)
    assert "p" not in raw.columns


def test_transition_matrix_tie_cols(spark):
    # equal timestamps: tie_cols make the order (and thus the counts)
    # deterministic
    rows = [(1, 5, 10, "a"), (1, 5, 11, "b"), (1, 5, 12, "c")]
    df = spark.createDataFrame(rows,
                               ["user_id", "ts", "event_id", "event_type"])
    out = {(r["from_type"], r["to_type"]): r["n"]
           for r in transition_matrix(df, "ts", "user_id", "event_type",
                                      tie_cols=["event_id"],
                                      normalize=False).collect()}
    assert out == {("a", "b"): 1, ("b", "c"): 1}


def test_ngram_novelty(spark):
    rows = [
        (0, "the quick brown fox jumps"),       # all shingles first here
        (1, "the quick brown fox jumps"),       # exact dup -> novelty 0
        (2, "the quick brown cat sleeps now"),  # partial overlap
        (3, None),                              # NULL text -> absent
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in
           ngram_novelty(df, "text", "doc_id", k=3).collect()}
    assert set(out) == {0, 1, 2}
    assert out[0]["novelty"] == 1.0
    assert out[1]["novelty"] == 0.0
    assert out[1]["n_shingles"] == out[0]["n_shingles"] == 3
    # doc 2: shingles {the quick brown, quick brown cat, brown cat
    # sleeps, cat sleeps now} — only the first is previously seen
    assert out[2]["n_shingles"] == 4
    assert out[2]["n_novel"] == 3
    assert out[2]["novelty"] == 0.75


def test_leakage_free_split(spark):
    from cascalog_spark.functions import leakage_free_split
    from cascalog_spark.functions.corpus import split_corpus

    docs = spark.createDataFrame([(i, f"d{i}") for i in range(200)],
                                 ["doc_id", "text"])
    # two clusters (0-3 chained, 10-11) + singletons
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (10, 11)], ["id_a", "id_b"])
    w = {"train": 8, "val": 1, "test": 1}
    out = {r["doc_id"]: r["split"]
           for r in leakage_free_split(docs, pairs, w).collect()}
    assert len(out) == 200
    # leakage property: every cluster member shares one split
    assert len({out[i] for i in (0, 1, 2, 3)}) == 1
    assert out[10] == out[11]
    # singletons match the plain per-doc hash split (group = own id)
    plain = {r["doc_id"]: r["split"]
             for r in split_corpus(docs, w).collect()}
    for i in range(12, 200):
        assert out[i] == plain[i]
    # cluster members take the REPRESENTATIVE's hash (min id)
    assert out[0] == plain[0] and out[10] == plain[10]
    # deterministic across reruns
    again = {r["doc_id"]: r["split"]
             for r in leakage_free_split(docs, pairs, w).collect()}
    assert out == again


def test_ngram_novelty_incremental_fold_matches_oneshot(spark):
    """Folding ascending-id batches through the incremental op must
    reproduce the one-shot novelty scores exactly."""
    from cascalog_spark.functions import (ngram_novelty,
                                          ngram_novelty_incremental)

    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox naps"),
        (2, "a wholly original sentence with fresh words"),
        (3, "the quick brown fox jumps over the lazy dog"),
        (4, "fresh words appear again in a new mix"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    want = {r["doc_id"]: (r["n_shingles"], r["n_novel"], r["novelty"])
            for r in ngram_novelty(docs).collect()}
    index = None
    got = {}
    for lo, hi in [(0, 2), (2, 4), (4, 5)]:
        batch = docs.where((F.col("doc_id") >= lo)
                           & (F.col("doc_id") < hi))
        scored, index = ngram_novelty_incremental(batch, index)
        index = index.localCheckpoint()
        for r in scored.collect():
            got[r["doc_id"]] = (r["n_shingles"], r["n_novel"],
                                r["novelty"])
    assert got == want
    # the updated index is the full corpus shingle set
    from cascalog_spark.functions import novelty_index
    assert index.count() == novelty_index(docs).count()


def test_funnel_prior_fold_matches_oneshot(spark, funnel_df):
    """Feeding time-ordered batches through funnel_stages(prior=...)
    must reproduce the one-shot result exactly — including a chain
    split across batches and users untouched by later batches."""
    want = {r["user_id"]: tuple(r)
            for r in funnel_stages(funnel_df, "ts", "user_id",
                                   "event_type", STAGES).collect()}
    cuts = [_ts("2024-01-01T01:30:00"), _ts("2024-01-02T01:00:00")]
    batches = [
        funnel_df.where(F.col("ts") < cuts[0]),
        funnel_df.where((F.col("ts") >= cuts[0])
                        & (F.col("ts") < cuts[1])),
        funnel_df.where(F.col("ts") >= cuts[1]),
    ]
    state = None
    for b in batches:
        state = funnel_stages(b, "ts", "user_id", "event_type", STAGES,
                              prior=state).localCheckpoint()
    got = {r["user_id"]: tuple(r) for r in state.collect()}
    assert got == want

    # with horizon too (the cross-batch t0-anchored cutoff)
    want_h = {r["user_id"]: tuple(r)
              for r in funnel_stages(funnel_df, "ts", "user_id",
                                     "event_type", STAGES,
                                     horizon=3600.0).collect()}
    state = None
    for b in batches:
        state = funnel_stages(b, "ts", "user_id", "event_type", STAGES,
                              horizon=3600.0,
                              prior=state).localCheckpoint()
    got_h = {r["user_id"]: tuple(r) for r in state.collect()}
    assert got_h == want_h


def test_stream_funnel_maintenance(spark, tmp_path, funnel_df):
    """Streaming funnel state after draining ts-ordered micro-batches
    == one-shot funnel_stages."""
    from cascalog_spark.streaming import (read_funnel_state,
                                          stream_funnel_maintenance)

    cut = _ts("2024-01-02T00:30:00")
    src = str(tmp_path / "fun_src")
    for b in (funnel_df.where(F.col("ts") < cut),
              funnel_df.where(F.col("ts") >= cut)):
        b.coalesce(1).write.mode("append").parquet(src)
    sdf = (spark.readStream.schema(funnel_df.schema)
           .option("maxFilesPerTrigger", "1").parquet(src))
    state_dir = str(tmp_path / "fun_state")
    qy = stream_funnel_maintenance(
        sdf, state_dir, "ts", "user_id", "event_type", STAGES,
        checkpoint_dir=str(tmp_path / "fun_ckpt"))
    try:
        assert qy.awaitTermination(240)
    finally:
        qy.stop()
    got = {r["user_id"]: tuple(r)
           for r in read_funnel_state(spark, state_dir).collect()}
    want = {r["user_id"]: tuple(r)
            for r in funnel_stages(funnel_df, "ts", "user_id",
                                   "event_type", STAGES).collect()}
    assert got == want


def test_read_funnel_state_no_success_markers(spark, tmp_path):
    """Committers with marksuccessfuljobs=false (object-store default)
    write NO _SUCCESS files; the reader must fall back to accepting
    every partition rather than silently treating state as empty.
    When SOME partitions have markers, unmarked ones stay skipped."""
    import os

    from cascalog_spark.streaming import read_funnel_state

    d = str(tmp_path / "state")
    df1 = spark.createDataFrame([(1, "a")], "user_id int, s string")
    df2 = spark.createDataFrame([(2, "b")], "user_id int, s string")
    df1.write.parquet(f"{d}/batch=0")
    df2.write.parquet(f"{d}/batch=1")
    # no markers anywhere -> fallback reads the latest (batch=1)
    for b in ("batch=0", "batch=1"):
        os.remove(os.path.join(d, b, "_SUCCESS"))
    got = read_funnel_state(spark, d).collect()
    assert [(r["user_id"], r["s"]) for r in got] == [(2, "b")]
    # batch=0 committed with a marker -> uncommitted batch=1 is skipped
    open(os.path.join(d, "batch=0", "_SUCCESS"), "w").close()
    got = read_funnel_state(spark, d).collect()
    assert [(r["user_id"], r["s"]) for r in got] == [(1, "a")]


def test_stream_transition_maintenance(spark, tmp_path):
    """Drained streaming transition matrix == one-shot
    transition_matrix (within-batch + boundary pairs are exactly the
    global consecutive pairs under time-split batches)."""
    from cascalog_spark.streaming import (read_transition_counts,
                                          stream_transition_maintenance)

    rows = [(u, t, e, typ) for (u, t, e, typ) in [
        (1, 1, 0, "a"), (1, 2, 1, "b"), (1, 5, 2, "a"), (1, 9, 3, "c"),
        (2, 3, 4, "a"), (2, 8, 5, "b"),
        (3, 2, 6, "c"),                      # lone event: no pairs
        (3, 7, 7, "c"),                      # ...until batch 2
    ]]
    df = spark.createDataFrame(
        rows, "user_id long, ts long, event_id long, event_type string")
    src = str(tmp_path / "tr_src")
    for b in (df.where("ts < 5"), df.where("ts >= 5")):
        b.coalesce(1).write.mode("append").parquet(src)
    sdf = (spark.readStream.schema(df.schema)
           .option("maxFilesPerTrigger", "1").parquet(src))
    qy = stream_transition_maintenance(
        sdf, str(tmp_path / "tr_agg"), str(tmp_path / "tr_state"),
        "ts", "user_id", "event_type", tie_cols=["event_id"],
        checkpoint_dir=str(tmp_path / "tr_ckpt"))
    try:
        assert qy.awaitTermination(240)
    finally:
        qy.stop()
    got = {(r["from_type"], r["to_type"]): (r["n"], r["p"])
           for r in read_transition_counts(
               spark, str(tmp_path / "tr_agg")).collect()}
    want = {(r["from_type"], r["to_type"]): (r["n"], r["p"])
            for r in transition_matrix(df, "ts", "user_id",
                                       "event_type",
                                       tie_cols=["event_id"]).collect()}
    assert got == want
    assert got[("c", "c")] == (1, 1.0)  # the cross-batch boundary pair


def test_stream_retention_maintenance(spark, tmp_path):
    """Drained streaming retention triangle == one-shot
    retention_cohorts (first-seen timestamps frozen across batches)."""
    from cascalog_spark.streaming import (read_retention,
                                          stream_retention_maintenance)

    rows = [
        (1, _ts("2024-01-02T10:00:00")),
        (2, _ts("2024-01-03T10:00:00")),
        (1, _ts("2024-01-10T10:00:00")),   # u1 back in week 1
        (3, _ts("2024-01-08T00:00:00")),   # new user in batch 2
        (3, _ts("2024-01-22T00:00:00")),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts"])
    cut = _ts("2024-01-09T00:00:00")
    src = str(tmp_path / "ret_src")
    for b in (df.where(F.col("ts") < cut), df.where(F.col("ts") >= cut)):
        b.coalesce(1).write.mode("append").parquet(src)
    sdf = (spark.readStream.schema(df.schema)
           .option("maxFilesPerTrigger", "1").parquet(src))
    qy = stream_retention_maintenance(
        sdf, str(tmp_path / "ret_pairs"), str(tmp_path / "ret_state"),
        "ts", "user_id", period="week",
        checkpoint_dir=str(tmp_path / "ret_ckpt"))
    try:
        assert qy.awaitTermination(240)
    finally:
        qy.stop()
    got = {(r["cohort"], r["period_offset"]): r["n_active"]
           for r in read_retention(
               spark, str(tmp_path / "ret_pairs")).collect()}
    want = {(r["cohort"], r["period_offset"]): r["n_active"]
            for r in retention_cohorts(df, "ts", "user_id",
                                       "week").collect()}
    assert got == want
    # u1's week-1 return crossed the batch cut: cohort anchored to the
    # FROZEN first-seen timestamp, not the batch-local minimum
    assert got[(_ts("2024-01-01T00:00:00"), 1)] == 1


def test_prune_state_snapshots(spark, tmp_path, funnel_df):
    from cascalog_spark.streaming import (prune_state_snapshots,
                                          read_funnel_state,
                                          stream_funnel_maintenance)

    cut = _ts("2024-01-02T00:30:00")
    src = str(tmp_path / "pr_src")
    for b in (funnel_df.where(F.col("ts") < cut),
              funnel_df.where(F.col("ts") >= cut)):
        b.coalesce(1).write.mode("append").parquet(src)
    sdf = (spark.readStream.schema(funnel_df.schema)
           .option("maxFilesPerTrigger", "1").parquet(src))
    state_dir = str(tmp_path / "pr_state")
    qy = stream_funnel_maintenance(
        sdf, state_dir, "ts", "user_id", "event_type", STAGES,
        checkpoint_dir=str(tmp_path / "pr_ckpt"))
    try:
        assert qy.awaitTermination(240)
    finally:
        qy.stop()
    before = {r["user_id"]: tuple(r)
              for r in read_funnel_state(spark, state_dir).collect()}
    assert prune_state_snapshots(state_dir) == 1  # two snapshots -> one
    after = {r["user_id"]: tuple(r)
             for r in read_funnel_state(spark, state_dir).collect()}
    assert after == before
    assert prune_state_snapshots(state_dir) == 0  # idempotent
    import pytest as _pt
    with _pt.raises(ValueError):
        prune_state_snapshots(state_dir, keep_latest=0)


def test_funnel_predicate_stages(spark, funnel_df):
    """Stages given as (name, Column) predicates: equality stages and
    arbitrary per-event conditions mix in one funnel."""
    ev = funnel_df.withColumn("value",
                              F.col("user_id").cast("double") * 10)
    stages = ["signup",
              ("big_click", (F.col("event_type") == "click")
               & (F.col("value") >= 30))]
    out = {r["user_id"]: r for r in
           funnel_stages(ev, "ts", "user_id", "event_type",
                         stages).collect()}
    # u1's click has value 10 -> fails the predicate stage
    assert out[1]["stage_reached"] == 1
    assert out[1]["ts_big_click"] is None
    # u3 (value 30) passes with the strictly-later click
    assert out[3]["stage_reached"] == 2
    assert out[3]["ts_big_click"] == _ts("2024-01-02T05:00:00")
    rep = {r["stage"]: r["n_users"] for r in
           funnel_report(ev, "ts", "user_id", "event_type",
                         stages).collect()}
    assert rep == {"signup": 4, "big_click": 2}


def test_ref_corpus_nll(spark):
    """ref= trains the n-gram model on a CLEAN reference and scores the
    target against it: reference-like text scores lower NLL than text
    full of reference-unseen tokens, and self vs ref scoring differ."""
    import math

    from cascalog_spark.functions import bigram_nll, unigram_nll

    ref = spark.createDataFrame(
        [(i, "the cat sat on the mat") for i in range(4)],
        ["doc_id", "text"])
    tgt = spark.createDataFrame(
        [(0, "the cat sat"), (1, "zx qv jkl")], ["doc_id", "text"])
    out = {r["doc_id"]: r["nll"]
           for r in unigram_nll(tgt, ref=ref,
                                materialize=False).collect()}
    assert out[0] < out[1]
    # unseen-token NLL is exactly -ln(alpha / (total + alpha*|V|)):
    # ref total=24 tokens, |V|=5
    want = -math.log(0.5 / (24 + 0.5 * 5))
    assert abs(out[1] - round(want, 6)) < 1e-6
    bg = {r["doc_id"]: r["bigram_nll"]
          for r in bigram_nll(tgt, ref=ref, materialize=False).collect()}
    assert bg[0] < bg[1]


def test_decayed_agg(spark):
    import math

    from cascalog_spark.functions import decayed_agg

    rows = [(1, _ts("2024-01-01T00:00:00"), 10.0),
            (1, _ts("2024-01-02T00:00:00"), 10.0),
            (2, _ts("2024-01-02T00:00:00"), 4.0)]
    df = spark.createDataFrame(rows, ["user_id", "ts", "value"])
    out = {r["user_id"]: r["decayed"]
           for r in decayed_agg(df, "ts", ["user_id"], "value",
                                half_life=86400.0).collect()}
    # T = corpus max (Jan 2): u1 = 10*2^-1 + 10*2^0 = 15; u2 = 4
    assert out[1] == 15.0
    assert out[2] == 4.0
    # decayed COUNT (value_col=None)
    cnt = {r["user_id"]: r["decayed"]
           for r in decayed_agg(df, "ts", ["user_id"],
                                half_life=86400.0).collect()}
    assert cnt[1] == 1.5 and cnt[2] == 1.0
    # time-shift identity: S(T + h) == S(T) / 2
    at = _ts("2024-01-03T00:00:00")
    shifted = {r["user_id"]: r["decayed"]
               for r in decayed_agg(df, "ts", ["user_id"], "value",
                                    half_life=86400.0,
                                    at=at).collect()}
    assert abs(shifted[1] - out[1] / 2) < 1e-6
    import pytest as _pt
    with _pt.raises(ValueError):
        decayed_agg(df, "ts", ["user_id"], half_life=0)


def test_stream_decayed_maintenance(spark, tmp_path):
    """Drained streaming decayed state == one-shot decayed_agg: the
    standing value rescales to each batch's instant and adds the batch
    partial (time-shift identity fold)."""
    from cascalog_spark.functions import decayed_agg
    from cascalog_spark.streaming import (read_decayed,
                                          stream_decayed_maintenance)

    rows = [(1, _ts("2024-01-01T00:00:00"), 10.0),
            (2, _ts("2024-01-01T12:00:00"), 6.0),
            (1, _ts("2024-01-02T00:00:00"), 10.0),
            (3, _ts("2024-01-03T00:00:00"), 2.0)]
    df = spark.createDataFrame(rows, ["user_id", "ts", "value"])
    cut = _ts("2024-01-01T18:00:00")
    src = str(tmp_path / "dec_src")
    for b in (df.where(F.col("ts") < cut), df.where(F.col("ts") >= cut)):
        b.coalesce(1).write.mode("append").parquet(src)
    sdf = (spark.readStream.schema(df.schema)
           .option("maxFilesPerTrigger", "1").parquet(src))
    qy = stream_decayed_maintenance(
        sdf, str(tmp_path / "dec_state"), "ts", ["user_id"], "value",
        half_life=86400.0,
        checkpoint_dir=str(tmp_path / "dec_ckpt"))
    try:
        assert qy.awaitTermination(240)
    finally:
        qy.stop()
    got = {r["user_id"]: r["decayed"]
           for r in read_decayed(spark,
                                 str(tmp_path / "dec_state")).collect()}
    want = {r["user_id"]: r["decayed"]
            for r in decayed_agg(df, "ts", ["user_id"], "value",
                                 half_life=86400.0).collect()}
    assert got == want
    # hand value: at T = Jan 3, u1 = 10*2^-2 + 10*2^-1 = 7.5
    assert got[1] == 7.5



def test_null_key_state_folds(spark, tmp_path):
    """r8 eqNullSafe fixes: NULL-keyed groups must MERGE with their
    standing state across batches (streaming decayed + retention) and
    across prior folds (funnel, both formulations) — not accumulate a
    duplicate row per batch."""
    from cascalog_spark.functions import decayed_agg, retention_cohorts
    from cascalog_spark.streaming import (read_decayed, read_retention,
                                          stream_decayed_maintenance,
                                          stream_retention_maintenance)

    rows = [(1, _ts("2024-01-01T00:00:00"), 10.0),
            (None, _ts("2024-01-01T12:00:00"), 6.0),
            (1, _ts("2024-01-02T00:00:00"), 10.0),
            (None, _ts("2024-01-03T00:00:00"), 2.0)]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp, value double")
    cut = _ts("2024-01-01T18:00:00")
    src = str(tmp_path / "nsrc")
    for b in (df.where(F.col("ts") < cut), df.where(F.col("ts") >= cut)):
        b.coalesce(1).write.mode("append").parquet(src)
    sdf = (spark.readStream.schema(df.schema)
           .option("maxFilesPerTrigger", "1").parquet(src))
    qy = stream_decayed_maintenance(
        sdf, str(tmp_path / "nstate"), "ts", ["user_id"], "value",
        half_life=86400.0, checkpoint_dir=str(tmp_path / "nckpt"))
    try:
        assert qy.awaitTermination(240)
    finally:
        qy.stop()
    got = sorted(((r["user_id"], r["decayed"]) for r in
                  read_decayed(spark, str(tmp_path / "nstate")).collect()),
                 key=repr)
    want = sorted(((r["user_id"], r["decayed"]) for r in
                   decayed_agg(df, "ts", ["user_id"], "value",
                               half_life=86400.0).collect()), key=repr)
    assert got == want  # exactly ONE NULL-key row, value merged

    sdf2 = (spark.readStream.schema(df.schema)
            .option("maxFilesPerTrigger", "1").parquet(src))
    qy2 = stream_retention_maintenance(
        sdf2, str(tmp_path / "rpairs"), str(tmp_path / "rstate"),
        "ts", "user_id", period="day",
        checkpoint_dir=str(tmp_path / "rckpt"))
    try:
        assert qy2.awaitTermination(240)
    finally:
        qy2.stop()
    got_r = sorted(map(tuple, read_retention(
        spark, str(tmp_path / "rpairs")).collect()))
    want_r = sorted(map(tuple, retention_cohorts(
        df, "ts", "user_id", "day").collect()))
    assert got_r == want_r

    # funnel prior fold with NULL users, both formulations
    ev = [(1, _ts("2024-01-01T00:00:00"), "signup"),
          (None, _ts("2024-01-01T01:00:00"), "signup"),
          (1, _ts("2024-01-02T00:00:00"), "click"),
          (None, _ts("2024-01-02T01:00:00"), "click")]
    fdf = spark.createDataFrame(ev, "user_id int, ts timestamp, event_type string")
    want_f = sorted((tuple(r) for r in funnel_stages(
        fdf, "ts", "user_id", "event_type", STAGES).collect()), key=repr)
    fcut = _ts("2024-01-01T18:00:00")
    for safe in (False, True):
        st = funnel_stages(fdf.where(F.col("ts") < fcut), "ts",
                           "user_id", "event_type", STAGES,
                           skew_safe=safe).localCheckpoint()
        st = funnel_stages(fdf.where(F.col("ts") >= fcut), "ts",
                           "user_id", "event_type", STAGES, prior=st,
                           skew_safe=safe)
        got_f = sorted((tuple(r) for r in st.collect()), key=repr)
        assert got_f == want_f, f"skew_safe={safe}"


# -- hypothesis differential: funnel vs a pure-Python fold ------------------

import os as _os

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_events = st.lists(
    st.tuples(st.integers(0, 4),              # user
              st.integers(0, 50),             # ts (seconds, ties likely)
              st.sampled_from(["a", "b", "c", "x"])),
    min_size=0, max_size=40)


def _py_funnel(rows, stages, horizon=None):
    """Reference model: closed-form chained minima per user."""
    out = {}
    users = {u for u, _, s in rows if s in stages}
    for u in users:
        evs = [(t, s) for uu, t, s in rows if uu == u]
        reach = []
        prev = None
        for i, s in enumerate(stages):
            cand = [t for t, ss in evs if ss == s
                    and (i == 0 or (prev is not None and t > prev))
                    and (i == 0 or horizon is None
                         or (reach[0] is not None
                             and t - reach[0] <= horizon))]
            cur = min(cand) if cand and (i == 0 or prev is not None) \
                else None
            reach.append(cur)
            prev = cur
        out[u] = tuple(reach) + (sum(r is not None for r in reach),)
    return out


@settings(max_examples=int(_os.environ.get("CSPARK_FUZZ", "4")),
          deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.function_scoped_fixture])
@given(data=_events, horizon=st.sampled_from([None, 10.0]))
def test_funnel_differential(spark, data, horizon):
    stages = ["a", "b", "c"]
    df = spark.createDataFrame(
        [(u, float(t), s) for u, t, s in data] or [(0, 0.0, "x")],
        "user_id long, ts double, event_type string")
    got = {r["user_id"]: (r["ts_a"], r["ts_b"], r["ts_c"],
                          r["stage_reached"])
           for r in funnel_stages(df, "ts", "user_id", "event_type",
                                  stages, horizon=horizon).collect()}
    want = _py_funnel([(u, float(t), s) for u, t, s in data]
                      or [(0, 0.0, "x")], stages, horizon)
    assert got == want


@settings(max_examples=int(_os.environ.get("CSPARK_FUZZ", "4")),
          deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.function_scoped_fixture])
@given(data=st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 10),
              st.sampled_from(["a", "b", "c"])),
    min_size=0, max_size=30))
def test_transition_differential(spark, data):
    """transition_matrix vs a pure-Python sort-and-pair model — equal
    timestamps resolved by the tie column (the synthetic event id)."""
    rows = [(u, float(t), i, s) for i, (u, t, s) in enumerate(data)]
    df = spark.createDataFrame(
        rows or [(0, 0.0, 0, "a")],
        "user_id long, ts double, event_id long, event_type string")
    got = {(r["from_type"], r["to_type"]): r["n"]
           for r in transition_matrix(df, "ts", "user_id", "event_type",
                                      tie_cols=["event_id"],
                                      normalize=False).collect()}
    want = {}
    byuser = {}
    for u, t, i, s in (rows or [(0, 0.0, 0, "a")]):
        byuser.setdefault(u, []).append((t, i, s))
    for evs in byuser.values():
        evs.sort()
        for (_, _, s1), (_, _, s2) in zip(evs, evs[1:]):
            want[(s1, s2)] = want.get((s1, s2), 0) + 1
    assert got == want


def test_funnel_skew_safe_matches_window(spark, funnel_df):
    """skew_safe=True (k hash-aggregate passes, AQE-splittable joins)
    must equal the window formulation row-for-row — plain, with
    horizon, with predicate-tuple stages, and with a prior fold."""
    base = {r["user_id"]: tuple(r)
            for r in funnel_stages(funnel_df, "ts", "user_id",
                                   "event_type", STAGES).collect()}
    got = {r["user_id"]: tuple(r)
           for r in funnel_stages(funnel_df, "ts", "user_id",
                                  "event_type", STAGES,
                                  skew_safe=True).collect()}
    assert got == base

    for hz in (3600.0, 86400.0):
        w = {r["user_id"]: tuple(r)
             for r in funnel_stages(funnel_df, "ts", "user_id",
                                    "event_type", STAGES,
                                    horizon=hz).collect()}
        s = {r["user_id"]: tuple(r)
             for r in funnel_stages(funnel_df, "ts", "user_id",
                                    "event_type", STAGES, horizon=hz,
                                    skew_safe=True).collect()}
        assert s == w

    pred_stages = [("signup", F.col("event_type") == "signup"),
                   ("any_next", F.col("event_type").isin("click",
                                                         "purchase"))]
    w = {r["user_id"]: tuple(r)
         for r in funnel_stages(funnel_df, "ts", "user_id",
                                "event_type", pred_stages).collect()}
    s = {r["user_id"]: tuple(r)
         for r in funnel_stages(funnel_df, "ts", "user_id",
                                "event_type", pred_stages,
                                skew_safe=True).collect()}
    assert s == w

    # prior fold: each batch folded with skew_safe must equal the
    # one-shot window result (same contract as the window prior path)
    cut = _ts("2024-01-01T12:00:00")
    b1 = funnel_df.where(F.col("ts") < cut)
    b2 = funnel_df.where(F.col("ts") >= cut)
    st = funnel_stages(b1, "ts", "user_id", "event_type", STAGES,
                       skew_safe=True).localCheckpoint()
    st = funnel_stages(b2, "ts", "user_id", "event_type", STAGES,
                       prior=st, skew_safe=True)
    got = {r["user_id"]: tuple(r) for r in st.collect()}
    assert got == base


def test_retention_skew_safe_matches_window(spark, funnel_df):
    # Include NULL-user rows: the window form treats NULL as one
    # cohort group, so the skew_safe groupBy+join-back must keep them
    # too (eqNullSafe join, not a plain equi-join that drops NULLs).
    nulls = spark.createDataFrame(
        [(None, _ts("2024-01-01T00:00:00"), "signup"),
         (None, _ts("2024-01-15T00:00:00"), "click")],
        funnel_df.schema)
    df = funnel_df.unionByName(nulls)
    for period in ("day", "week", "month"):
        w = sorted(map(tuple, retention_cohorts(
            df, "ts", "user_id", period).collect()))
        s = sorted(map(tuple, retention_cohorts(
            df, "ts", "user_id", period,
            skew_safe=True).collect()))
        assert s == w
    # The NULL user spans two weeks -> must produce an offset-2 cell.
    wk = retention_cohorts(df, "ts", "user_id", "week",
                           skew_safe=True).collect()
    assert any(r["period_offset"] == 2 for r in wk)


def test_funnel_skew_safe_plan_no_window(spark, funnel_df):
    """The skew_safe plan must contain NO Window operator (that's the
    partition AQE can't split) — only hash aggregates and joins."""
    df = funnel_stages(funnel_df, "ts", "user_id", "event_type",
                       STAGES, skew_safe=True)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "HashAggregate" in plan


def test_event_ngrams_semantics(spark):
    """Hand-checked trigrams; n=2 must match transition_matrix counts
    under the same total order; n<2 rejected; NULL types dropped."""
    from cascalog_spark.functions import event_ngrams

    rows = [(1, 1, "a"), (1, 2, "b"), (1, 3, "a"), (1, 4, "b"),
            (2, 1, "a"), (2, 2, "b"), (2, 3, "a"),
            (3, 1, None), (3, 2, "x")]
    df = spark.createDataFrame(
        rows, "user_id int, ts int, event_type string")
    got = {r["gram"]: r["n_events"] for r in event_ngrams(
        df, "ts", "user_id", "event_type", n=3,
        tie_cols=["ts"]).collect()}
    # u1: a b a, b a b; u2: a b a  -> a->b->a x2, b->a->b x1
    assert got == {"a->b->a": 2, "b->a->b": 1}
    pruned = {r["gram"] for r in event_ngrams(
        df, "ts", "user_id", "event_type", n=3, tie_cols=["ts"],
        min_count=2).collect()}
    assert pruned == {"a->b->a"}

    bi = {r["gram"]: r["n_events"] for r in event_ngrams(
        df, "ts", "user_id", "event_type", n=2,
        tie_cols=["ts"]).collect()}
    tm = {f'{r["from_type"]}->{r["to_type"]}': r["n"]
          for r in transition_matrix(
              df.where(F.col("event_type").isNotNull()),
              "ts", "user_id", "event_type",
              tie_cols=["ts"], normalize=False).collect()}
    assert bi == tm

    import pytest as _pt
    with _pt.raises(ValueError, match="n must be"):
        event_ngrams(df, "ts", "user_id", "event_type", n=1)


def test_stream_ngram_maintenance(spark, tmp_path):
    """Drained streaming n-gram counts == one-shot event_ngrams —
    including a gram spanning THREE batches (middle batch holds a
    single event for that user) and a NULL-type row dropped like the
    one-shot op."""
    from cascalog_spark.functions import event_ngrams
    from cascalog_spark.streaming import (read_ngram_counts,
                                          stream_ngram_maintenance)

    rows = [(1, 1, "a"), (1, 2, "b"), (1, 3, "a"), (1, 4, "b"),
            (1, 5, "c"),
            (2, 1, "a"), (2, 4, "b"), (2, 6, "a"),  # 3-batch straddle
            (3, 2, "x"), (3, 7, None), (3, 8, "y")]
    df = spark.createDataFrame(rows,
                               "user_id int, ts int, event_type string")
    want = sorted(map(tuple, event_ngrams(
        df, "ts", "user_id", "event_type", n=3,
        tie_cols=["ts"]).collect()))
    src = str(tmp_path / "ng_src")
    for b in (df.where("ts < 3"), df.where("ts >= 3 and ts < 6"),
              df.where("ts >= 6")):
        b.coalesce(1).write.mode("append").parquet(src)
    sdf = (spark.readStream.schema(df.schema)
           .option("maxFilesPerTrigger", "1").parquet(src))
    q = stream_ngram_maintenance(
        sdf, str(tmp_path / "ng_agg"), str(tmp_path / "ng_state"),
        "ts", "user_id", "event_type", n=3, tie_cols=["ts"],
        checkpoint_dir=str(tmp_path / "ng_ckpt"))
    try:
        assert q.awaitTermination(240)
    finally:
        q.stop()
    got = sorted(map(tuple, read_ngram_counts(
        spark, str(tmp_path / "ng_agg")).collect()))
    assert got == want
    assert ("a->b->a", 2) in got  # u1's within + u2's 3-batch straddle


@settings(max_examples=int(_os.environ.get("CSPARK_FUZZ", "4")),
          deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.function_scoped_fixture])
@given(data=st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 10),
              st.sampled_from(["a", "b", "c"])),
    min_size=0, max_size=30),
    n=st.sampled_from([2, 3, 4]))
def test_event_ngrams_differential(spark, data, n):
    """event_ngrams vs a pure-Python sort-and-slide model (ties by the
    synthetic event id); also pins funnel skew_safe == window on the
    same fuzzed data."""
    from collections import Counter

    from cascalog_spark.functions import event_ngrams

    rows = [(u, float(t), i, s) for i, (u, t, s) in enumerate(data)]
    df = spark.createDataFrame(
        rows or [(0, 0.0, 0, "a")],
        "user_id long, ts double, event_id long, event_type string")
    got = {r["gram"]: r["n_events"] for r in event_ngrams(
        df, "ts", "user_id", "event_type", n=n,
        tie_cols=["event_id"]).collect()}
    want = Counter()
    src = rows or [(0, 0.0, 0, "a")]
    for u in {r[0] for r in src}:
        seq = [s for _, t, i, s in sorted(
            (r for r in src if r[0] == u), key=lambda r: (r[1], r[2]))]
        for j in range(len(seq) - n + 1):
            want["->".join(seq[j:j + n])] += 1
    assert got == dict(want)

    stages = ["a", "b", "c"]
    w = sorted((tuple(r) for r in funnel_stages(
        df, "ts", "user_id", "event_type", stages).collect()), key=repr)
    s = sorted((tuple(r) for r in funnel_stages(
        df, "ts", "user_id", "event_type", stages,
        skew_safe=True).collect()), key=repr)
    assert s == w
