"""Determinism-under-partitioning battery.

Every sampling/layout/mining operator in the repo claims its output is
a pure function of the data — independent of partition count, task
scheduling, and retries (the md5-threshold / exact-rank design rule).
The driver's oracle check runs each query ONCE, so it cannot see a
partitioning dependence; this battery runs the same driver queries
under two different shuffle-partition settings and requires identical
multisets.

A failure here means retries or a cluster resize would change training
data — the worst kind of 100 TB bug."""

import pytest

# the deterministic-by-design tier: sampling, mixing, layout, mining,
# staging — plus the fingerprint op whose whole job is this invariance
QUERIES = [
    "doc_split_assign",
    "doc_temperature_mixture",
    "doc_stratified_sample",
    "doc_domain_cap",
    "doc_weighted_sample",
    "doc_dsir_sample",
    "doc_corpus_mix",
    "doc_contrastive_pairs",
    "doc_curriculum_stages",
    "orders_zorder_keys",
    "lineitem_fingerprint",
    "doc_balanced_shards",
    "orders_fixed_sample_det",
    "doc_length_buckets",
    # r6 session 2: exact-rank fusion (integer ranks must be partition
    # -independent); PQ codes (argmin over literal chains — pure map);
    # pagerank at 6dp (sum-order jitter is ~1e-15, far under the round)
    "doc_rank_fusion",
    "embedding_pq_codes",
    "doc_pagerank",
]


@pytest.mark.parametrize("name", QUERIES)
def test_partitioning_invariance(spark, sf_dir, name):
    import __spark_entry__ as entry_mod

    fn = entry_mod.queries()[name]
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        a = sorted(map(tuple, fn(spark, sf_dir).collect()))
        spark.conf.set("spark.sql.shuffle.partitions", "23")
        b = sorted(map(tuple, fn(spark, sf_dir).collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert a == b, f"{name}: output depends on partition count"
    assert len(a) > 0
