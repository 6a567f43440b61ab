"""Fidelity differential for the exact-substring (duplicated-span)
dedup (dedup.py, Lee et al. 2022 shape): the k-gram anchor approach
vs a pure-Python maximal-common-substring ground truth (diagonal-run
extension — the same span set a suffix array yields) on a seeded
corpus with planted duplications.

Claim under test: in TOKEN space the anchor method is EXACT for
cross-doc spans of length >= k (anchors sit at EVERY position —
stride 1 — so a shared substring [s, e] with e-s+1 >= k produces the
consecutive anchor run s..e-k+1 and the island merge recovers [s, e]
precisely); spans shorter than k tokens are invisible BY DESIGN (the
same min-match-length threshold the suffix-array method applies).
Both missed and extra covered-token fractions must be 0."""

import random

import pytest

from cascalog_spark.functions.dedup import exact_substring_spans

K = 8


def _mk_corpus(seed: int, n_docs: int = 50):
    """Random token docs + planted cross-doc duplications: slices of
    length k-1 (must stay invisible), exactly k, k+3 and 2k copied
    from earlier docs into later ones, including doc-start/doc-end
    boundary placements and adjacent double-plants."""
    rng = random.Random(seed)
    vocab = [f"tok{i}" for i in range(40)]
    docs = {}
    for i in range(n_docs):
        docs[i] = [rng.choice(vocab)
                   for _ in range(rng.randint(3, 50))]
    # planted copies (source id < target id — the ownership rule)
    for L in (K - 1, K, K + 3, 2 * K):
        for _ in range(6):
            src = rng.randrange(0, n_docs - 1)
            if len(docs[src]) < L:
                continue
            s = rng.randrange(0, len(docs[src]) - L + 1)
            chunk = docs[src][s:s + L]
            tgt = rng.randrange(src + 1, n_docs)
            mode = rng.choice(["start", "end", "mid", "double"])
            if mode == "start":
                docs[tgt] = chunk + docs[tgt]
            elif mode == "end":
                docs[tgt] = docs[tgt] + chunk
            elif mode == "double":  # adjacent plants -> one merged run
                p = rng.randrange(0, len(docs[tgt]) + 1)
                docs[tgt] = docs[tgt][:p] + chunk + chunk + docs[tgt][p:]
            else:
                p = rng.randrange(0, len(docs[tgt]) + 1)
                docs[tgt] = docs[tgt][:p] + chunk + docs[tgt][p:]
    # one full-document duplicate
    docs[n_docs - 1] = list(docs[0])
    return docs


def _ref_covered(docs: dict, k: int) -> dict:
    """Ground truth: per doc, the token positions inside ANY common
    substring of length >= k shared with a LOWER-id doc — maximal
    diagonal runs of the pairwise token match matrix (exactly the
    cross-doc duplicated spans a suffix array reports)."""
    covered = {i: set() for i in docs}
    ids = sorted(docs)
    for bi, b in enumerate(ids):
        B = docs[b]
        for a in ids[:bi]:
            A = docs[a]
            for d in range(-(len(A) - 1), len(B)):
                run = 0
                for j in range(len(B) + 1):
                    i = j - d
                    ok = (j < len(B) and 0 <= i < len(A)
                          and A[i] == B[j])
                    if ok:
                        run += 1
                    else:
                        if run >= k:
                            covered[b].update(range(j - run, j))
                        run = 0
    return covered


@pytest.mark.parametrize("seed", [42, 7, 20260816])
def test_exact_substring_spans_match_suffix_array_truth(spark, seed):
    docs = _mk_corpus(seed)
    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in docs.items()],
        "doc_id int, text string")
    got = {i: set() for i in docs}
    for r in exact_substring_spans(df, k=K).collect():
        got[r["doc_id"]].update(range(r["span_start"],
                                      r["span_end"] + 1))
    want = _ref_covered(docs, K)
    n_want = sum(len(v) for v in want.values()) or 1
    missed = sum(len(want[i] - got[i]) for i in docs) / n_want
    extra = sum(len(got[i] - want[i]) for i in docs) / n_want
    assert missed == 0 and extra == 0, (
        f"span recall differential: missed={missed:.4f} "
        f"extra={extra:.4f} (seed {seed})")
    # sanity: planted spans exist, so the test is not vacuous
    assert n_want > 100


def test_exact_substring_spans_sub_k_invisible(spark):
    """A shared run of k-1 tokens must produce NO span (the documented
    bound: min detectable span length == k — same threshold semantics
    as the suffix-array method's min match length)."""
    a = " ".join(f"tok{i}" for i in range(K - 1))
    df = spark.createDataFrame(
        [(0, a + " xa xb"), (1, "yy " + a + " zz")],
        "doc_id int, text string")
    assert exact_substring_spans(df, k=K).count() == 0
