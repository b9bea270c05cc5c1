"""Randomized brute-force parity for the PPJoin n-gram Jaccard operator.

``ngram_jaccard_pairs`` serves as the ground-truth side in the LSH
recall test, but its own prefix/length/positional filters were never
validated against an unfiltered baseline — a lossy filter bug would
shrink BOTH sides of that comparison and stay invisible.  This test
computes exact all-pairs word-trigram Jaccard in plain Python over a
randomized overlapping-vocabulary corpus and requires the operator's
pair set AND similarity values to match exactly."""

from __future__ import annotations

import random


def _shingles(text: str, n: int = 3) -> frozenset:
    w = text.split(" ")
    return frozenset(" ".join(w[i : i + n]) for i in range(len(w) - n + 1))


def test_ppjoin_pairs_match_bruteforce(spark):
    rng = random.Random(42)
    vocab = [f"w{i}" for i in range(12)]
    docs = []
    base = [rng.choice(vocab) for _ in range(8)]
    for i in range(40):
        if i % 3 == 0:
            # mutate the shared base: near-dups at varying Jaccard
            words = list(base)
            for _ in range(rng.randint(0, 4)):
                words[rng.randrange(len(words))] = rng.choice(vocab)
        else:
            words = [rng.choice(vocab) for _ in range(rng.randint(3, 10))]
        docs.append((i, " ".join(words)))

    threshold = 0.5
    expect = {}
    for i, (ia, ta) in enumerate(docs):
        sa = _shingles(ta)
        if not sa:
            continue
        for ib, tb in docs[i + 1 :]:
            sb = _shingles(tb)
            if not sb:
                continue
            j = len(sa & sb) / len(sa | sb)
            if j >= threshold:
                expect[(ia, ib)] = round(j, 6)

    from scats_transis_kinesis_spark.operators import dedup as D

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"]): round(r["jaccard"], 6)
        for r in D.ngram_jaccard_pairs(df, n=3, threshold=threshold).collect()
    }
    assert got == expect
