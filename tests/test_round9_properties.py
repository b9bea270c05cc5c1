"""Property-based tests (hypothesis) for the round-9 addition math.

The Spark queries are pinned by the oracle gate and the replay anchors
(tests/test_round9_anchors.py); these pin the DEFINITIONS over the
whole input space — corpus shapes, split choices, and vector sets that
example-based anchors under-sample.

- Exact-substring cut: the covered set partitions each document
  (kept + cut = total), covered positions are exactly the positions a
  repeated span touches, and coverage is MONOTONE in the corpus —
  adding a document never un-covers a position (adding can only turn
  unique spans repeated, never the reverse).
- Incremental span inventory: for ANY corpus and ANY disjoint doc
  split, the summed base+delta per-span distinct-doc counts equal the
  full recompute's — the algebraic-merge identity
  incremental_span_coverage rides on, checked structurally instead of
  on one hand split.
- IVF probe audit: recall and candidate volume are monotone in the
  probe count, and probing ALL centroids degenerates to the exact
  top-k (recall exactly 1e6) — the identity that anchors the
  definition to brute force.
"""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

M = 1_000_000
SPAN_N = 3  # property-space span length: shorter than prod's 5 so that
# random 4-8 token docs over a tiny vocab actually produce repeats;
# every property below is length-generic.


def _covered(docs: dict[int, list[str]], n: int = SPAN_N) -> dict[int, set]:
    """Plain-Python repeated-span covered-position sets (1-based)."""
    span_docs: dict[tuple, set] = {}
    for d, w in docs.items():
        for i in range(len(w) - n + 1):
            span_docs.setdefault(tuple(w[i : i + n]), set()).add(d)
    rep = {g for g, ds in span_docs.items() if len(ds) >= 2}
    out: dict[int, set] = {d: set() for d in docs}
    for d, w in docs.items():
        for i in range(len(w) - n + 1):
            if tuple(w[i : i + n]) in rep:
                out[d].update(range(i + 1, i + n + 1))
    return out


_corpus = st.dictionaries(
    keys=st.integers(min_value=0, max_value=30),
    values=st.lists(
        st.sampled_from(["a", "b", "c", "d"]), min_size=1, max_size=8
    ),
    min_size=1,
    max_size=10,
)


@settings(max_examples=300, deadline=None)
@given(docs=_corpus)
def test_cut_partitions_every_document(docs):
    cov = _covered(docs)
    for d, w in docs.items():
        kept = [t for i, t in enumerate(w, 1) if i not in cov[d]]
        # Partition: every position is kept xor cut, within range.
        assert len(kept) + len(cov[d]) == len(w)
        assert all(1 <= p <= len(w) for p in cov[d])
        # A document shorter than the span can never be covered.
        if len(w) < SPAN_N:
            assert not cov[d]


@settings(max_examples=200, deadline=None)
@given(docs=_corpus, extra=st.lists(st.sampled_from(["a", "b", "c", "d"]), min_size=1, max_size=8))
def test_coverage_monotone_under_corpus_growth(docs, extra):
    """Adding a document never un-covers a position of an existing doc:
    the repeated-span set only grows, so each doc's covered set only
    grows — the reason an incremental cut can be maintained by
    re-checking NEW spans only."""
    before = _covered(docs)
    new_id = max(docs) + 1
    after = _covered({**docs, new_id: extra})
    for d in docs:
        assert before[d] <= after[d]


@settings(max_examples=300, deadline=None)
@given(
    docs=_corpus,
    split_bits=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_incremental_inventory_merge_equals_recompute(docs, split_bits):
    """For ANY disjoint split (driven by random bits), summing the two
    sides' per-span distinct-doc counts reproduces the full corpus
    inventory — distinct counts are algebraic across disjoint doc
    partitions, the identity incremental_span_coverage rides on."""

    def inventory(sub: dict[int, list[str]]) -> dict[tuple, int]:
        inv: dict[tuple, set] = {}
        for d, w in sub.items():
            for i in range(len(w) - SPAN_N + 1):
                inv.setdefault(tuple(w[i : i + SPAN_N]), set()).add(d)
        return {g: len(ds) for g, ds in inv.items()}

    ids = sorted(docs)
    delta_ids = {d for j, d in enumerate(ids) if (split_bits >> j) & 1}
    base = {d: w for d, w in docs.items() if d not in delta_ids}
    delta = {d: w for d, w in docs.items() if d in delta_ids}
    merged: dict[tuple, int] = {}
    for side in (inventory(base), inventory(delta)):
        for g, c in side.items():
            merged[g] = merged.get(g, 0) + c
    assert merged == inventory(docs)
    # And therefore the repeated sets agree.
    full = inventory(docs)
    assert {g for g, c in merged.items() if c >= 2} == {
        g for g, c in full.items() if c >= 2
    }


# --- IVF probe properties ---------------------------------------------------


def _cos(a, b):
    num = sum(x * y for x, y in zip(a, b))
    den = math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(x * x for x in b))
    return round(num / den, 6)


_vectors = st.lists(
    st.lists(
        st.integers(min_value=-5, max_value=5).map(float),
        min_size=3,
        max_size=3,
    ).filter(lambda v: any(x != 0 for x in v)),
    min_size=4,
    max_size=12,
)


@settings(max_examples=200, deadline=None)
@given(vecs=_vectors, k=st.integers(min_value=1, max_value=3))
def test_ivf_recall_and_cost_monotone_full_probe_exact(vecs, k):
    """The ivf_probe_recall_audit definition over arbitrary integer
    vectors: per query, candidates and exact-hit counts are monotone in
    nprobe, and probing EVERY centroid IS the brute force (recall
    exactly 1.0) — because with all buckets probed the candidate set is
    the whole corpus minus self, and the top-k tiebreaks match."""
    n = len(vecs)
    n_cents = min(4, n)
    cents = list(range(n_cents))
    assigned = {
        i: min(cents, key=lambda c: (-_cos(vecs[i], vecs[c]), c))
        for i in range(n)
    }
    q = 0  # one query suffices; the audit sums over queries
    cranks = sorted(cents, key=lambda c: (-_cos(vecs[q], vecs[c]), c))
    exact = sorted(
        (i for i in range(n) if i != q),
        key=lambda i: (-_cos(vecs[q], vecs[i]), i),
    )[:k]
    prev_hits, prev_cand = -1, -1
    for p in range(1, n_cents + 1):
        probed = set(cranks[:p])
        cand = [i for i in range(n) if i != q and assigned[i] in probed]
        topk = sorted(cand, key=lambda i: (-_cos(vecs[q], vecs[i]), i))[:k]
        hits = len(set(topk) & set(exact))
        assert len(cand) >= prev_cand
        assert hits >= prev_hits
        prev_hits, prev_cand = hits, len(cand)
    # Full probe == brute force: same candidate universe, same ordering.
    assert prev_hits == len(exact)  # recall exactly 1.0 at p = n_cents
