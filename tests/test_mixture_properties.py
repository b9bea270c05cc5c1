"""Property-based tests (hypothesis) for the batch-B addition math.

The Spark queries are pinned by the oracle gate and the replay anchors
(tests/test_round8b_anchors.py); these pin the DEFINITIONS over the
whole input space — inventory shapes and cover-set structures that
example-based anchors under-sample.
"""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

M = 1_000_000


def _temperature(lang_tokens: dict[str, int]):
    """The temperature_sampling_plan definition in plain Python
    (identical arithmetic: integer weight w = floor(sqrt(t)*1e6), then
    floor-division micros)."""
    total = sum(lang_tokens.values())
    w = {g: math.floor(math.sqrt(t) * M) for g, t in lang_tokens.items()}
    sw = sum(w.values())
    return {
        g: (t * M // total, w[g] * M // sw) for g, t in lang_tokens.items()
    }


@settings(max_examples=300, deadline=None)
@given(
    tokens=st.lists(
        st.integers(min_value=1, max_value=10**13), min_size=1, max_size=12
    )
)
def test_temperature_smoothing_invariants(tokens):
    """For ANY positive inventory: rates are a (floor-quantized)
    distribution, monotone in the inventory, and compressed toward
    uniform relative to the natural shares — sqrt smoothing never
    re-orders languages and never widens a gap."""
    inv = {f"l{i}": t for i, t in enumerate(tokens)}
    plan = _temperature(inv)
    n = len(tokens)

    # Floor-quantized distribution: sums land within n micros below 1e6.
    for idx in (0, 1):
        s = sum(p[idx] for p in plan.values())
        assert M - n <= s <= M

    # Monotone: more tokens never means a smaller smoothed rate.
    by_tokens = sorted(inv, key=inv.get)
    for a, b in zip(by_tokens, by_tokens[1:]):
        assert plan[a][1] <= plan[b][1] + 1  # +1: floor quantization

    # Compression: the head/tail smoothed ratio never exceeds the
    # natural ratio (sqrt flattens).  Compare in exact integer math on
    # the unfloored rationals: q_a/q_b = sqrt-weight ratio, p_a/p_b =
    # token ratio; sqrt(ta/tb) <= ta/tb for ta >= tb.
    ta, tb = max(tokens), min(tokens)
    wa, wb = math.floor(math.sqrt(ta) * M), math.floor(math.sqrt(tb) * M)
    assert wa * tb <= (ta * wb) + ta * M  # slack: one floor step of wb


def _greedy(cover: dict[str, frozenset[int]], rounds: int):
    covered: set[int] = set()
    picked: list[str] = []
    out = []
    for _ in range(rounds):
        gains = {
            s: len(b - covered) for s, b in cover.items() if s not in picked
        }
        if not gains:
            break
        top = min(gains, key=lambda s: (-gains[s], s))
        covered |= cover[top]
        picked.append(top)
        out.append((top, gains[top], len(covered)))
    return out


@settings(max_examples=300, deadline=None)
@given(
    cover=st.dictionaries(
        keys=st.text(alphabet="abcdefgh", min_size=1, max_size=4),
        values=st.frozensets(
            st.integers(min_value=0, max_value=63), min_size=0, max_size=20
        ),
        min_size=1,
        max_size=8,
    ),
    rounds=st.integers(min_value=1, max_value=8),
)
def test_greedy_coverage_invariants(cover, rounds):
    """For ANY cover structure: greedy gains are non-increasing
    (coverage is submodular), cumulative coverage is exactly the gain
    prefix-sum, never exceeds the universe, and the first pick is a
    maximal-coverage source."""
    out = _greedy(cover, rounds)
    universe = set().union(*cover.values()) if cover else set()

    gains = [g for _, g, _ in out]
    assert all(a >= b for a, b in zip(gains, gains[1:]))

    run = 0
    for _, g, cum in out:
        run += g
        assert cum == run
    assert run <= len(universe)

    best = max(len(b) for b in cover.values())
    assert out[0][1] == best
