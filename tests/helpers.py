"""Shared assertions for rank-identity comparisons.

The reference's own sorts are unstable and its float32 sums are
order-nondeterministic (SURVEY.md §4.5); the pinned spec (golden model)
breaks all ties by doc_sign. Spark sums float64 in partition order, so
scores can differ from golden in the last ~bit; comparisons therefore
treat scores within REL_TOL as ties and require the doc SETS per tie-group
to match (rank-identity up to pinned-tie equivalence)."""

from __future__ import annotations

import math

REL_TOL = 1e-9


def assert_ranked_equal(got: list[tuple[int, float]], want: list[tuple[int, float]], ctx=""):
    """got/want: [(doc_id, score)] in rank order."""
    assert len(got) == len(want), f"{ctx}: length {len(got)} != {len(want)}"
    if not got:
        return
    # per-position score equality within tolerance
    for i, ((gd, gs), (wd, ws)) in enumerate(zip(got, want)):
        assert math.isclose(gs, ws, rel_tol=REL_TOL, abs_tol=1e-12), (
            f"{ctx}: score mismatch at rank {i}: {gs} vs {ws}"
        )
    # doc sets must match within each tie-group of the golden ranking
    i = 0
    n = len(want)
    while i < n:
        j = i + 1
        while j < n and math.isclose(
            want[j][1], want[i][1], rel_tol=REL_TOL, abs_tol=1e-12
        ):
            j += 1
        gset = {d for d, _ in got[i:j]}
        wset = {d for d, _ in want[i:j]}
        assert gset == wset, (
            f"{ctx}: docs differ in tie group [{i},{j}): {gset ^ wset}"
        )
        i = j
