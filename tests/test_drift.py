"""PSI corpus drift (operators/corpus.py::drift_psi): hand-computed
fixture, zero-drift identity, one-sided-bin smoothing, and the
bounded-join plan shape."""

from __future__ import annotations

import math

import pytest

from open_instrument_spark.operators.corpus import drift_psi


@pytest.fixture(scope="module")
def slices(spark):
    ref = spark.createDataFrame(
        [(1, "a" * 50, "en"), (2, "b" * 150, "en"), (3, "c" * 50, "de")],
        "doc_id long, text string, lang string",
    )
    cur = spark.createDataFrame(
        [(4, "d" * 50, "en"), (5, "e" * 450, "fr")],
        "doc_id long, text string, lang string",
    )
    return ref, cur


def test_hand_computed_psi(spark, slices):
    """Replay the add-half-smoothed PSI by hand for the len feature:
    ref bins <=100:2, <=200:1; cur bins <=100:1, <=500:1 → B=3."""
    ref, cur = slices
    rows = {(r["feature"], r["bin"]): r
            for r in drift_psi(ref, cur, len_edges=(100, 200, 300, 400, 500)).collect()}
    def p(c, n, b):
        return (c + 0.5) / (n + 0.5 * b)
    cases = {"<=100": (2, 1), "<=200": (1, 0), "<=500": (0, 1)}
    total = 0.0
    for b, (nr, nc) in cases.items():
        pr, pc = p(nr, 3, 3), p(nc, 2, 3)
        term = (pr - pc) * math.log(pr / pc)
        total += term
        got = rows[("len", b)]
        assert got["n_ref"] == nr and got["n_cur"] == nc
        assert got["p_ref"] == round(pr, 6)
        assert got["p_cur"] == round(pc, 6)
        assert abs(got["psi_term"] - term) < 1e-6
    assert abs(rows[("len", "<=100")]["psi_total"] - total) < 1e-6


def test_zero_drift_on_identical_slices(spark, slices):
    """A slice compared to itself scores PSI 0 on every feature."""
    ref, _ = slices
    for r in drift_psi(ref, ref).collect():
        assert r["psi_total"] == 0.0 and r["psi_term"] == 0.0


def test_one_sided_bins_stay_finite(spark, slices):
    """A language seen only in cur ('fr') still yields a finite term —
    the add-half smoothing contract (no ln(0) / division by zero)."""
    ref, cur = slices
    rows = {(r["feature"], r["bin"]): r for r in drift_psi(ref, cur).collect()}
    fr = rows[("lang", "fr")]
    assert fr["n_ref"] == 0 and fr["n_cur"] == 1
    assert math.isfinite(fr["psi_term"]) and fr["psi_term"] > 0


def test_plan_joins_only_bounded_frames(spark, slices):
    """The only join in the plan lands AFTER both aggregations — the
    corpus rows are never joined or shuffled row-wise (SortMergeJoin
    over the ≤B-row count frames is fine; what must not appear is a
    join taking a raw scan as input)."""
    ref, cur = slices
    plan = (
        drift_psi(ref, cur)
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    join_pos = plan.find("Join")
    agg_pos = plan.find("Aggregate")
    assert join_pos != -1 and agg_pos != -1
    # optimized plans print top-down: the Join node must sit above
    # (before) the aggregates that feed it, and each join child is an
    # Aggregate subtree, not a relation scan
    assert plan.index("Aggregate", join_pos) > join_pos
