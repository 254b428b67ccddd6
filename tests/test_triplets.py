"""Contrastive triplet mining (operators/similarity.py::triplet_mining):
hand-checkable geometry fixture, unique-label anchors, hardest-negative
ordering, and the broadcast plan shape."""

from __future__ import annotations

import pytest

from open_instrument_spark.operators.similarity import triplet_mining


@pytest.fixture(scope="module")
def emb(spark):
    # 2-d geometry: cosines readable by eye. labels: 0 = x-ish, 1 = y-ish
    rows = [
        (0, [1.0, 0.0], 0),        # anchor
        (1, [1.0, 0.1], 0),        # same-label, nearest → positive
        (2, [0.8, 0.6], 0),        # same-label, farther
        (3, [0.9, 0.5], 1),        # different-label, closest → hardest neg
        (4, [0.0, 1.0], 1),        # different-label, orthogonal
        (5, [1.0, 0.0], 2),        # unique label → no triplet as anchor
    ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )


def test_positive_is_nearest_same_label(spark, emb):
    rows = triplet_mining(emb, [0], k=2).collect()
    assert all(r["pos_id"] == 1 for r in rows)
    assert all(r["label"] == 0 for r in rows)


def test_negatives_are_hardest_first_and_cross_label(spark, emb):
    # ANY different label is a negative: id 5 (label 2, colinear with
    # the anchor, cos 1.0) outranks id 3 (cos ≈ 0.874); id 4 (cos 0)
    # falls off at k=2
    rows = sorted(triplet_mining(emb, [0], k=2).collect(),
                  key=lambda r: r["rank"])
    assert [r["neg_id"] for r in rows] == [5, 3]
    assert rows[0]["neg_cos"] > rows[1]["neg_cos"]


def test_unique_label_anchor_yields_no_triplets(spark, emb):
    assert triplet_mining(emb, [5], k=2).count() == 0


def test_k_caps_negatives_per_anchor(spark, emb):
    got = triplet_mining(emb, [0, 1], k=1).collect()
    per_q = {}
    for r in got:
        per_q[r["q_id"]] = per_q.get(r["q_id"], 0) + 1
    assert per_q == {0: 1, 1: 1}


def test_plan_broadcasts_anchors_and_positives(spark, emb):
    plan = (
        triplet_mining(emb, [0, 1], k=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
