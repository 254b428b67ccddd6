"""The r13 kNN-graph consumers on a hand-built corpus where the right
answers are knowable by construction: two tight direction groups in
separate cells plus one isolated vector — mutual-kNN clustering keeps
groups whole and separate, density scoring counts incoming edges
exactly (isolated nodes keep zero rows), and one label-propagation
round recovers every group's label."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from open_instrument_spark.operators.similarity import (
    knn_density,
    knn_graph,
    knn_label_propagation,
    mutual_knn_clusters,
)

# Two orthogonal-direction centroids + a third for the isolated vector.
C = np.array([[1.0, 0, 0, 0], [0, 1.0, 0, 0], [0, 0, 1.0, 0]])

# Group A (label 7): 4 tiny perturbations of e1 → cell 0.
# Group B (label 9): 3 perturbations of e2 → cell 1.
# Vector 100 (label 5): alone on e3 → cell 2, no in-cell neighbors.
ROWS = (
    [(i, [1.0, 0.001 * i, 0.0, 0.0], 7) for i in range(4)]
    + [(10 + i, [0.001 * i, 1.0, 0.0, 0.0], 9) for i in range(3)]
    + [(100, [0.0, 0.0, 1.0, 0.0], 5)]
)
SCHEMA = "vec_id long, embedding array<double>, label int"


def _emb(spark):
    return spark.createDataFrame(ROWS, SCHEMA)


def test_mutual_clusters_keep_groups_whole_and_separate(spark):
    got = {r["vec_id"]: r["cluster_id"] for r in
           mutual_knn_clusters(_emb(spark), C, k=2).collect()}
    # both groups cluster to their min id; the isolated vector (no
    # edges at all) emits no row
    assert got == {0: 0, 1: 0, 2: 0, 3: 0, 10: 10, 11: 10, 12: 10}


def test_mutual_edges_are_reciprocal_graph_edges(spark):
    emb = _emb(spark)
    edges = {(r["src"], r["dst"]) for r in
             knn_graph(emb, C, k=2).collect()}
    # reconstruct the mutual set the operator keeps and check both
    # directions really are graph edges
    mutual = {(a, b) for (a, b) in edges if (b, a) in edges and a < b}
    assert mutual  # non-vacuous
    for a, b in mutual:
        assert (a, b) in edges and (b, a) in edges


def test_knn_density_counts_and_isolated_zero_row(spark):
    emb = _emb(spark)
    got = {r["vec_id"]: (r["cell"], r["in_degree"], r["avg_in_cos"])
           for r in knn_density(emb, C, k=2).collect()}
    # every node keeps a row; the isolated one scores 0 with NULL mean
    assert set(got) == {0, 1, 2, 3, 10, 11, 12, 100}
    assert got[100] == (2, 0, None)
    # in-degrees sum to the edge count (4 nodes × k=2 + 3 nodes × 2)
    edges = knn_graph(emb, C, k=2).count()
    assert sum(d for _, d, _ in got.values()) == edges == 4 * 2 + 3 * 2
    # near-identical in-group vectors → incoming means ≈ 1
    assert all(v[2] > 0.999 for k_, v in got.items() if k_ != 100)


def test_label_propagation_recovers_group_labels(spark):
    got = {r["vec_id"]: (r["pred_label"], r["vote_w"]) for r in
           knn_label_propagation(_emb(spark), C, k=2).collect()}
    # every connected node's neighbors share its group label; the
    # isolated vector has no votes and no row
    assert set(got) == {0, 1, 2, 3, 10, 11, 12}
    assert all(lbl == 7 for v, (lbl, _) in got.items() if v < 10)
    assert all(lbl == 9 for v, (lbl, _) in got.items() if 10 <= v < 100)
    # vote weights are exact integer micros of k≈2 near-unit cosines
    assert all(1_990_000 <= w <= 2_000_000 for _, w in got.values())


def test_knn_coreset_keeps_singletons_and_cuts_clusters(spark):
    from open_instrument_spark.operators.similarity import knn_coreset

    got = {r["vec_id"]: (r["cluster_id"], r["in_degree"], r["keep"])
           for r in knn_coreset(_emb(spark), C, k=2,
                                per_cluster=2).collect()}
    # every node keeps a row; the isolated vector is its own singleton
    # cluster and survives
    assert set(got) == {0, 1, 2, 3, 10, 11, 12, 100}
    assert got[100] == (100, 0, True)
    # each mutual cluster keeps exactly per_cluster=2 members, chosen
    # by (lowest in-degree, lowest id)
    for cid, size in ((0, 4), (10, 3)):
        members = {v: t for v, t in got.items() if t[0] == cid}
        assert len(members) == size
        kept = sorted(v for v, t in members.items() if t[2])
        want = sorted(members, key=lambda v: (members[v][1], v))[:2]
        assert kept == sorted(want)
