"""kmeans_lloyd_step unit tests: hand-checked assignment/update on a
tiny corpus, empty-cluster drop, and the fixpoint property (running a
step on already-converged centroids reproduces them)."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def vecs(spark):
    rows = [
        (0, [0.0, 0.0]),
        (1, [1.0, 0.0]),     # seed A
        (2, [2.0, 0.0]),
        (3, [10.0, 0.0]),    # seed B
        (4, [11.0, 0.0]),
        (5, [100.0, 100.0]),  # seed C — nearest only to itself
    ]
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_lloyd_step_hand_checked(vecs):
    from open_instrument_spark.operators.similarity import kmeans_lloyd_step

    out = kmeans_lloyd_step(vecs.filter("vec_id != 5"), [1, 3])
    got = {(r["cell"], r["i"]): r for r in out.collect()}
    # cell 0 (seed vec 1) takes vecs 0,1,2 → mean (1.0, 0.0)
    assert got[(0, 0)]["n_members"] == 3 and got[(0, 0)]["mu"] == 1.0
    assert got[(0, 1)]["mu"] == 0.0
    # cell 1 (seed vec 3) takes vecs 3,4 → mean (10.5, 0.0)
    assert got[(1, 0)]["n_members"] == 2 and got[(1, 0)]["mu"] == 10.5


def test_lloyd_step_equidistant_tie_breaks_to_lower_cell(spark):
    from open_instrument_spark.operators.similarity import kmeans_lloyd_step

    vecs = spark.createDataFrame(
        [(0, [0.0]), (1, [2.0]), (2, [1.0])], ["vec_id", "embedding"]
    )
    out = kmeans_lloyd_step(vecs, [0, 1])
    got = {r["cell"]: r["n_members"] for r in out.collect()}
    # vec 2 is equidistant from both seeds → lowest cell wins
    assert got[0] == 2 and got[1] == 1


def test_lloyd_step_empty_cluster_emits_nothing(vecs):
    from open_instrument_spark.operators.similarity import kmeans_lloyd_step

    # seed 5 is so remote no other vector assigns to it; restricting the
    # corpus to vecs 0-4 + seed 5 keeps cell 2 at exactly one member,
    # while dropping vec 5 from the corpus would empty it entirely
    out = kmeans_lloyd_step(vecs, [1, 3, 5])
    cells = {r["cell"] for r in out.collect()}
    assert cells == {0, 1, 2}
    out2 = kmeans_lloyd_step(vecs.filter("vec_id != 5"), [1, 3])
    assert {r["cell"] for r in out2.collect()} == {0, 1}


def test_lloyd_step_fixpoint_on_converged_centroids(spark):
    from open_instrument_spark.operators.similarity import kmeans_lloyd_step

    # two tight, well-separated pairs whose means ARE corpus points
    vecs = spark.createDataFrame(
        [(0, [0.0, 1.0]), (1, [0.0, -1.0]), (2, [0.0, 0.0]),
         (3, [50.0, 1.0]), (4, [50.0, -1.0]), (5, [50.0, 0.0])],
        ["vec_id", "embedding"],
    )
    out = {(r["cell"], r["i"]): r["mu"]
           for r in kmeans_lloyd_step(vecs, [2, 5]).collect()}
    assert out[(0, 0)] == 0.0 and out[(0, 1)] == 0.0
    assert out[(1, 0)] == 50.0 and out[(1, 1)] == 0.0


def test_kmeans_iterate_inertia_monotone(spark):
    """Lloyd's algorithm never increases inertia; 4 rounds on the real
    sf0.001 embeddings must be non-increasing and strictly improve
    from the seeded start."""
    from open_instrument_spark.operators.similarity import kmeans_iterate
    from open_instrument_spark.session import prepare
    from open_instrument_spark.sources.tables import load_tables
    from tests.conftest import SF_SMOKE

    prepare(spark)
    emb = load_tables(spark, SF_SMOKE).table("embeddings")
    C, inertia = kmeans_iterate(emb, [3, 11, 19, 27], n_iter=4)
    assert C.shape == (4, 64)
    assert all(a >= b - 1e-9 for a, b in zip(inertia, inertia[1:])), inertia
    assert inertia[-1] < inertia[0]


def test_kmeans_iterate_first_round_matches_lloyd_step(spark):
    """Round 1 of the loop must agree with the oracled single-step
    operator: the updated centroids equal kmeans_lloyd_step's mus."""
    from open_instrument_spark.operators.similarity import (
        kmeans_iterate,
        kmeans_lloyd_step,
    )
    from open_instrument_spark.session import prepare
    from open_instrument_spark.sources.tables import load_tables
    from tests.conftest import SF_SMOKE

    prepare(spark)
    emb = load_tables(spark, SF_SMOKE).table("embeddings")
    C, _ = kmeans_iterate(emb, [3, 11], n_iter=1)
    step = {(r["cell"], r["i"]): r["mu"]
            for r in kmeans_lloyd_step(emb, [3, 11]).collect()}
    for cell in (0, 1):
        for i in (0, 17, 63):
            assert abs(C[cell][i] - step[(cell, i)]) < 1e-6


def test_lloyd_step_missing_seed_raises(vecs):
    """Absent seed ids must raise instead of silently shrinking k —
    a shrunken centroid set changes every downstream assignment
    (advisor r10)."""
    from open_instrument_spark.operators.similarity import kmeans_lloyd_step

    with pytest.raises(ValueError, match="silently shrink"):
        kmeans_lloyd_step(vecs, [1, 3, 999_999])


def test_kmeans_iterate2_query_inertia_monotone(spark):
    """The chained 2-round gate query: round-2 total inertia must not
    exceed round-1's (Lloyd monotonicity), and both rounds emit full
    k x d grids on the smoke corpus."""
    from open_instrument_spark.registry import QUERIES
    from tests.conftest import SF_SMOKE

    rows = QUERIES["embed_kmeans_iterate2"](spark, SF_SMOKE).collect()
    by_round = {}
    for r in rows:
        by_round.setdefault(r["lloyd_round"], {}).setdefault(
            r["cell"], r["cell_inertia"])
    assert set(by_round) == {1, 2}
    i1 = sum(by_round[1].values())
    i2 = sum(by_round[2].values())
    assert i2 <= i1 + 1e-6
    assert len([r for r in rows if r["lloyd_round"] == 1]) == 8 * 64
