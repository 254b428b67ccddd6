"""Scalar quantization (operators/similarity.py::sq_topk): encode/
decode parity vs a numpy replay, recall vs exact L2, zero-range dims,
and the broadcast-stats plan shape."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from open_instrument_spark.operators import similarity as sim
from open_instrument_spark.sources.tables import load_tables
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def emb(spark):
    return load_tables(spark, SF_SMOKE).table("embeddings")


@pytest.fixture(scope="module")
def emb_np(emb):
    rows = emb.select("vec_id", "embedding").collect()
    return {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
            for r in rows}


def numpy_sq(emb_np):
    X = np.stack(list(emb_np.values()))
    vmin, vmax = X.min(axis=0), X.max(axis=0)
    vdiff = vmax - vmin
    safe = np.where(vdiff > 0, vdiff, 1.0)
    codes = np.clip(np.floor((X - vmin) / safe * 255.0 + 0.5), 0, 255)
    return dict(zip(emb_np.keys(), vmin + codes * (vdiff / 255.0)))


def test_reconstruction_matches_numpy_replay(spark, emb, emb_np):
    """The in-plan train+encode+decode equals the straight numpy spec
    to float ulps — the same replay discipline the oracle uses."""
    want = numpy_sq(emb_np)
    stats = sim.sq_train_stats(emb)
    recon = (
        emb.select(F.col("vec_id").alias("n_id"),
                   sim.as_double(F.col("embedding")).alias("v"))
        .crossJoin(F.broadcast(stats))
        .select("n_id", sim._sq_reconstruct(F.col("v")).alias("xh"))
    )
    got = {r["n_id"]: np.array(r["xh"]) for r in recon.collect()}
    for i in want:
        np.testing.assert_allclose(got[i], want[i], rtol=0, atol=1e-12)


def test_quantization_error_bounded_by_step(spark, emb, emb_np):
    """|x − x̂| ≤ one quantization step per dim (vdiff/255 · 1/2 ideal;
    allow a full step for the clamp edges) — the SQ accuracy contract."""
    want = numpy_sq(emb_np)
    X = np.stack(list(emb_np.values()))
    step = (X.max(axis=0) - X.min(axis=0)) / 255.0
    for i, v in emb_np.items():
        assert (np.abs(v - want[i]) <= step + 1e-12).all()


def test_topk_recall_vs_exact_l2(spark, emb, emb_np):
    """SQ top-10 overlaps exact-L2 top-10 heavily (≥0.7 mean recall at
    8 bits — in practice it is near-1; the bound fails any broken
    encode without flaking on ties)."""
    got = sim.sq_topk(emb, [0, 1, 2], k=10)
    by_q: dict[int, set] = {}
    for r in got.collect():
        by_q.setdefault(r["q_id"], set()).add(r["n_id"])
    recalls = []
    for q in (0, 1, 2):
        qv = emb_np[q]
        d = {i: float(((qv - v) ** 2).sum())
             for i, v in emb_np.items() if i != q}
        exact = set(sorted(d, key=lambda i: (d[i], i))[:10])
        recalls.append(len(by_q[q] & exact) / 10.0)
    assert sum(recalls) / len(recalls) >= 0.7


def test_zero_range_dims_decode_to_vmin(spark):
    """A constant dimension decodes to exactly its value (code 0 ·
    vdiff 0) instead of NaN from the 0/0 division."""
    rows = [(i, [1.5, float(i)]) for i in range(4)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    stats = sim.sq_train_stats(df)
    recon = (
        df.select(F.col("vec_id").alias("n_id"),
                  sim.as_double(F.col("embedding")).alias("v"))
        .crossJoin(F.broadcast(stats))
        .select("n_id", sim._sq_reconstruct(F.col("v")).alias("xh"))
    )
    for r in recon.collect():
        assert r["xh"][0] == 1.5
        assert abs(r["xh"][1] - r["n_id"]) <= 3.0 / 255.0 + 1e-9


def test_plan_broadcasts_stats_and_queries(spark, emb):
    """Both small sides (one-row stats, |Q|-row queries) enter as
    broadcast joins — the corpus is never shuffled for the search."""
    plan = (
        sim.sq_topk(emb, [0, 1, 2], k=10)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("BroadcastNestedLoopJoin") + plan.count(
        "BroadcastExchange") >= 2
    assert "SortMergeJoin" not in plan
