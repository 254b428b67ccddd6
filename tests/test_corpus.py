"""Corpus operators: split stability and packing-bound properties."""

from __future__ import annotations

from pyspark.sql import functions as F

from open_instrument_spark.operators.corpus import hash_split, pack_greedy
from open_instrument_spark.sources.tables import load_tables
from tests.conftest import SF_SMOKE


def test_hash_split_stable_under_growth(spark):
    docs = load_tables(spark, SF_SMOKE).table("documents").select("doc_id")
    full = {r["doc_id"]: r["split"] for r in hash_split(docs).collect()}
    half = {
        r["doc_id"]: r["split"]
        for r in hash_split(docs.filter(F.col("doc_id") % 2 == 0)).collect()
    }
    # growing the corpus never reassigns existing documents
    assert all(full[k] == v for k, v in half.items())
    # and the ratios are roughly the weights
    n = len(full)
    train = sum(1 for v in full.values() if v == "train")
    assert 0.8 * n <= train <= 0.97 * n


def test_hash_split_full_weight_prefix(spark):
    """A cumulative prefix reaching 1.0 must assign EVERY row to that
    split: _hex_threshold(1.0) is a 33-char string that sorts below
    most 32-char md5 hashes, so without the clamp-to-'g' guard rows
    silently leak into later splits."""
    docs = load_tables(spark, SF_SMOKE).table("documents").select("doc_id")
    n = docs.count()
    got = hash_split(docs, weights={"train": 1.0, "val": 0.0}) \
        .groupBy("split").count().collect()
    assert {r["split"]: r["count"] for r in got} == {"train": n}
    # and an interior prefix hitting 1.0 exactly: everything lands in
    # the first two splits, nothing in the unreachable tail
    got2 = hash_split(
        docs, weights={"a": 0.5, "b": 0.5, "c": 0.0}
    ).groupBy("split").count().collect()
    counts = {r["split"]: r["count"] for r in got2}
    assert counts.get("c", 0) == 0 and sum(counts.values()) == n


def test_pack_greedy_bounds(spark):
    docs = load_tables(spark, SF_SMOKE).table("documents").select("doc_id", "text")
    toks = docs.select("doc_id", F.length("text").alias("n_tokens"))
    packed = pack_greedy(toks, "n_tokens", 1000)
    per_bin = (
        packed.groupBy("bin")
        .agg(F.sum("n_tokens").alias("tot"), F.max("n_tokens").alias("mx"),
             F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert all(r["n"] >= 1 for r in per_bin)
    # a bin overflows the budget by less than one document's tokens
    assert all(r["tot"] < 1000 + r["mx"] for r in per_bin)
    # bin ids start at 0 and increase; contiguity additionally holds
    # only when no single document exceeds the budget (an over-budget
    # doc legitimately skips intermediate bin ids)
    ids = sorted(r["bin"] for r in per_bin)
    assert ids[0] == 0 and ids == sorted(set(ids))
    if max(r["mx"] for r in per_bin) <= 1000:
        assert ids == list(range(len(ids)))


def test_pack_greedy_partitioned_matches_global_within_partition(spark):
    """Per-partition packing must equal global packing applied to each
    partition's documents alone — deterministic (partition, local-bin)
    identity, no cross-partition coupling."""
    from open_instrument_spark.operators.corpus import (
        hash_split,
        pack_greedy_partitioned,
    )

    docs = load_tables(spark, SF_SMOKE).table("documents").select("doc_id", "text")
    toks = hash_split(docs.select("doc_id", F.length("text").alias("n_tokens")))
    part = {
        (r["doc_id"]): (r["bin_part"], r["bin"])
        for r in pack_greedy_partitioned(toks, "n_tokens", 1000, "split").collect()
    }
    for split in ("train", "val", "test"):
        sub = toks.filter(F.col("split") == split)
        glob = {r["doc_id"]: r["bin"] for r in pack_greedy(sub, "n_tokens", 1000).collect()}
        got = {d: b for d, (p, b) in part.items() if p == split}
        assert got == glob, split


def test_pack_greedy_partitioned_has_no_single_task_window(spark):
    """The scale form must not plan an Exchange SinglePartition (the
    global window's one-task bottleneck the r1 verdict flagged)."""
    from open_instrument_spark.operators.corpus import (
        hash_split,
        pack_greedy_partitioned,
    )

    docs = load_tables(spark, SF_SMOKE).table("documents").select("doc_id", "text")
    toks = hash_split(docs.select("doc_id", F.length("text").alias("n_tokens")))

    def plan_of(df):
        return df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "simple"
        )

    assert "SinglePartition" in plan_of(pack_greedy(toks, "n_tokens", 1000))
    assert "SinglePartition" not in plan_of(
        pack_greedy_partitioned(toks, "n_tokens", 1000, "split")
    )


def test_stratified_sample_quota_exact_per_stratum(spark):
    from open_instrument_spark.operators.corpus import stratified_sample_quota

    docs = hash_split(
        load_tables(spark, SF_SMOKE).table("documents").select("doc_id")
    )
    sizes = {r["split"]: r["n"] for r in
             docs.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    out = stratified_sample_quota(docs, "split", 40)
    got = {r["split"]: r["n"] for r in
           out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    # exactly min(n, stratum size) rows per stratum
    assert got == {g: min(40, n) for g, n in sizes.items() if n > 0}
    # deterministic: a second run picks the identical membership
    a = {(r["doc_id"], r["sample_rank"]) for r in out.collect()}
    b = {(r["doc_id"], r["sample_rank"])
         for r in stratified_sample_quota(docs, "split", 40).collect()}
    assert a == b
    # ranks are 1..n within each stratum
    ranks = {}
    for r in out.collect():
        ranks.setdefault(r["split"], []).append(r["sample_rank"])
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in ranks.values())


def test_stratified_sample_frac_stable_and_shuffle_free(spark):
    from open_instrument_spark.operators.corpus import stratified_sample_frac

    docs = hash_split(
        load_tables(spark, SF_SMOKE).table("documents").select("doc_id")
    )
    fr = {"train": 0.25, "val": 1.0, "test": 1.0}
    full = stratified_sample_frac(docs, "split", fr)
    kept = {r["doc_id"] for r in full.collect()}
    # val/test kept whole (frac >= 1.0 short-circuits the hex threshold)
    n_vt = docs.filter(F.col("split") != "train").count()
    assert full.filter(F.col("split") != "train").count() == n_vt
    # train thinned to roughly a quarter
    n_train = docs.filter(F.col("split") == "train").count()
    k_train = full.filter(F.col("split") == "train").count()
    assert 0.15 * n_train <= k_train <= 0.35 * n_train
    # growth-stable: membership decided per row, so the half-corpus
    # survivors are exactly the full-corpus survivors with even ids
    half = stratified_sample_frac(
        docs.filter(F.col("doc_id") % 2 == 0), "split", fr
    )
    assert {r["doc_id"] for r in half.collect()} == {
        d for d in kept if d % 2 == 0
    }
    # 100 TB shape: pure scan-project filter, no Exchange
    plan = full._sc._jvm.PythonSQLUtils.explainString(
        full._jdf.queryExecution(), "simple"
    )
    assert "Exchange" not in plan


def test_source_stats_hand_computed(spark):
    from open_instrument_spark.operators.corpus import source_stats

    # srcA: two docs sharing a text (fingerprint collision), english
    # srcB: one unique long doc, non-english
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog", "en", "srcA"),
            (2, "the quick brown fox jumps over the lazy dog", "en", "srcA"),
            (3, "completely different text with many other fine words "
                "and plenty of the usual glue to make it long enough",
             "de", "srcB"),
        ],
        "doc_id long, text string, lang string, source string",
    )
    got = {r["source"]: r.asDict() for r in source_stats(docs).collect()}
    assert got["srcA"]["n_docs"] == 2 and got["srcB"]["n_docs"] == 1
    assert got["srcA"]["dup_frac"] == 1.0   # both collide corpus-wide
    assert got["srcB"]["dup_frac"] == 0.0
    assert got["srcA"]["en_frac"] == 1.0 and got["srcB"]["en_frac"] == 0.0
    assert got["srcA"]["avg_chars"] == 43.0
    assert 0.0 < got["srcB"]["avg_quality"] <= 1.0


def test_source_filter_drops_failing_sources(spark):
    from open_instrument_spark.operators.corpus import source_filter

    texts = [
        "alpha bravo charlie delta echo foxtrot golf hotel india text",
        "one small step for a corpus and a giant leap for cleaning",
        "entirely separate wording with zero overlap against others",
        "fourth document written in yet another disjoint vocabulary set",
    ]
    rows = [
        (i, texts[i], "en", "good") for i in range(4)
    ] + [
        # every doc in 'mirror' is the same text → dup_frac 1.0
        (10 + i, "mirror mirror on the wall same text in every crawl",
         "en", "mirror") for i in range(4)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    kept = source_filter(docs, min_quality=0.0, max_dup_frac=0.5)
    assert {r["source"] for r in kept.collect()} == {"good"}
    assert kept.count() == 4


def test_source_filter_plan_broadcasts_keep_set(spark):
    from open_instrument_spark.operators.corpus import source_filter
    from open_instrument_spark.sources.tables import load_tables
    from tests.test_plan_shapes import plan_of

    docs = load_tables(spark, SF_SMOKE).table("documents")
    plan = plan_of(source_filter(docs))
    assert "BroadcastHashJoin" in plan  # corpus side never shuffles


def test_mixture_by_tokens_budget_contract(spark):
    """Each budgeted source is filled to ≥ its budget (or exhausted),
    the kept set is minimal (dropping the last-kept doc dips under
    budget), and unlisted sources vanish."""
    from open_instrument_spark.operators.corpus import mixture_by_tokens

    docs = load_tables(spark, SF_SMOKE).table("documents")
    budgets = {"src0": 120, "src1": 10_000_000, "src2": 1}
    out = mixture_by_tokens(docs, "source", budgets).collect()
    totals = {}
    for r in out:
        assert r["source"] in budgets
        totals.setdefault(r["source"], []).append(r)
    all_counts = {
        r["source"]: r["n"] for r in
        docs.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for src, rows in totals.items():
        kept = sum(r["n_tokens"] for r in rows)
        if len(rows) < all_counts[src]:
            assert kept >= budgets[src], src
            last = max(rows, key=lambda r: r["tokens_before"])
            assert kept - last["n_tokens"] < budgets[src], src
        # budget 1 → exactly one doc (the first in md5 order)
    assert len(totals["src2"]) == 1
    assert totals["src1"][0]  # huge budget keeps everything
    assert len(totals["src1"]) == all_counts["src1"]


def test_chunk_documents_tiles_every_token(spark):
    """Chunks start at 1, step by the stride, and the final chunk ends
    exactly at the doc's last token; every position is covered because
    stride < width."""
    from open_instrument_spark.operators.corpus import chunk_documents

    docs = load_tables(spark, SF_SMOKE).table("documents")
    n_by_doc = {
        r["doc_id"]: r["n"] for r in docs.select(
            "doc_id", F.size(F.split("text", " ")).alias("n")).collect()
    }
    chunks = {}
    for r in chunk_documents(docs, width=64, stride=48).collect():
        chunks.setdefault(r["doc_id"], []).append(r)
    assert chunks.keys() == n_by_doc.keys()
    for doc_id, rows in chunks.items():
        n = n_by_doc[doc_id]
        starts = sorted(r["chunk_start"] for r in rows)
        assert starts[0] == 1
        assert all(b - a == 48 for a, b in zip(starts, starts[1:]))
        last = max(rows, key=lambda r: r["chunk_start"])
        assert last["chunk_start"] + last["chunk_tokens"] - 1 == n
        for r in rows:
            assert r["chunk_tokens"] == min(64, n - r["chunk_start"] + 1)


def _ws_docs(spark):
    return load_tables(spark, SF_SMOKE).table("documents").select(
        "doc_id", "source", F.size(F.split("text", " ")).alias("n_tokens"))


def test_weighted_sample_exact_size_and_growth_stable(spark):
    """min(n, |group|) rows per group; adding documents never changes
    an existing doc's priority key (A-Res keys depend only on the
    doc's own id + weight)."""
    from open_instrument_spark.operators.corpus import weighted_sample

    docs = _ws_docs(spark)
    sizes = {r["source"]: r["c"] for r in
             docs.groupBy("source").agg(F.count(F.lit(1)).alias("c")).collect()}
    out = weighted_sample(docs, "n_tokens", 7, group_col="source").collect()
    per = {}
    for r in out:
        per.setdefault(r["source"], []).append(r)
    assert per.keys() == sizes.keys()
    for src, rows in per.items():
        assert len(rows) == min(7, sizes[src])
        assert sorted(r["sample_rank"] for r in rows) == list(
            range(1, len(rows) + 1))

    half = weighted_sample(docs.filter(F.col("doc_id") % 2 == 0),
                           "n_tokens", 7, group_col="source")
    full_pri = {r["doc_id"]: r["priority"] for r in
                weighted_sample(docs, "n_tokens", 10_000,
                                group_col="source").collect()}
    for r in half.collect():
        assert full_pri[r["doc_id"]] == r["priority"]


def test_weighted_sample_monotone_in_weight(spark):
    """The A-Res key u^(1/w) is increasing in w: boosting a selected
    doc's weight keeps it selected; an enormous boost pulls a
    non-selected doc in."""
    from open_instrument_spark.operators.corpus import weighted_sample

    docs = _ws_docs(spark).filter(F.col("source") == "src0")
    base = weighted_sample(docs, "n_tokens", 5, group_col="source").collect()
    chosen = {r["doc_id"] for r in base}
    loser = docs.filter(~F.col("doc_id").isin(chosen)).first()["doc_id"]

    def boost(doc_id, factor):
        boosted = docs.withColumn(
            "n_tokens",
            F.when(F.col("doc_id") == doc_id,
                   F.col("n_tokens").cast("double") * float(factor))
            .otherwise(F.col("n_tokens").cast("double")))
        return {r["doc_id"] for r in weighted_sample(
            boosted, "n_tokens", 5, group_col="source").collect()}

    winner = base[0]["doc_id"]
    assert winner in boost(winner, 10)
    assert loser in boost(loser, 10 ** 9)


def test_weighted_sample_prefers_heavy_docs(spark):
    """Inclusion probability ∝ weight: with weight = token count, the
    sampled docs' mean token count must exceed the corpus mean (a
    deterministic check under the fixed seed)."""
    from open_instrument_spark.operators.corpus import weighted_sample

    docs = _ws_docs(spark)
    sampled = weighted_sample(docs, "n_tokens", 20, group_col="source")
    mean_all = docs.agg(F.avg("n_tokens")).first()[0]
    mean_sampled = sampled.agg(F.avg("n_tokens")).first()[0]
    assert mean_sampled > mean_all


def test_mixture_temperature_budgets_and_walk(spark):
    """α-sampling: α=1 gives proportional budgets, α=0 equal budgets,
    α=0.5 sits between (small sources upweighted vs proportional);
    the kept set is each group's md5-ordered prefix through the
    budget-crossing doc (the mixture_by_tokens walk)."""
    from open_instrument_spark.operators.corpus import mixture_by_temperature

    rows = ([(i, "big", "w " * 99) for i in range(60)]          # 100 tok/doc
            + [(1000 + i, "small", "w " * 9) for i in range(40)])  # 10
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    # corpus: big = 6000 tok, small = 400 tok
    TOTAL = 1000.0

    def budgets(alpha):
        out = mixture_by_temperature(docs, "source", alpha, 1000).collect()
        return ({r["source"]: r["budget"] for r in out},
                {r["source"]: [x for x in out if x["source"] == r["source"]]
                 for r in out})

    b1, _ = budgets(1.0)
    assert abs(b1["big"] - TOTAL * 6000 / 6400) < 1e-6
    assert abs(b1["small"] - TOTAL * 400 / 6400) < 1e-6
    b0, _ = budgets(0.0)
    assert abs(b0["big"] - 500.0) < 1e-6 and abs(b0["small"] - 500.0) < 1e-6
    bh, kept = budgets(0.5)
    assert b1["small"] < bh["small"] < b0["small"]   # upweighted, not equal
    # walk contract: per group, kept = contiguous hash-ordered prefix
    # and the last kept doc crosses the budget
    for src, ks in kept.items():
        ks = sorted(ks, key=lambda r: r["tokens_before"])
        assert ks[0]["tokens_before"] == 0
        for a, b in zip(ks, ks[1:]):
            assert b["tokens_before"] == a["tokens_before"] + a["n_tokens"]
        assert ks[-1]["tokens_before"] < bh[src]
        assert ks[-1]["tokens_before"] + ks[-1]["n_tokens"] >= bh[src] or \
            len(ks) == {"big": 60, "small": 40}[src]  # or group exhausted
