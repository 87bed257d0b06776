"""Semantic tests for the training-data pipeline + CDC operators (the
DuckDB parity suite checks values; these check the *properties* that make
the ops fit for production use)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lakehouse_workshop_spark.operators import llm_pipeline as P
from lakehouse_workshop_spark.operators import cdc
from lakehouse_workshop_spark.catalog import load_table


def test_split_fractions_and_determinism(spark, sf_dir):
    out = P.train_val_test_split(spark, sf_dir)
    frac = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    n = sum(frac.values())
    assert frac["train"] / n == pytest.approx(0.8, abs=0.08)
    assert frac.get("val", 0) / n == pytest.approx(0.1, abs=0.06)
    assert frac.get("test", 0) / n == pytest.approx(0.1, abs=0.06)
    # hash-based assignment: a second run (fresh plan) is identical
    again = P.train_val_test_split(spark, sf_dir)
    assert out.exceptAll(again).count() == 0


def test_split_disjoint_and_total(spark, sf_dir):
    out = P.train_val_test_split(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    assert out.count() == docs.count()
    assert out.select("doc_id").distinct().count() == docs.count()


def test_stratified_sample_is_subset_with_stable_rate(spark, sf_dir):
    sample = P.stratified_sample(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    assert sample.join(docs, "doc_id", "left_anti").count() == 0
    rate = sample.count() / docs.count()
    assert rate == pytest.approx(0.2, abs=0.08)


def test_shard_token_totals_bounded(spark, sf_dir):
    shards = P.shard_assignments(spark, sf_dir)
    per_shard = shards.groupBy("lang", "shard_id").agg(
        F.sum("n_tokens").alias("tok"), F.max("n_tokens").alias("max_doc")
    )
    # contiguous budget sharding: a shard never exceeds budget + one doc
    over = per_shard.filter(
        F.col("tok") > P.SHARD_TOKEN_BUDGET + F.col("max_doc")
    ).count()
    assert over == 0
    # shard ids start at 0 in every stratum
    assert (
        shards.groupBy("lang").agg(F.min("shard_id").alias("m")).filter("m != 0").count()
        == 0
    )


def test_merge_upsert_semantics(spark, sf_dir):
    merged = cdc.merge_upsert_orders(spark, sf_dir)
    orders = load_table(spark, sf_dir, "orders")
    # insert keys live strictly above the live key space (shift = max+1)
    shift = orders.agg(F.max("o_orderkey")).collect()[0][0]

    # keys stay unique after the merge
    assert merged.count() == merged.select("o_orderkey").distinct().count()

    # updated rows: status flipped to 'U', price bumped by exactly +10
    upd = merged.filter(
        (F.col("o_orderkey") % cdc.UPDATE_EVERY == 0)
        & (F.col("o_orderkey") <= shift)
    )
    assert upd.filter("o_orderstatus != 'U'").count() == 0
    joined = upd.alias("m").join(
        orders.select("o_orderkey", F.col("o_totalprice").alias("old")).alias("o"),
        "o_orderkey",
    )
    assert joined.filter(F.abs(F.col("o_totalprice") - F.col("old") - 10.0) > 1e-9).count() == 0

    # inserts appended under the shifted key space
    n_inserts = orders.filter(F.col("o_orderkey") % cdc.INSERT_EVERY == 0).count()
    assert merged.filter(F.col("o_orderkey") > shift).count() == n_inserts

    # untouched rows pass through byte-identical
    untouched = merged.filter(
        (F.col("o_orderkey") % cdc.UPDATE_EVERY != 0)
        & (F.col("o_orderkey") <= shift)
    )
    orig = orders.filter(F.col("o_orderkey") % cdc.UPDATE_EVERY != 0).select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    assert untouched.exceptAll(orig).count() == 0


def test_merge_upsert_broadcasts_updates(spark, sf_dir):
    plan = (
        cdc.merge_upsert_orders(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_salted_join_matches_plain_join_on_skewed_data(spark):
    from lakehouse_workshop_spark.functions.joins import salted_join

    # 90% of fact rows share one hot key — the shape AQE's splitter can't
    # fix when a single key dominates.
    fact = spark.range(10_000).selectExpr(
        "id AS row_id", "CASE WHEN id % 10 < 9 THEN 0 ELSE id % 100 END AS k"
    )
    dim = spark.range(100).selectExpr("id AS k", "concat('v', id) AS attr")

    plain = fact.join(dim, "k").select("row_id", "k", "attr")
    salted = salted_join(fact, dim, "k").select("row_id", "k", "attr")
    assert salted.count() == plain.count()
    assert salted.exceptAll(plain).count() == 0

    plan = salted._jdf.queryExecution().executedPlan().toString()
    assert "_join_salt" in plan  # the shuffle key includes the salt


# --- round-4 additions ------------------------------------------------------


def test_global_cumsum_matches_single_partition(spark):
    from pyspark.sql import Window, functions as F

    from lakehouse_workshop_spark.functions.exprs import global_cumsum

    df = spark.range(0, 1000, 1, 16).select(
        F.col("id").alias("k"), (F.col("id") % 17 + 1).alias("v")
    )
    got = {
        r.k: r.cum
        for r in global_cumsum(df, "v", "k", name="cum").collect()
    }
    want = {
        r.k: r.cum
        for r in df.withColumn(
            "cum",
            F.sum("v")
            .over(Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0))
            .cast("long"),
        ).collect()
    }
    assert got == want


def test_sequence_packing_partitions_token_stream(spark, sf_dir):
    from pyspark.sql import functions as F

    from lakehouse_workshop_spark.operators.llm_pipeline import (
        PACK_WINDOW_TOKENS,
        sequence_packing,
    )

    rows = sequence_packing(spark, sf_dir).orderBy("doc_id").collect()
    total = sum(r.n_tokens for r in rows)
    # windows cover the stream exactly: last window index = (total-1)//W
    assert max(r.end_window for r in rows) == (total - 1) // PACK_WINDOW_TOKENS
    assert min(r.start_window for r in rows) == 0
    # doc spans are contiguous in doc order: next doc starts in the same
    # window the previous ended in, or the next one
    for prev, cur in zip(rows, rows[1:]):
        assert cur.start_window in (prev.end_window, prev.end_window + 1)
        assert cur.n_windows == cur.end_window - cur.start_window + 1


def test_blocklist_scrub_removes_all_blocked_tokens(spark, sf_dir):
    from pyspark.sql import functions as F

    from lakehouse_workshop_spark.operators.llm_text import (
        BLOCKLIST,
        BLOCK_MARK,
        blocklist_scrub,
    )
    from lakehouse_workshop_spark.catalog import load_table

    out = blocklist_scrub(spark, sf_dir)
    # no blocklisted token survives; token count is preserved
    bad = out.filter(
        F.arrays_overlap(
            F.split("text_scrubbed", " "),
            F.array(*[F.lit(t) for t in BLOCKLIST]),
        )
    ).count()
    assert bad == 0
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split("text", " ")).alias("n")
    )
    mism = (
        out.select("doc_id", F.size(F.split("text_scrubbed", " ")).alias("m"))
        .join(docs, "doc_id")
        .filter("m <> n")
        .count()
    )
    assert mism == 0
    # the corpus genuinely exercises the scrub
    assert out.agg(F.sum("n_blocked")).collect()[0][0] > 0
    # scrub marks appear exactly n_blocked times
    marked = out.filter(F.col("n_blocked") > 0).limit(5).collect()
    for r in marked:
        assert r.text_scrubbed.split(" ").count(BLOCK_MARK) == r.n_blocked


def test_embedding_quantize_reconstruction_bound(spark, sf_dir):
    from pyspark.sql import functions as F

    from lakehouse_workshop_spark.operators.llm_similarity import (
        embedding_quantize_int8,
    )

    out = embedding_quantize_int8(spark, sf_dir).cache()
    assert out.filter(~F.col("recon_ok")).count() == 0
    assert out.filter(F.col("qscale") <= 0).count() == 0
    out.unpersist()


def test_incremental_near_dedup_semantics(spark, tmp_path):
    """r12: the ingest path's LSH near-dedup stage, pinned on a hand-built
    corpus where the expected drops are knowable by eye (the oracle
    parity check proves Spark==DuckDB; this proves both match the
    SPEC): a batch doc that near-duplicates a STANDING corpus doc drops;
    a within-batch near-dup pair keeps the lowest id; a unique batch
    doc survives. doc_ids are chosen so every doc passes the gate
    (pct<90, en, 100..100k chars) and the benchmark shingle set is
    empty (no corpus doc has pct>=90)."""
    from lakehouse_workshop_spark.operators.llm_pipeline import (
        materialize_training_set_incremental,
    )

    base = [f"alpha{i:02d}" for i in range(40)]
    t_corpus = " ".join(base)                      # corpus doc 1
    near = list(base)
    near[20] = "CHANGED"
    t_near = " ".join(near)                        # batch doc 9: near-dup of 1
    t_unique = " ".join(f"omega{i:02d}" for i in range(40))   # batch doc 19
    pair = [f"gamma{i:02d}" for i in range(40)]
    t_pair_lo = " ".join(pair)                     # batch doc 29 (kept)
    pair[39] = "SWAPPED"                           # last word: ONE shingle differs
    t_pair_hi = " ".join(pair)                     # batch doc 39 (dropped)

    rows = [
        (1, t_corpus),
        (9, t_near),
        (19, t_unique),
        (29, t_pair_lo),
        (39, t_pair_hi),
    ]
    spark.createDataFrame(
        [(i, t, "en", "web", len(t)) for i, t in rows],
        "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    got = {
        r.doc_id
        for r in materialize_training_set_incremental(
            spark, str(tmp_path)
        ).collect()
    }
    assert got == {19, 29}, (
        f"expected batch survivors {{19, 29}} (9 near-dups corpus doc 1, "
        f"39 near-dups lower-id batch doc 29), got {got}"
    )
