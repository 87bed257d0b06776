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
