"""CDC upsert (MERGE INTO) — the core lakehouse write pattern.

The reference's platform runs MERGE natively on Delta
(``DE_data_preparation.py`` writes Delta tables; Delta MERGE rewrites only
the files containing matched keys). Without the Delta jar this engine
expresses the same semantics as the classic join-rewrite:

    merged = apply(updates) ∪ (target ⟕̸ updates)   -- anti-join keeps
                                                    -- untouched rows

Scale posture: the CDC batch is orders of magnitude smaller than the
target, so the anti-join broadcasts the update keys — the target is read
once, never shuffled. On a partitioned table the rewrite additionally
prunes to partitions containing matched keys (dynamic partition
overwrite); with Delta/Iceberg present, swap this operator for native
MERGE and keep the call site.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_workshop_spark.catalog import load_table
from lakehouse_workshop_spark.operators import query

# Deterministic synthetic CDC batch derived from the orders table itself:
# every 50th key is an update (+10.00 price, status 'U'); every 1000th key
# spawns an insert under a shifted key space. Additive price change — no
# float rounding ambiguity across engines.
UPDATE_EVERY = 50
INSERT_EVERY = 1000
INSERT_KEY_SHIFT = 10_000_000

_CDC_COLS = "o_orderkey, o_custkey, o_orderstatus, o_totalprice"

_DUCK_MERGE = f"""
WITH updates AS (
    SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
           o_totalprice + 10.0 AS o_totalprice
    FROM orders WHERE o_orderkey % {UPDATE_EVERY} = 0
    UNION ALL
    SELECT o_orderkey + {INSERT_KEY_SHIFT}, o_custkey, 'N', o_totalprice
    FROM orders WHERE o_orderkey % {INSERT_EVERY} = 0
)
SELECT {_CDC_COLS} FROM updates
UNION ALL
SELECT {_CDC_COLS} FROM orders t
WHERE NOT EXISTS (SELECT 1 FROM updates u WHERE u.o_orderkey = t.o_orderkey)
"""


def cdc_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The deterministic updates+inserts batch (see module docstring)."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    updates = orders.filter(F.col("o_orderkey") % UPDATE_EVERY == 0).select(
        "o_orderkey",
        "o_custkey",
        F.lit("U").alias("o_orderstatus"),
        (F.col("o_totalprice") + 10.0).alias("o_totalprice"),
    )
    inserts = orders.filter(F.col("o_orderkey") % INSERT_EVERY == 0).select(
        (F.col("o_orderkey") + INSERT_KEY_SHIFT).alias("o_orderkey"),
        "o_custkey",
        F.lit("N").alias("o_orderstatus"),
        "o_totalprice",
    )
    return updates.unionByName(inserts)


def merge_upsert(target: DataFrame, updates: DataFrame, key: str) -> DataFrame:
    """Join-rewrite MERGE: updates win on key match, unmatched target rows
    pass through, unmatched updates append. ``updates`` is broadcast — the
    target side never shuffles."""
    untouched = target.join(F.broadcast(updates.select(key)), key, "left_anti")
    return updates.unionByName(untouched.select(*updates.columns))


@query("merge_upsert_orders", oracle=_DUCK_MERGE, tier=2)
def merge_upsert_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE the deterministic CDC batch into orders (updates + inserts +
    pass-through), via broadcast anti-join — target read once, no shuffle."""
    target = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    return merge_upsert(target, cdc_batch(spark, sf_dir), "o_orderkey")
