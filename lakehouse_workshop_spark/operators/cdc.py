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
# spawns an insert shifted above the live key space. The shift is derived
# from the data (MAX(o_orderkey), as an uncorrelated scalar subquery both
# engines evaluate identically) rather than a constant — a fixed
# 10_000_000 shift collides with real orderkeys once sf ≳ 1.7 (TPC-H max
# orderkey is 6M·sf), silently breaking MERGE key-uniqueness. Additive
# price change — no float rounding ambiguity across engines.
UPDATE_EVERY = 50
INSERT_EVERY = 1000
# +1 because orderkey 0 exists in the synthetic data: with a bare MAX
# shift, key 0 would map exactly onto the live max key.
_INSERT_KEY_SHIFT_SQL = "(SELECT MAX(o_orderkey) + 1 FROM orders)"

_CDC_COLS = "o_orderkey, o_custkey, o_orderstatus, o_totalprice"

# Portable SQL (identical text runs on Spark and DuckDB).
_CDC_BATCH_SQL = f"""
    SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
           o_totalprice + 10.0 AS o_totalprice
    FROM orders WHERE o_orderkey % {UPDATE_EVERY} = 0
    UNION ALL
    SELECT o_orderkey + {_INSERT_KEY_SHIFT_SQL} AS o_orderkey, o_custkey,
           'N' AS o_orderstatus, o_totalprice
    FROM orders WHERE o_orderkey % {INSERT_EVERY} = 0
"""

_DUCK_MERGE = f"""
WITH updates AS ({_CDC_BATCH_SQL})
SELECT {_CDC_COLS} FROM updates
UNION ALL
SELECT {_CDC_COLS} FROM orders t
WHERE NOT EXISTS (SELECT 1 FROM updates u WHERE u.o_orderkey = t.o_orderkey)
"""


def cdc_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The deterministic updates+inserts batch (see module docstring)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_CDC_BATCH_SQL)


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
