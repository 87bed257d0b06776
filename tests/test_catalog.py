"""Catalog/ingestion layer tests (SURVEY.md §2.1 ops S1–S13).

Reproduces the reference's DE pipeline shape end-to-end on synthetic data:
CSV ingest with inference (ref DE_data_preparation.py:3-16) → managed-table
write (:28-29) → catalog read-back (+cache, DS:66) → CTAS (DS:352-354) →
views (DS:67,122-128) → DDL/describe (DE:23-24, DS:72) → pandas round-trip
(DS:173,331).
"""

from __future__ import annotations

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    FloatType,
    IntegerType,
    StructField,
    StructType,
)

from lakehouse_workshop_spark import catalog as cat

# Reference Summary_2011.csv shape (SURVEY.md §1.3): per-customer RFM-T rows.
CSV_TEXT = """CustomerID,T1,recency1,FREQUENCY,profit
12346,32,5,3,125.50
12347,51,50,12,3021.75
12348,2,1,1,0.54
"""

DECLARED = StructType(
    [
        StructField("CustomerID", IntegerType()),
        StructField("T1", IntegerType()),
        StructField("recency1", IntegerType()),
        StructField("FREQUENCY", IntegerType()),
        StructField("profit", FloatType()),
    ]
)


@pytest.fixture()
def csv_path(tmp_path):
    p = tmp_path / "summary.csv"
    p.write_text(CSV_TEXT)
    return str(p)


def test_csv_scan_infers_and_declares(spark, csv_path):
    inferred = cat.csv_scan(spark, csv_path)
    assert inferred.count() == 3
    # header parsed, numerics inferred (not all-string)
    assert "CustomerID" in inferred.columns
    assert dict(inferred.dtypes)["CustomerID"] == "int"

    declared = cat.csv_scan(spark, csv_path, schema=DECLARED)
    assert [f.dataType for f in declared.schema.fields] == [
        f.dataType for f in DECLARED.fields
    ]
    assert declared.count() == 3


def test_managed_table_roundtrip_and_ctas(spark, csv_path):
    """S2/S4/S7/S8/S9/S10: DE pipeline → managed tables → CTAS rollup."""
    cat.create_database(spark, "customer_info_test")
    cat.drop_table(spark, "customer_info_test.summary")
    df = cat.csv_scan(spark, csv_path, schema=DECLARED)
    cat.write_table(df, "customer_info_test.summary")

    back = cat.catalog_scan(spark, "customer_info_test.summary", cache=True)
    assert back.count() == 3
    assert back.is_cached

    out = cat.ctas(
        spark,
        "customer_info_test.repeat_customers",
        "SELECT CustomerID, profit FROM customer_info_test.summary WHERE FREQUENCY > 1",
    )
    assert out.count() == 2

    desc = cat.describe(spark, "customer_info_test.repeat_customers")
    cols = {r["col_name"] for r in desc.collect()}
    assert {"CustomerID", "profit"} <= cols

    back.unpersist()
    cat.drop_table(spark, "customer_info_test.repeat_customers")
    cat.drop_table(spark, "customer_info_test.summary")


def test_views_and_pandas_boundary(spark, csv_path):
    """S5/S6/S11/S12: temp views over DataFrames and SQL, Arrow round-trip."""
    df = cat.csv_scan(spark, csv_path, schema=DECLARED)
    cat.temp_view(df, "summary_v")
    v = cat.create_view_as(
        spark, "repeat_v", "SELECT * FROM summary_v WHERE FREQUENCY > 1"
    )
    assert v.count() == 2

    pdf = v.toPandas()  # S12
    assert isinstance(pdf, pd.DataFrame) and len(pdf) == 2
    rt = spark.createDataFrame(pdf)  # S11
    assert rt.count() == 2
    assert sorted(rt.columns) == sorted(v.columns)


def test_path_scan_parquet_roundtrip(spark, tmp_path):
    """S3: path-addressed scan of engine-written storage."""
    src = spark.range(10).withColumnRenamed("id", "n")
    dest = str(tmp_path / "tbl")
    src.write.parquet(dest)
    assert cat.path_scan(spark, dest).count() == 10


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    """Two tables bucketed on the join key must join shuffle-free."""
    from lakehouse_workshop_spark.catalog import load_table, write_bucketed, drop_table

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    write_bucketed(orders, "b_orders", buckets=8, key="o_custkey")
    write_bucketed(
        customer.withColumnRenamed("c_custkey", "o_custkey"),
        "b_customer",
        buckets=8,
        key="o_custkey",
    )
    try:
        joined = spark.table("b_orders").join(spark.table("b_customer"), "o_custkey")
        # Force a non-broadcast plan decision by disabling broadcast threshold
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert joined.count() > 0
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        drop_table(spark, "b_orders")
        drop_table(spark, "b_customer")


def test_partitioned_write_prunes_partitions(spark, sf_dir):
    """A filter on the partition column must prune at plan time."""
    from pyspark.sql import functions as F

    from lakehouse_workshop_spark.catalog import drop_table, load_table, write_partitioned

    orders = load_table(spark, sf_dir, "orders").withColumn(
        "order_year", F.year("o_orderdate")
    )
    write_partitioned(orders, "p_orders", partition_by="order_year")
    try:
        q = spark.table("p_orders").filter(F.col("order_year") == 1995)
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters: [isnotnull(order_year" in plan, plan
        # pruned read returns exactly the 1995 rows
        expected = orders.filter(F.col("order_year") == 1995).count()
        assert q.count() == expected > 0
    finally:
        drop_table(spark, "p_orders")


# --- S2/S3 Delta probe branches (delta jars absent from this image) --------


def test_delta_probe_branches_via_fake_jvm():
    """delta_available is a JVM class probe; drive both branches with a
    fake _jvm so the degrade logic is tested even where the jar is absent
    (ref writes Delta at DE_data_preparation.py:29; this image has no
    delta-spark, so write paths degrade to parquet)."""
    from types import SimpleNamespace

    def fake_spark(forname):
        cls = SimpleNamespace(forName=forname)
        return SimpleNamespace(_jvm=SimpleNamespace(java=SimpleNamespace(lang=SimpleNamespace(Class=cls))))

    present = fake_spark(lambda name: object())
    absent = fake_spark(lambda name: (_ for _ in ()).throw(Exception("no class")))
    assert cat.delta_available(present) is True
    assert cat.delta_available(absent) is False
    assert cat.table_format(present) == "delta"
    assert cat.table_format(absent) == "parquet"


def test_forced_delta_format_reaches_source_resolution(spark, csv_path, monkeypatch):
    """With the probe mocked True, write_table really asks Spark for the
    'delta' source — proving the branch wires the format through (the
    resolution error names the missing datasource, not some earlier
    failure)."""
    monkeypatch.setattr(cat, "delta_available", lambda s: True)
    df = cat.csv_scan(spark, csv_path)
    with pytest.raises(Exception, match="(?i)delta"):
        cat.write_table(df, "default.delta_probe_tbl")
    cat.drop_table(spark, "default.delta_probe_tbl")


# --- Z-order clustering + compaction (lakehouse maintenance) ---------------


def test_zorder_write_skips_files_on_both_dims(spark, sf_dir, tmp_path):
    """A Z-ordered rewrite must give usable per-file min/max pruning on
    BOTH clustering columns; a single-column sort only prunes its own
    column. Assert with the parquet footers: for each dimension, a
    mid-range point predicate must overlap strictly fewer z-ordered files
    than the worst dimension of the single-sort layout."""
    import pyarrow.parquet as pq

    orders = cat.load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    zdir, sdir = str(tmp_path / "z"), str(tmp_path / "s")
    cat.write_zordered(orders, zdir, ["o_custkey", "o_totalprice"], n_files=8)
    (
        orders.repartitionByRange(8, "o_custkey")
        .sortWithinPartitions("o_custkey")
        .write.parquet(sdir)
    )

    def overlaps(d, col, point):
        hits = 0
        for f in os.listdir(d):
            if not f.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(d, f)).metadata
            sch = {md.schema.column(i).name: i for i in range(md.num_columns)}
            st = md.row_group(0).column(sch[col]).statistics
            mn, mx = st.min, st.max
            for rg in range(1, md.num_row_groups):
                s2 = md.row_group(rg).column(sch[col]).statistics
                mn, mx = min(mn, s2.min), max(mx, s2.max)
            if mn <= point <= mx:
                hits += 1
        return hits

    mid_cust = orders.agg(F.expr("percentile(o_custkey, 0.5)")).collect()[0][0]
    mid_price = orders.agg(F.expr("percentile(o_totalprice, 0.5)")).collect()[0][0]
    z_worst = max(
        overlaps(zdir, "o_custkey", mid_cust),
        overlaps(zdir, "o_totalprice", mid_price),
    )
    s_worst = max(
        overlaps(sdir, "o_custkey", mid_cust),
        overlaps(sdir, "o_totalprice", mid_price),
    )
    # single-sort: the unsorted dim overlaps every file (8); z-order must
    # beat that on its worst dim.
    assert s_worst == 8
    assert z_worst < s_worst


def test_compact_files_reduces_count_and_preserves_rows(spark, sf_dir, tmp_path):
    path = str(tmp_path / "frag")
    orders = cat.load_table(spark, sf_dir, "orders")
    orders.repartition(20).write.parquet(path)
    n = orders.count()
    before, after = cat.compact_files(spark, path, target_file_bytes=1 << 30)
    assert before == 20 and after == 1
    assert spark.read.parquet(path).count() == n


def test_compact_files_preserve_order_keeps_stats_tight(spark, sf_dir, tmp_path):
    import pyarrow.parquet as pq

    path = str(tmp_path / "frag2")
    orders = cat.load_table(spark, sf_dir, "orders")
    orders.repartition(16).write.parquet(path)
    cat.compact_files(
        spark, path, target_file_bytes=1, preserve_order_by="o_orderdate"
    )
    files = sorted(
        f for f in os.listdir(path) if f.endswith(".parquet")
    )
    assert len(files) > 1
    # range-partitioned files own disjoint o_orderdate ranges
    spans = []
    for f in files:
        md = pq.ParquetFile(os.path.join(path, f)).metadata
        sch = {md.schema.column(i).name: i for i in range(md.num_columns)}
        st = md.row_group(0).column(sch["o_orderdate"]).statistics
        spans.append((st.min, st.max))
    spans.sort()
    for (a_lo, a_hi), (b_lo, b_hi) in zip(spans, spans[1:]):
        assert a_hi <= b_lo


# --- snapshot versioning + schema evolution --------------------------------


def test_snapshot_time_travel(spark, sf_dir, tmp_path):
    path = str(tmp_path / "snap")
    orders = cat.load_table(spark, sf_dir, "orders")
    v0 = cat.snapshot_write(orders.filter(F.col("o_orderstatus") == "F"), path)
    v1 = cat.snapshot_write(orders, path)
    assert (v0, v1) == (0, 1)
    assert cat.snapshot_versions(path) == [0, 1]
    n_f = orders.filter(F.col("o_orderstatus") == "F").count()
    # latest resolves to v1; versionAsOf-style read sees the old snapshot
    assert cat.snapshot_read(spark, path).count() == orders.count()
    assert cat.snapshot_read(spark, path, version=0).count() == n_f
    with pytest.raises(ValueError):
        cat.snapshot_read(spark, path, version=7)


def test_schema_evolution_additive_column(spark, sf_dir, tmp_path):
    path = str(tmp_path / "evolve")
    orders = cat.load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    cat.evolve_append(orders.limit(10), path)
    evolved = orders.limit(5).withColumn(
        "priority_score", F.col("o_totalprice") / 1000.0
    )
    cat.evolve_append(evolved, path)
    out = cat.evolved_read(spark, path)
    assert "priority_score" in out.columns
    assert out.count() == 15
    # pre-evolution rows surface the new column as NULL
    assert out.filter(F.col("priority_score").isNull()).count() == 10


def test_compact_files_sizes_hive_partitioned_layout(spark, sf_dir, tmp_path):
    """Partitioned layouts keep data files in key=value subdirs; the size
    walk must find them (a top-level listing sized the table at 0 and
    always coalesced to 1 file) and the swap must preserve every row."""
    path = str(tmp_path / "part")
    orders = cat.load_table(spark, sf_dir, "orders")
    orders.withColumn("stat", orders.o_orderstatus).repartition(4).write.partitionBy(
        "stat"
    ).parquet(path)
    n = orders.count()
    # tiny target: file count must be driven by actual recursive bytes
    before, after = cat.compact_files(spark, path, target_file_bytes=4 * 1024)
    assert before > 0
    assert after > 1  # a zero-size estimate would have coalesced to 1
    assert spark.read.parquet(path).count() == n
    assert not os.path.exists(path + "._compact_old")
    assert not os.path.exists(path + "._compact_tmp")


def test_zorder_bits_autoshrink_keeps_key_nonnegative(spark, sf_dir):
    """bits*len(cols) is capped at 63: with 5 columns the default 16 bits
    would wrap shiftleft mod 64; the guard shrinks bits so the key stays
    a nonnegative long for every row."""
    from pyspark.sql import functions as F

    li = cat.load_table(spark, sf_dir, "lineitem").limit(1000)
    cols = ["l_orderkey", "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice"]
    key = cat.zorder_key(li, cols)
    mn = li.select(F.min(key).alias("mn")).collect()[0]["mn"]
    assert mn >= 0


def test_path_roundtrip_every_spark_native_format(spark, tmp_path):
    """Source/sink breadth: parquet, ORC, JSON-lines, and CSV all
    round-trip by path (values preserved; CSV via explicit schema)."""
    import lakehouse_workshop_spark.catalog as cat

    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", -2.25), (3, None, 0.0)],
        ["id", "name", "score"],
    )
    expect = {(r.id, r.name, r.score) for r in df.collect()}
    for fmt in ("parquet", "orc", "json"):
        dest = str(tmp_path / fmt)
        cat.write_path(df, dest, fmt=fmt)
        got = cat.path_scan(spark, dest, fmt=fmt).select("id", "name", "score")
        assert {(r.id, r.name, r.score) for r in got.collect()} == expect, fmt
    dest = str(tmp_path / "csv")
    cat.write_path(df.coalesce(1), dest, fmt="csv")
    got = (
        spark.read.format("csv")
        .schema("id bigint, name string, score double")
        .load(dest)
    )
    assert {(r.id, r.name, r.score) for r in got.collect()} == expect


def test_table_stats_reads_footers_and_zorder_tightens_them(spark, tmp_path):
    """Footer stats come from metadata only, and z-ordered layout must
    tighten per-file min/max envelopes vs a shuffled layout."""
    import lakehouse_workshop_spark.catalog as cat
    from pyspark.sql import functions as F

    df = spark.range(4000).select(
        F.col("id").alias("a"), (F.col("id") * 7 % 4000).alias("b")
    )
    plain = str(tmp_path / "plain")
    zord = str(tmp_path / "zord")
    df.orderBy(F.md5(F.col("a").cast("string"))).repartition(8).write.parquet(plain)
    cat.write_zordered(df, zord, ["a", "b"], n_files=8)

    stats = cat.table_stats(zord, columns=["a"])
    assert stats and all(r["columns"]["a"]["min"] is not None for r in stats)
    assert sum(r["num_rows"] for r in stats) == 4000

    def avg_span(path):
        rows = cat.table_stats(path, columns=["a"])
        spans = [r["columns"]["a"]["max"] - r["columns"]["a"]["min"] for r in rows]
        return sum(spans) / len(spans)

    # random layout: every file spans ~the full domain. A 2-D z-curve
    # localizes each dimension to ~domain/sqrt(n_files) per file (8
    # files -> ~0.35x), so anything clearly below the full span proves
    # the clustering; 0.7x leaves noise headroom.
    assert avg_span(zord) < avg_span(plain) * 0.7


def test_bucketed_join_is_shuffle_free(spark, sf_dir):
    """The whole point of bucketing: the bucketed-on-key join plans with
    ZERO Exchange operators, while the plain-parquet join of the same
    relations must shuffle both sides."""
    from lakehouse_workshop_spark.catalog import (
        bucketed_join,
        load_table,
        write_bucketed,
    )

    orders = load_table(spark, sf_dir, "orders").withColumnRenamed(
        "o_orderkey", "orderkey"
    )
    lines = load_table(spark, sf_dir, "lineitem").withColumnRenamed(
        "l_orderkey", "orderkey"
    ).select("orderkey", "l_quantity", "l_extendedprice")
    write_bucketed(orders, "bkt_orders", "orderkey", buckets=8)
    write_bucketed(lines, "bkt_lineitem", "orderkey", buckets=8)
    # Force the SortMergeJoin path (tiny test tables would broadcast,
    # which proves nothing about bucketing) and compare physical plans
    # with and without the bucketed layout: the shuffle — Exchange
    # hashpartitioning — must vanish, and only because of the layout.
    old_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "bkt_orders", "bkt_lineitem", "orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, plan
        plain = orders.join(lines, "orderkey")
        plain_plan = plain._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" in plain_plan
        # bucketing changes layout, never results
        assert joined.count() == plain.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_bc)
        spark.sql("DROP TABLE IF EXISTS bkt_orders")
        spark.sql("DROP TABLE IF EXISTS bkt_lineitem")
