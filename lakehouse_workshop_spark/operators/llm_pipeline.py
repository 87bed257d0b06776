"""Training-data pipeline operators (engine extension, COVERAGE.md §LLM).

The ops a 100 TB corpus pipeline runs between dedup and training:
deterministic dataset splitting, hash-stratified sampling, and
token-budget sharding. All assignments are content/key-hash based — no
RNG — so they are reproducible across engines (md5 is the portable hash:
Spark's ``hash()``/``rand()`` have no DuckDB equivalent), across reruns,
and across cluster sizes: every op is a narrow map or a
stratum-partitioned window, no global shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from lakehouse_workshop_spark.catalog import load_table
from lakehouse_workshop_spark.operators import query

# train/val/test fractions in percent (cumulative cutoffs).
SPLIT_TRAIN_PCT = 80
SPLIT_VAL_PCT = 90  # 80–90 → val, 90+ → test
SAMPLE_PCT = 20
SHARD_TOKEN_BUDGET = 2000


def _md5_pct(key_sql: str) -> str:
    """Spark SQL: deterministic 0–99 bucket from the md5 of a key."""
    return f"CAST(conv(substring(md5(CAST({key_sql} AS STRING)), 1, 4), 16, 10) AS INT) % 100"


def _duck_md5_pct(key_sql: str) -> str:
    """DuckDB: the same 0–99 bucket (identical md5 → identical assignment)."""
    return f"CAST(('0x' || substr(md5(CAST({key_sql} AS VARCHAR)), 1, 4))::BIGINT AS INT) % 100"


@query(
    "train_val_test_split",
    tier=2,
    oracle=f"""
    SELECT doc_id,
           CASE WHEN {_duck_md5_pct('doc_id')} < {SPLIT_TRAIN_PCT} THEN 'train'
                WHEN {_duck_md5_pct('doc_id')} < {SPLIT_VAL_PCT} THEN 'val'
                ELSE 'test' END AS split
    FROM documents
    """,
)
def train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 split by md5(doc_id).

    Hash-assignment (not ``rand()``) means the split is stable under
    re-partitioning, retries, incremental appends, and engine changes —
    the properties a training corpus split must have. Narrow map; the
    predicate pushes into the scan when a consumer filters one split.
    """
    docs = load_table(spark, sf_dir, "documents")
    pct = F.expr(_md5_pct("doc_id"))
    return docs.select(
        "doc_id",
        F.when(pct < SPLIT_TRAIN_PCT, "train")
        .when(pct < SPLIT_VAL_PCT, "val")
        .otherwise("test")
        .alias("split"),
    )


@query(
    "stratified_sample",
    tier=2,
    oracle=f"""
    SELECT doc_id, lang
    FROM documents
    WHERE {_duck_md5_pct('doc_id')} < {SAMPLE_PCT}
    """,
)
def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~20% per-document sample.

    The md5 bucket is uniform within every stratum, so the sample is
    stratified over ``lang`` (and any other column) without a shuffle —
    unlike ``df.sampleBy``, repeat runs and different partitionings return
    the identical sample.
    """
    docs = load_table(spark, sf_dir, "documents")
    return docs.filter(F.expr(_md5_pct("doc_id")) < SAMPLE_PCT).select("doc_id", "lang")


@query(
    "shard_assignments",
    tier=2,
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, lang,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        FROM documents
    )
    SELECT doc_id, lang, n_tokens,
           CAST((SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                     ROWS UNBOUNDED PRECEDING) - n_tokens)
                // {SHARD_TOKEN_BUDGET} AS INT) AS shard_id
    FROM toks
    """,
)
def shard_assignments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack documents into ~token-budget shards, per language stratum.

    Contiguous sharding by running token count: shard = floor(cumulative
    tokens before this doc / budget) within (lang, doc_id order). The
    window is PARTITIONed by ``lang`` so no stage is global; at 100 TB the
    stratum key would widen (e.g. lang × source-bucket) to bound partition
    size. Deterministic — the same corpus always shards identically.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        "lang",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    staged = toks.withColumn(
        "_cum_before",
        (F.sum("n_tokens").over(w) - F.col("n_tokens")).cast("long"),
    )
    # integer `div` matches the oracle's `//` — float division of large
    # running sums would lose exactness
    return staged.withColumn(
        "shard_id", F.expr(f"CAST(_cum_before div {SHARD_TOKEN_BUDGET} AS INT)")
    ).drop("_cum_before")


CLEAN_LANGS = ("en", "de")
CLEAN_MIN_CHARS = 100
CLEAN_MAX_CHARS = 100_000


@query(
    "corpus_clean",
    tier=2,
    oracle=f"""
    WITH canon AS (
        SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)
    )
    SELECT d.doc_id, d.lang, d.n_chars
    FROM documents d JOIN canon ON canon.doc_id = d.doc_id
    WHERE d.lang IN {CLEAN_LANGS}
      AND d.n_chars BETWEEN {CLEAN_MIN_CHARS} AND {CLEAN_MAX_CHARS}
    """,
)
def corpus_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed corpus-cleaning pass a training pipeline actually runs:
    language allow-list + length gate + exact dedup (keep lowest doc_id per
    content hash), in one plan.

    Scale: the filters are scan-pushable and run BEFORE the dedup shuffle
    (Catalyst pushes them through the semi-join), so the single exchange
    carries only surviving rows; dedup is one hash-partitioned
    min-aggregate + left-semi join, the ``dedup_keep_canonical`` shape.
    """
    docs = load_table(spark, sf_dir, "documents")
    gated = docs.filter(
        F.col("lang").isin(*CLEAN_LANGS)
        & F.col("n_chars").between(CLEAN_MIN_CHARS, CLEAN_MAX_CHARS)
    )
    canon = docs.groupBy(F.md5("text")).agg(F.min("doc_id").alias("doc_id"))
    return gated.join(canon, "doc_id", "left_semi").select("doc_id", "lang", "n_chars")
