"""Multimodal feature-extraction query (north-star extension).

The mapInPandas pipeline from ``llm.multimodal`` driven end-to-end. The
fake feature extractor is md5-derived, so even the Python-side batch path
is oracle-checkable: DuckDB reproduces byte lengths, checksums and the
scaled digest-byte features in SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from lakehouse_workshop_spark.llm.multimodal import extract_features, media_from_documents
from lakehouse_workshop_spark.operators import query


@query(
    "multimodal_features",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(strlen(text) AS BIGINT) AS n_bytes,
           md5(text) AS checksum,
           list_transform(generate_series(1, 4),
               i -> ROUND(('0x' || substr(md5(text), 2*i-1, 2))::BIGINT / 255.0, 6)
           ) AS feature
    FROM documents
    """,
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-payload feature extraction via Arrow-batched mapInPandas.

    The payloads are document text bytes (ASCII — strlen == byte length in
    the oracle); a real deployment swaps the fake encoder for a codec call
    with the identical batch shape.
    """
    return extract_features(media_from_documents(spark, sf_dir))
