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
           CAST(i - 1 AS INT) AS dim_idx,
           ROUND(('0x' || substr(md5(text), 2*i-1, 2))::BIGINT / 255.0, 6)
               AS feature_val
    FROM documents
    CROSS JOIN (SELECT unnest(generate_series(1, 4)) AS i)
    """,
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-payload feature extraction via Arrow-batched mapInPandas.

    The payloads are document text bytes (ASCII — strlen == byte length in
    the oracle); a real deployment swaps the fake encoder for a codec call
    with the identical batch shape.

    The registered (driver-checked) shape posexplodes the feature vector to
    one scalar row per dimension: the driver's pandas canonicalizer crashes
    on array cells (round-1 ``unhashable type: 'list'``), and doubles
    compare bit-exactly where a float→string render would not. The
    array-shaped API is :func:`lakehouse_workshop_spark.llm.multimodal.extract_features`.
    """
    from pyspark.sql import functions as F

    feats = extract_features(media_from_documents(spark, sf_dir))
    return feats.select(
        "media_id",
        "n_bytes",
        "checksum",
        F.posexplode("feature").alias("dim_idx", "feature_val"),
    )


@query(
    "frame_samples",
    oracle="""
    WITH framed AS (
        SELECT doc_id AS media_id,
               unnest(generate_series(0,
                   least(CAST(ceil(strlen(text) / 64.0) AS BIGINT), 8) - 1)) AS frame_no,
               text
        FROM documents
    )
    SELECT media_id, frame_no,
           CAST(strlen(substr(text, frame_no * 64 + 1, 64)) AS BIGINT) AS n_bytes,
           md5(substr(text, frame_no * 64 + 1, 64)) AS frame_md5
    FROM framed
    """,
)
def frame_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-expanding frame sampler (video path) over binary payloads.

    One media row fans out to ≤8 "frames" (64-byte slices under the
    deterministic fake decoder) through ``mapInPandas`` — the exact batch
    shape an ffmpeg-backed sampler needs; the oracle reproduces slice
    lengths and checksums in SQL.
    """
    from pyspark.sql import functions as F

    from lakehouse_workshop_spark.llm.multimodal import sample_frames

    frames = sample_frames(media_from_documents(spark, sf_dir))
    return frames.select(
        "media_id",
        "frame_no",
        F.length("frame_payload").cast("bigint").alias("n_bytes"),
        F.md5("frame_payload").alias("frame_md5"),
    )


@query(
    "image_decode_stats",
    tier=2,
    oracle="""
    SELECT doc_id AS media_id,
           CAST(8 AS BIGINT) AS width,
           CAST(8 AS BIGINT) AS height,
           CAST(64 AS BIGINT) AS n_pixels,
           list_aggregate(
               list_transform(generate_series(0, 15),
                   i -> ('0x' || substr(md5(text), 2*i + 1, 2))::BIGINT),
               'avg') / 255.0 AS mean_intensity
    FROM documents
    """,
)
def image_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode, distributed: every synthesized binary-PPM payload
    is parsed by the pure-numpy P6 codec inside Arrow-batched mapInPandas
    (no fake here — the bytes on the wire are a genuine image file), and
    the decoded raster's dims + mean intensity are emitted.

    Value-check: the synthesized pixels are md5(text) repeated 12×, so the
    oracle recomputes the identical mean from the digest hex in SQL —
    a wrong header parse, byte order, or reshape diverges the hash.

    Scale: one mapInPandas pass (encode) feeding another (decode) — both
    Arrow-batched, payload bytes never row-trip Python; peak task memory
    is one record batch of 8×8 images.
    """
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    from lakehouse_workshop_spark.llm.multimodal import (
        decode_image,
        media_ppm_from_documents,
    )

    media = media_ppm_from_documents(spark, sf_dir)
    schema = StructType(
        [
            StructField("media_id", LongType(), True),
            StructField("width", LongType(), True),
            StructField("height", LongType(), True),
            StructField("n_pixels", LongType(), True),
            StructField("mean_intensity", DoubleType(), True),
        ]
    )

    def body(batches):
        import pandas as pd

        for pdf in batches:
            rows = {"media_id": [], "width": [], "height": [], "n_pixels": [], "mean_intensity": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                arr = decode_image(payload)  # native P6 path — real decode
                h, w, _ = arr.shape
                s192 = int(arr.sum())
                s16 = s192 // 12  # pixels are the 16-byte digest repeated 12x
                rows["media_id"].append(int(mid))
                rows["width"].append(w)
                rows["height"].append(h)
                rows["n_pixels"].append(w * h)
                # same op order as the oracle: (sum/16) then /255
                rows["mean_intensity"].append((float(s16) / 16.0) / 255.0)
            yield pd.DataFrame(rows)

    return media.mapInPandas(body, schema=schema)
