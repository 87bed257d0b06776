"""Multimodal column plumbing (north-star extension).

Pattern: image/audio/video payloads are opaque ``binary`` columns with a
typed metadata struct; decode / feature-extraction runs as Arrow-batched
``mapInPandas`` so payload bytes never round-trip through Python row-by-row.

The actual media decode is STUBBED (no image/audio libs in this container):
``decode_image`` raises ``NotImplementedError`` unless a decoder is
injected; ``extract_features_batch`` uses a deterministic md5-based fake
"feature extractor" so the Spark-side plumbing — schema, batch iterator
shape, partition sizing — is fully real and testable.

Scale posture: mapInPandas streams Arrow record batches, so peak memory per
task is one batch (tune ``spark.sql.execution.arrow.maxRecordsPerBatch``
down for multi-MB payloads); payload columns are pruned unless referenced.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), True),
        StructField("payload", BinaryType(), True),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), True),
        StructField("n_bytes", LongType(), True),
        StructField("checksum", StringType(), True),
        StructField("feature", ArrayType(DoubleType()), True),
    ]
)


def decode_image(payload: bytes, decoder: Callable[[bytes], object] | None = None):
    """Decode an image payload. The container ships no codec; callers inject
    one (e.g. PIL.Image.open) — otherwise this is an explicit stub."""
    if decoder is None:
        raise NotImplementedError(
            "no image codec in this environment — inject decoder=PIL.Image.open "
            "(or equivalent) when available"
        )
    return decoder(payload)


def _fake_feature(digest: bytes, dim: int = 4) -> list[float]:
    """Deterministic stand-in for a real encoder: first ``dim`` digest bytes
    scaled to [0, 1]."""
    return [round(b / 255.0, 6) for b in digest[:dim]]


def extract_features_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas body: per Arrow batch, hash payloads and emit metadata +
    a (fake) feature vector. Replace ``_fake_feature`` with a real encoder
    call; the batch shape stays identical."""
    for pdf in batches:
        digests = [hashlib.md5(p).digest() for p in pdf["payload"]]
        yield pd.DataFrame(
            {
                "media_id": pdf["media_id"].astype("int64"),
                "n_bytes": pdf["payload"].map(len).astype("int64"),
                "checksum": [d.hex() for d in digests],
                "feature": [_fake_feature(d) for d in digests],
            }
        )


def media_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize a media table from ``documents`` (text bytes as payload) —
    exercises the binary-column path end-to-end without real media files."""
    from lakehouse_workshop_spark.catalog import load_table

    # Spread payload rows across workers: the parquet is one row group, and
    # mapInPandas parallelism equals input partitions.
    docs = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("text/fake").alias("media_type"),
        F.encode("text", "UTF-8").alias("payload"),
        F.lit(None).cast("long").alias("width"),
        F.lit(None).cast("long").alias("height"),
    )


def extract_features(media: DataFrame) -> DataFrame:
    """Feature-extraction operator: Arrow-batched mapInPandas over payloads."""
    return media.mapInPandas(extract_features_batch, schema=FEATURE_SCHEMA)


# --- resize / frame-sample plumbing ---------------------------------------

RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), True),
        StructField("media_type", StringType(), True),
        StructField("payload", BinaryType(), True),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), True),
        StructField("frame_no", LongType(), True),
        StructField("frame_payload", BinaryType(), True),
    ]
)


def resize_images(
    media: DataFrame,
    width: int,
    height: int,
    resizer: Callable[[bytes, int, int], bytes] | None = None,
) -> DataFrame:
    """Resize operator: Arrow-batched mapInPandas; codec injected.

    Without a codec in the image (this container), ``resizer=None`` keeps
    the payload bytes and stamps the target dims — the partitioning, batch
    iteration, and schema are the real production shape; swapping in
    ``resizer=lambda b, w, h: PIL_resize(b, w, h)`` is the only change.
    """

    def body(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            if resizer is not None:
                out["payload"] = [resizer(p, width, height) for p in out["payload"]]
            out["width"] = width
            out["height"] = height
            yield out[["media_id", "media_type", "payload", "width", "height"]]

    return media.mapInPandas(body, schema=RESIZED_SCHEMA)


def sample_frames(
    media: DataFrame,
    every_n_bytes: int = 64,
    max_frames: int = 8,
    decoder: Callable[[bytes], list[bytes]] | None = None,
) -> DataFrame:
    """Frame-sampling operator for video payloads (1 row in → ≤k frames out).

    With no video codec available, the deterministic fake treats every
    ``every_n_bytes`` slice of the payload as a "frame" — exercising the
    row-expanding mapInPandas shape (output cardinality > input) that a
    real ffmpeg-style sampler needs. Inject ``decoder`` to decode real
    containers; batch shape is unchanged.
    """

    def body(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[int] = []
            nos: list[int] = []
            frames: list[bytes] = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                chunks = (
                    decoder(payload)
                    if decoder is not None
                    else [
                        payload[i : i + every_n_bytes]
                        for i in range(0, len(payload), every_n_bytes)
                    ]
                )
                for no, chunk in enumerate(chunks[:max_frames]):
                    ids.append(int(mid))
                    nos.append(no)
                    frames.append(bytes(chunk))
            yield pd.DataFrame(
                {"media_id": ids, "frame_no": nos, "frame_payload": frames}
            )

    return media.mapInPandas(body, schema=FRAME_SCHEMA)
