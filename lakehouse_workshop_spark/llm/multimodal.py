"""Multimodal column plumbing (north-star extension).

Pattern: image/audio/video payloads are opaque ``binary`` columns with a
typed metadata struct; decode / feature-extraction runs as Arrow-batched
``mapInPandas`` so payload bytes never round-trip through Python row-by-row.

Decode status: binary PPM (P6) decodes NATIVELY (pure-numpy codec below —
real decode executes in this container, distributed, via the
``image_decode_stats`` query over engine-synthesized PPM payloads). Every
other format (JPEG/PNG/audio/video) still needs an injected codec —
``decode_image`` raises ``NotImplementedError`` for those, explicitly.
``extract_features_batch`` keeps a deterministic md5-based fake "feature
extractor" so the batch plumbing is oracle-checkable end-to-end.

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


# --- built-in PPM (P6) codec ------------------------------------------------
# The one raster format decodable with numpy alone (no codec libs ship in
# this container): binary PPM = "P6\n<w> <h>\n<maxval>\n" + raw RGB bytes.
# encode_ppm writes the canonical header; decode_ppm parses exactly that
# canonical form (no comment lines — this engine writes its own payloads).
PPM_MAGIC = b"P6"


def encode_ppm(pixels) -> bytes:
    """Encode an HxWx3 uint8 array as binary PPM (P6)."""
    import numpy as np

    arr = np.asarray(pixels, dtype=np.uint8)
    h, w, c = arr.shape
    assert c == 3, "P6 is RGB"
    return b"P6\n%d %d\n255\n" % (w, h) + arr.tobytes()


def decode_ppm(payload: bytes):
    """Decode a canonical binary PPM (P6) payload to an HxWx3 uint8 array."""
    import numpy as np

    if not payload.startswith(PPM_MAGIC):
        raise ValueError("not a binary PPM (P6) payload")
    magic, dims, maxval, raster = bytes(payload).split(b"\n", 3)
    w, h = (int(x) for x in dims.split())
    if int(maxval) != 255:
        raise ValueError("only 8-bit PPM supported")
    return np.frombuffer(raster[: w * h * 3], dtype=np.uint8).reshape(h, w, 3)


def decode_image(payload: bytes, decoder: Callable[[bytes], object] | None = None):
    """Decode an image payload.

    PPM (P6) decodes natively via :func:`decode_ppm` (pure numpy — really
    executes in this container; exercised distributed by the
    ``image_decode_stats`` query). Any other format needs an injected
    codec (e.g. ``PIL.Image.open``) — without one this raises, explicitly.
    """
    if decoder is not None:
        return decoder(payload)
    if bytes(payload[:2]) == PPM_MAGIC:
        return decode_ppm(payload)
    raise NotImplementedError(
        "no codec for this format in this environment — inject "
        "decoder=PIL.Image.open (or equivalent) when available"
    )


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


PPM_SIDE = 8  # synthesized images are PPM_SIDE x PPM_SIDE RGB


def media_ppm_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize a REAL image table from ``documents``: each doc becomes an
    8×8 RGB binary-PPM payload whose 192 pixel bytes are md5(text) repeated
    12× — deterministic, so SQL can recompute any pixel statistic from the
    digest hex without decoding. Payloads are genuine P6 files (header +
    raster) that :func:`decode_ppm` — or any external viewer — decodes.
    """
    import hashlib

    import numpy as np

    from lakehouse_workshop_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    n_px_bytes = PPM_SIDE * PPM_SIDE * 3  # 192 = 12 x 16 digest bytes

    def body(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        reps = n_px_bytes // 16
        for pdf in batches:
            payloads = []
            for text in pdf["text"]:
                digest = hashlib.md5(text.encode("utf-8")).digest()
                pixels = np.frombuffer(digest * reps, dtype=np.uint8).reshape(
                    PPM_SIDE, PPM_SIDE, 3
                )
                payloads.append(encode_ppm(pixels))
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"].astype("int64"),
                    "media_type": "image/x-portable-pixmap",
                    "payload": payloads,
                    "width": PPM_SIDE,
                    "height": PPM_SIDE,
                }
            )

    return docs.select("doc_id", "text").mapInPandas(body, schema=MEDIA_SCHEMA)


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
