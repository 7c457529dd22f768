"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed by Arrow-batched mapInPandas.

The decode step itself is STUBBED (no image/audio libs in this
container): `decode_image_batch` raises NotImplementedError unless
`fake=True`, in which case a deterministic fake decoder produces
(width, height, mean_byte) from the raw bytes — the Spark-side
contract (schema, batching, partitioning) is real and tested, and a
real decoder (PIL/ffmpeg on cluster images) drops in behind the same
signature.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, mime string, "
    "source_url string, captured_ts timestamp"
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, width int, height int, "
    "mean_byte double, payload_sha string"
)


def _fake_decode(payload: bytes) -> tuple[int, int, float]:
    """Deterministic stand-in for an image decoder: derives a plausible
    (width, height) from the length and the mean byte value. Replace
    with a real decoder on cluster images."""
    n = len(payload)
    width = max(1, int(np.sqrt(n)))
    height = max(1, n // width)
    mean = float(np.frombuffer(payload, dtype=np.uint8).mean()) if n else 0.0
    return width, height, mean


def decode_image_batch(payloads: pd.Series, fake: bool = False) -> pd.DataFrame:
    if not fake:
        raise NotImplementedError(
            "real image decoding needs PIL/opencv (not in this container); "
            "pass fake=True for the deterministic stand-in"
        )
    rows = [_fake_decode(bytes(p)) for p in payloads]
    return pd.DataFrame(rows, columns=["width", "height", "mean_byte"])


def extract_media_features(media: DataFrame, fake_decode: bool = True) -> DataFrame:
    """Feature extraction over binary payloads, single pass: length +
    sha256 are JVM column expressions (codegen, no Python); only the
    decode step crosses into Python, as one Arrow-batched struct-
    returning pandas UDF. At scale the input table is bucketed by
    media_id so downstream joins to features are shuffle-free."""
    from pyspark.sql import types as T
    from pyspark.sql.pandas.functions import pandas_udf

    ret = T.StructType(
        [
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("mean_byte", T.DoubleType()),
        ]
    )

    @pandas_udf(ret)
    def decode(payload: pd.Series) -> pd.DataFrame:
        return decode_image_batch(payload, fake=fake_decode)

    return media.select(
        "media_id",
        "kind",
        F.octet_length("payload").cast("long").alias("n_bytes"),
        decode(F.col("payload")).alias("_d"),
        F.sha2(F.col("payload"), 256).alias("payload_sha"),
    ).select(
        "media_id",
        "kind",
        "n_bytes",
        F.col("_d.width").alias("width"),
        F.col("_d.height").alias("height"),
        F.col("_d.mean_byte").alias("mean_byte"),
        "payload_sha",
    )


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling *plan*: one row per sampled frame index,
    derived from metadata only (the decode of each frame is the
    stubbed step). Shows the explode-then-process shape used at
    scale: frames explode map-side, decoding parallelizes per frame."""
    n_frames = (F.length("payload") / 1024).cast("int") + 1  # fake: 1 frame/KiB
    return media.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))
        ).alias("frame_idx"),
    )


def make_fake_media(spark, n: int = 200, seed: int = 5) -> DataFrame:
    """Deterministic synthetic media table for tests."""
    rng = np.random.RandomState(seed)
    kinds = ["image", "audio", "video"]
    rows = []
    base = pd.Timestamp("2024-01-01")
    for i in range(n):
        size = int(rng.randint(64, 4096))
        payload = rng.randint(0, 256, size=size, dtype=np.uint8).tobytes()
        rows.append(
            (
                i,
                kinds[i % 3],
                payload,
                f"{kinds[i % 3]}/fake",
                f"https://h{i % 50}.example.com/m/{i}",
                base + pd.Timedelta(seconds=int(i) * 7),
            )
        )
    pdf = pd.DataFrame(
        rows, columns=["media_id", "kind", "payload", "mime", "source_url", "captured_ts"]
    )
    return spark.createDataFrame(pdf, schema=MEDIA_SCHEMA)
