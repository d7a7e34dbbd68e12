"""Multimodal columns: opaque binary payloads + typed metadata, processed
via Arrow-batched mapInPandas (north-star extension).

Model: a modality column is `payload: binary` plus a metadata struct
(mime, width/height/duration, etc.) — the same opaque-bytes shape as the
reference's Event.MetaData (api.go:17). All Spark-side plumbing (schema,
batch iteration, partition parallelism) is real and tested; the actual
codec step is stubbed because image/audio libraries are not in this
container — `decode_image` raises NotImplementedError unless
`fake=True`, which substitutes a deterministic pseudo-decode so the
pipeline shape (decode → feature-extract → aggregate) is exercised
end-to-end.

Scale posture: payloads never pass through the driver; mapInPandas streams
Arrow record batches executor-side, so the pipeline is bounded by
`spark.sql.execution.arrow.maxRecordsPerBatch` × mean payload size per
task — tune both for large blobs, and store payloads in the lake with the
metadata columns leading so pruning can skip bytes when only metadata is
queried.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

IMAGE_META = StructType(
    [
        StructField("mime", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


def with_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Fixture adapter: materialize an opaque binary payload column (the
    fixtures carry no real media, so bytes come from the text column)."""
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8"))


def decode_image(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    fake: bool = False,
) -> DataFrame:
    """Decode image payloads to (id, width, height, mean_luma).

    STUB: real decode needs an image codec (PIL/opencv — not installed).
    With fake=True a deterministic pseudo-decode derives dimensions and
    luminance from the payload bytes, keeping the distributed pipeline
    (Arrow batches, schema contract, partition parallelism) fully real.
    """
    if not fake:
        raise NotImplementedError(
            "image codecs not available in this environment; pass fake=True "
            "to exercise the pipeline with a deterministic pseudo-decode"
        )

    import pandas as pd

    out_schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
            StructField("mean_luma", IntegerType()),
        ]
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    # pseudo-decode: dimensions/luma are pure functions of the bytes
                    "width": payloads.map(lambda b: 16 + len(b) % 64),
                    "height": payloads.map(lambda b: 16 + (len(b) // 64) % 64),
                    "mean_luma": payloads.map(lambda b: sum(b[:32]) % 256 if len(b) else 0),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(decode, out_schema)


def frame_sample(
    df: DataFrame,
    every_nth: int = 10,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """Video frame sampling shape: one row per sampled frame offset.

    The split step is a deterministic chunker (real frame extraction needs
    a codec); the explode/partition shape is what matters at scale — frames
    fan out executor-side, never via the driver.
    """
    chunks = F.expr(
        f"transform(sequence(0, greatest(int(octet_length({payload_col}) / {every_nth}) - 1, 0)), "
        f"i -> struct(i as frame_idx, substring({payload_col}, i * {every_nth} + 1, {every_nth}) as frame_bytes))"
    )
    return df.select(id_col, F.explode(chunks).alias("frame")).select(
        id_col,
        F.col("frame.frame_idx").alias("frame_idx"),
        F.col("frame.frame_bytes").alias("frame_bytes"),
    )


def resize_image(
    df: DataFrame,
    target_w: int,
    target_h: int,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """Resize shape: (id, payload, width, height) -> same with target dims.

    STUB codec: the pseudo-resize scales the byte budget by the area ratio
    (truncate/cycle-pad), deterministic in the input bytes. The Spark-side
    contract is the real part: payload bytes round-trip executor-side
    through Arrow without driver involvement, and the output schema keeps
    the binary column + refreshed metadata.
    """
    import pandas as pd
    from pyspark.sql.types import BinaryType

    out_schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("payload", BinaryType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
        ]
    )

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            def scale(b: bytes) -> bytes:
                if not b:
                    return b
                src_area = (16 + len(b) % 64) * (16 + (len(b) // 64) % 64)
                n = max(1, int(len(b) * (target_w * target_h) / src_area))
                reps = (n + len(b) - 1) // len(b)
                return (b * reps)[:n]

            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "payload": pdf[payload_col].map(scale),
                    "width": target_w,
                    "height": target_h,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(resize, out_schema)


def decode_audio(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    fake: bool = False,
    sample_rate: int = 16_000,
) -> DataFrame:
    """Audio feature extraction: (id, sample_rate, n_samples, duration_s, rms).

    STUB: real decode needs an audio codec (ffmpeg/soundfile — not
    installed); fake=True treats the payload as 16-bit PCM so features are
    deterministic functions of the bytes while the Arrow-batched pipeline
    shape stays real.
    """
    if not fake:
        raise NotImplementedError(
            "audio codecs not available in this environment; pass fake=True "
            "to exercise the pipeline with a deterministic pseudo-decode"
        )

    import numpy as np
    import pandas as pd
    from pyspark.sql.types import DoubleType

    out_schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("sample_rate", IntegerType()),
            StructField("n_samples", LongType()),
            StructField("duration_s", DoubleType()),
            StructField("rms", DoubleType()),
        ]
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            def features(b: bytes) -> tuple[int, float, float]:
                samples = np.frombuffer(b[: len(b) - len(b) % 2], dtype="<i2").astype(np.float64)
                n = len(samples)
                rms = float(np.sqrt(np.mean(samples**2))) if n else 0.0
                return n, n / sample_rate, round(rms, 6)

            feats = pdf[payload_col].map(features)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "sample_rate": sample_rate,
                    "n_samples": feats.map(lambda t: t[0]),
                    "duration_s": feats.map(lambda t: t[1]),
                    "rms": feats.map(lambda t: t[2]),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(decode, out_schema)
