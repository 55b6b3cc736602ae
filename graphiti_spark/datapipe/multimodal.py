"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the pipeline as `binary` columns with a
typed metadata struct; decode/feature-extraction are Arrow-batched pandas
UDFs over mapInPandas. The decode kernels themselves are STUBS in this
sandbox (no image/audio libraries are installed — see `decode_image_stub`),
but the Spark-side contract — schema, batch iteration, partition sizing,
deterministic fake features for tests — is real and tested.

Scale design:
 - payloads dominate row size; keep `spark.sql.files.maxPartitionBytes` at
   128 MB so one task holds a bounded number of payloads per Arrow batch,
 - metadata-only queries never touch the binary column (Parquet column
   pruning: select the struct, skip the blob),
 - feature extraction is mapInPandas (iterator form) so a task streams
   batches instead of materializing the whole partition.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("media_type", StringType()),  # image | audio | video
        StructField("payload", StringType()),  # placeholder: set via binary col
    ]
)

FEATURE_DIM = 16

_FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", IntegerType()),
        StructField("payload_md5", StringType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def attach_payloads(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Build a multimodal table from the documents fixture: payload =
    utf-8 bytes of the text (an opaque deterministic blob standing in for
    image bytes), media_type round-robined by id."""
    mt = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col(id_col) % 3 + 1).cast("int"),
    )
    return docs.select(
        F.col(id_col).cast("string").alias("doc_id"),
        mt.alias("media_type"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
    )


def decode_image_stub(payload: bytes) -> "object":
    """REAL DECODE NOT AVAILABLE IN THIS SANDBOX.

    A production deployment plugs Pillow/torchaudio/decord here; the
    surrounding plumbing (batching, schema, determinism) is unchanged.
    """
    raise NotImplementedError(
        "image/audio decode requires media libraries not present in this "
        "container; use fake_features() which is a deterministic stand-in"
    )


def fake_features(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic pseudo-features from payload bytes: md5-seeded values in
    [-1, 1). Pure function of the payload — stable across executors."""
    h = hashlib.md5(payload).digest()
    out: list[float] = []
    seed = h
    while len(out) < dim:
        seed = hashlib.md5(seed).digest()
        for i in range(0, len(seed) - 1, 2):
            if len(out) >= dim:
                break
            v = int.from_bytes(seed[i : i + 2], "big") / 32768.0 - 1.0
            out.append(float(v))
    return out


def extract_features(media: DataFrame, use_real_decode: bool = False) -> DataFrame:
    """mapInPandas feature extraction over (doc_id, media_type, payload).

    Iterator-of-batches form: each Arrow batch is processed and yielded
    without materializing the partition — the shape a real image tower needs
    (bounded peak memory per task at 100 TB).
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            if use_real_decode:
                for p in payloads:
                    decode_image_stub(p)  # raises NotImplementedError by design
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [len(p) if p is not None else 0 for p in payloads],
                    "payload_md5": [
                        hashlib.md5(p if p is not None else b"").hexdigest() for p in payloads
                    ],
                    "features": [fake_features(p if p is not None else b"") for p in payloads],
                }
            )

    return media.mapInPandas(_extract, schema=_FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling plan: metadata-only projection (payload column
    untouched -> Parquet scan prunes the blob). Emits the frame indices a
    decoder would extract; the decode itself is the stubbed stage."""
    n_frames = F.pmod(F.conv(F.substring(F.md5(F.col("doc_id")), 1, 4), 16, 10).cast("int"), F.lit(300)) + 30
    idx = F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))
    return media.filter(F.col("media_type") == "video").select(
        "doc_id", n_frames.alias("n_frames"), idx.alias("sample_frames")
    )
