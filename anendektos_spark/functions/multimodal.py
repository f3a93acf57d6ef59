"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the pipeline as ``binary`` columns with a
typed metadata struct; decode / feature-extract / resize / frame-sample
run as Arrow-batched ``mapInPandas`` stages. The real codec libraries
(PIL/ffmpeg/librosa) are not in this container, so the decode kernels are
STUBS: ``decode_image``/``decode_audio`` raise NotImplementedError unless
``fake=True``, in which case a deterministic fake decoder (seeded from
the payload bytes) produces stable feature vectors — the Spark-side
plumbing (schema, batching, partition behavior, UDF signature) is real
and tested either way.

Scale notes: mapInPandas streams Arrow batches — payload bytes never
round-trip through Python row objects; `spark.sql.execution.arrow.
maxRecordsPerBatch` bounds batch memory for large payloads. Metadata
filters (mime, size) are pure Column ops that run BEFORE the Python
stage, so Catalyst prunes non-matching payloads out of the Arrow
transfer entirely.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, DoubleType, IntegerType, LongType, StringType,
    StructField, StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("mime", StringType()),
    StructField("n_bytes", LongType()),
    StructField("payload", BinaryType()),
])

IMAGE_FEATURES_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("mime", StringType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("features", ArrayType(DoubleType())),
])


def synth_media(spark, n: int = 64, partitions: int = 4) -> DataFrame:
    """Deterministic synthetic media table: payload = repeated digest of
    the id (binary), mime alternating image/audio. Generated distributed
    via spark.range — no driver-side collection."""
    return (
        spark.range(n)
        .repartition(partitions)
        .select(
            F.col("id").alias("media_id"),
            F.when(F.col("id") % 2 == 0, F.lit("image/png"))
            .otherwise(F.lit("audio/wav"))
            .alias("mime"),
            F.unbase64(F.base64(F.sha2(F.col("id").cast("string"), 256).cast("binary"))).alias(
                "payload"
            ),
        )
        .withColumn("n_bytes", F.length("payload").cast("long"))
        .select("media_id", "mime", "n_bytes", "payload")
    )


def _fake_decode(payload: bytes, n_features: int = 8) -> tuple[int, int, list[float]]:
    """Deterministic stand-in for a real image decode: dimensions and
    features derive from the payload digest only."""
    d = hashlib.sha256(payload).digest()
    width = 16 + d[0] % 64
    height = 16 + d[1] % 64
    feats = [round(b / 255.0, 6) for b in d[2 : 2 + n_features]]
    return width, height, feats


def extract_image_features(
    media: DataFrame, fake: bool = False, n_features: int = 8
) -> DataFrame:
    """Decode + feature-extract image payloads via Arrow-batched
    mapInPandas. Real decode is stubbed (no codec libs in-container);
    ``fake=True`` switches to the deterministic fake decoder.

    ``run`` is a closure with no module-global references (imports
    inside) so cloudpickle ships it by value — executors never need
    this package importable (same rule as addrs.py)."""

    def run(batches):
        import hashlib as _hl

        import pandas as _pd

        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real image decode requires PIL/libvips — not in this container; "
                    "pass fake=True for the deterministic stub"
                )
            out = {"media_id": [], "mime": [], "width": [], "height": [], "features": []}
            for mid, mime, payload in zip(pdf["media_id"], pdf["mime"], pdf["payload"]):
                d = _hl.sha256(bytes(payload)).digest()
                out["media_id"].append(mid)
                out["mime"].append(mime)
                out["width"].append(16 + d[0] % 64)
                out["height"].append(16 + d[1] % 64)
                out["features"].append([round(b / 255.0, 6) for b in d[2 : 2 + n_features]])
            yield _pd.DataFrame(out)

    images = media.filter(F.col("mime").startswith("image/"))
    return images.select("media_id", "mime", "payload").mapInPandas(
        run, schema=IMAGE_FEATURES_SCHEMA
    )


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling *plan*: pure-metadata expansion of which
    frame indices would be decoded (the decode itself is the stub above).
    Shows the explode-based fan-out shape a real sampler uses."""
    n_frames = (F.col("n_bytes") % 100 + 1).cast("int")
    idx = F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))
    return media.select(
        "media_id", F.explode(idx).alias("frame_idx"), n_frames.alias("n_frames")
    )
