"""Multimodal column plumbing (north star).

Image/audio/video payloads are opaque ``binary`` columns with a typed
metadata struct.  The Spark-side machinery — schema, partition-friendly
layout, Arrow-batched UDF signatures, batch shapes — is real and tested;
the actual media decoding is stubbed (the codec libraries are not in
this container) behind ``decode_stub`` which either raises
``NotImplementedError`` (strict mode) or produces a deterministic fake
feature vector (test mode).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, n_bytes long, payload_hash string, feature array<double>"
)


def documents_as_media(documents: DataFrame) -> DataFrame:
    """Adapter: treat document text as an opaque binary payload with
    metadata — the same column layout a real image/audio table uses."""
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.col("text").cast("binary").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )


def payload_stats(media: DataFrame) -> DataFrame:
    """Byte-level stats over the binary column — pure column expressions
    (length/md5 operate on binary natively)."""
    return media.select(
        "media_id",
        F.length("payload").alias("n_bytes"),
        F.md5("payload").alias("payload_md5"),
        F.col("meta.mime").alias("mime"),
    )


def extract_features(media: DataFrame, strict: bool = False, dim: int = 8) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``mapInPandas`` processes whole record batches — the shape a real
    decoder (PIL/ffmpeg/torchaudio) plugs into.  STUB: in strict mode
    raises ``NotImplementedError`` (no codecs in this container); in
    test mode emits a deterministic md5-derived fake feature vector so
    the plumbing (schema, batching, partitioning) is exercised for real.
    """

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import hashlib

        import pandas as pd

        for pdf in batches:
            if strict:
                raise NotImplementedError(
                    "media decoding requires codec libraries not present in this "
                    "container; run with strict=False for the deterministic stub"
                )
            out = {"media_id": pdf["media_id"], "n_bytes": pdf["payload"].map(len)}
            digests = pdf["payload"].map(lambda b: hashlib.md5(b).hexdigest())
            out["payload_hash"] = digests
            out["feature"] = digests.map(
                lambda h: [int(h[i * 2 : i * 2 + 2], 16) / 255.0 for i in range(dim)]
            )
            yield pd.DataFrame(out)

    from ..sources.loaders import ensure_parallelism

    return ensure_parallelism(media).mapInPandas(run, schema=FEATURE_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plumbing: emit one row per sampled offset based on
    metadata duration — a pure relational explode (the decode of each
    frame would plug into ``extract_features``)."""
    n_frames = F.greatest(
        F.lit(1), (F.coalesce(F.col("meta.duration_ms"), F.lit(0)) / every_ms).cast("int")
    )
    return media.select(
        "media_id",
        F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx"),
    ).select("media_id", "frame_idx", (F.col("frame_idx") * every_ms).alias("offset_ms"))


def resize_media(
    media: DataFrame, width: int, height: int, strict: bool = False
) -> DataFrame:
    """Arrow-batched media resize plumbing (north star).

    Same ``mapInPandas`` shape as :func:`extract_features`: batches of
    (media_id, payload, meta) in, same schema out with the metadata
    dimensions rewritten.  STUB: strict mode raises (no codec libraries
    in this container); test mode passes the payload through untouched
    so the batch plumbing and schema contract are exercised for real —
    a PIL/ffmpeg implementation replaces only the body marked below."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            if strict:
                raise NotImplementedError(
                    "media resize requires codec libraries not present in this "
                    "container; run with strict=False for the pass-through stub"
                )
            # --- real decoder/encoder goes here ---
            out = pdf.copy()
            out["meta"] = [
                {**(m or {}), "width": width, "height": height} for m in pdf["meta"]
            ]
            yield out

    from ..sources.loaders import ensure_parallelism

    return ensure_parallelism(media).mapInPandas(run, schema=MEDIA_SCHEMA)
