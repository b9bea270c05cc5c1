"""Multimodal column plumbing (north star).

Image/audio/video payloads are opaque ``binary`` columns with a typed
metadata struct.  The Spark-side machinery — schema, partition-friendly
layout, Arrow-batched UDF signatures, batch shapes — is real and tested.

Decoding has two modes:

- default (``strict=False``): a deterministic md5-derived fake feature
  vector / pass-through resize, so the plumbing is exercised without
  codec libraries (this is what the oracle-checked queries pin);
- ``strict=True``: a REAL decoder chain — Pillow via optional import
  when present (any format it knows), falling back to pure-stdlib
  decoders for PPM (P6) images and WAV audio, so the real path is
  unit-testable even in codec-less containers; unsupported mimes raise
  ``NotImplementedError`` with the install hint.
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


_PIL_CACHE: list = []  # [] = unprobed; [None] = absent; [Image] = present


def _optional_pil():
    """Pillow via optional import — None when absent (this container).

    Memoized: Python does not cache FAILED imports, so without the
    cache every decoded payload would re-run the import machinery
    (a sys.path directory scan per row inside the Arrow batch loop)."""
    if not _PIL_CACHE:
        try:
            from PIL import Image  # noqa: PLC0415

            _PIL_CACHE.append(Image)
        except ImportError:
            _PIL_CACHE.append(None)
    return _PIL_CACHE[0]


def _parse_ppm(payload: bytes) -> tuple[int, int, bytes]:
    """Pure-stdlib binary-PPM (P6) decode → (width, height, RGB bytes).

    PPM is the simplest real raster format: an ASCII header (magic,
    width, height, maxval, ``#`` comments allowed) followed by raw
    interleaved RGB.  A real format decoded with no codec library —
    which keeps the strict path honestly testable anywhere."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a binary PPM (P6) payload")
    fields: list[int] = []
    pos = 2
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to end of line
            pos = payload.index(b"\n", pos) + 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval, then raw pixel data
    width, height, maxval = fields
    if maxval != 255:
        raise ValueError(f"only maxval=255 PPM supported, got {maxval}")
    pixels = payload[pos : pos + width * height * 3]
    if len(pixels) != width * height * 3:
        raise ValueError("truncated PPM pixel data")
    return width, height, pixels


def decode_image(payload: bytes, mime: str) -> tuple[int, int, bytes]:
    """Real image decode → (width, height, raw RGB bytes): Pillow when
    importable (any format it knows), else the stdlib PPM parser."""
    pil = _optional_pil()
    if pil is not None:
        import io

        img = pil.open(io.BytesIO(payload)).convert("RGB")
        return img.width, img.height, img.tobytes()
    if mime in ("image/x-portable-pixmap", "image/ppm"):
        return _parse_ppm(payload)
    raise NotImplementedError(
        f"no codec available for {mime}: install Pillow, or supply "
        "image/x-portable-pixmap payloads for the stdlib decoder"
    )


def decode_audio(payload: bytes) -> tuple[int, int, int, bytes]:
    """Real WAV decode via the stdlib ``wave`` module →
    (n_channels, framerate, n_frames, raw sample bytes)."""
    import io
    import wave

    with wave.open(io.BytesIO(payload), "rb") as w:
        if w.getsampwidth() != 2:
            raise ValueError("only 16-bit PCM WAV supported")
        return (
            w.getnchannels(),
            w.getframerate(),
            w.getnframes(),
            w.readframes(w.getnframes()),
        )


def _real_feature(payload: bytes, mime: str, dim: int) -> list[float]:
    """Decoded-content feature vector (strict mode): shape stats +
    per-channel means for images, duration/rate/RMS for audio — padded
    to ``dim`` so the output schema matches the stub path exactly."""
    mime = mime or ""
    if mime.startswith("image/"):
        width, height, rgb = decode_image(payload, mime)
        n = max(1, width * height)
        means = [
            sum(rgb[c::3]) / n / 255.0 for c in range(3)
        ]  # mean R, G, B
        vec = [width / 4096.0, height / 4096.0, *means]
    elif mime.startswith("audio/"):
        import array

        channels, rate, n_frames, raw = decode_audio(payload)
        samples = array.array("h", raw)
        n = max(1, len(samples))
        rms = (sum(s * s for s in samples) / n) ** 0.5
        vec = [
            channels / 8.0,
            rate / 48_000.0,
            n_frames / rate if rate else 0.0,
            rms / 32768.0,
        ]
    else:
        raise NotImplementedError(
            f"no decoder for mime {mime!r} (strict mode); run with "
            "strict=False for the deterministic stub"
        )
    vec = [round(v, 6) for v in vec[:dim]]
    return vec + [0.0] * (dim - len(vec))


def extract_features(media: DataFrame, strict: bool = False, dim: int = 8) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``mapInPandas`` processes whole record batches — the shape a real
    decoder (PIL/ffmpeg/torchaudio) plugs into.  Default mode emits a
    deterministic md5-derived fake feature vector (no codec needed —
    what the oracle-checked queries pin); ``strict=True`` decodes the
    payload for real (Pillow when installed, stdlib PPM/WAV otherwise)
    and emits content-derived features in the same schema."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import hashlib

        import pandas as pd

        for pdf in batches:
            out = {"media_id": pdf["media_id"], "n_bytes": pdf["payload"].map(len)}
            digests = pdf["payload"].map(lambda b: hashlib.md5(b).hexdigest())
            out["payload_hash"] = digests
            if strict:
                mimes = [(m or {}).get("mime") for m in pdf["meta"]]
                out["feature"] = [
                    _real_feature(payload, mime, dim)
                    for payload, mime in zip(pdf["payload"], mimes)
                ]
            else:
                out["feature"] = digests.map(
                    lambda h: [
                        int(h[i * 2 : i * 2 + 2], 16) / 255.0 for i in range(dim)
                    ]
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


def _resize_rgb_nearest(
    rgb: bytes, w: int, h: int, new_w: int, new_h: int
) -> bytes:
    """Pure-stdlib nearest-neighbor resample of raw interleaved RGB."""
    out = bytearray(new_w * new_h * 3)
    for y in range(new_h):
        sy = min(h - 1, y * h // new_h)
        row = sy * w * 3
        for x in range(new_w):
            sx = min(w - 1, x * w // new_w)
            src = row + sx * 3
            dst = (y * new_w + x) * 3
            out[dst : dst + 3] = rgb[src : src + 3]
    return bytes(out)


def encode_ppm(width: int, height: int, rgb: bytes) -> bytes:
    """Binary-PPM (P6) encode — the stdlib-only inverse of _parse_ppm."""
    return b"P6\n%d %d\n255\n" % (width, height) + rgb


def resize_media(
    media: DataFrame, width: int, height: int, strict: bool = False
) -> DataFrame:
    """Arrow-batched media resize (north star).

    Same ``mapInPandas`` shape as :func:`extract_features`: batches of
    (media_id, payload, meta) in, same schema out with the metadata
    dimensions rewritten.  Default mode passes the payload through
    untouched (plumbing/schema contract, no codec needed);
    ``strict=True`` resizes for REAL — Pillow's resampler when
    installed, else stdlib PPM decode → nearest-neighbor → PPM encode
    — and rewrites both payload and metadata."""

    def _resize_payload(payload: bytes, mime: str) -> tuple[bytes, str]:
        pil = _optional_pil()
        if pil is not None:
            import io

            img = pil.open(io.BytesIO(payload)).convert("RGB")
            buf = io.BytesIO()
            img.resize((width, height)).save(buf, format="PNG")
            return buf.getvalue(), "image/png"
        w, h, rgb = decode_image(payload, mime)  # stdlib PPM path
        return (
            encode_ppm(width, height, _resize_rgb_nearest(rgb, w, h, width, height)),
            "image/x-portable-pixmap",
        )

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            out = pdf.copy()
            if strict:
                resized = [
                    _resize_payload(payload, (m or {}).get("mime") or "")
                    for payload, m in zip(pdf["payload"], pdf["meta"])
                ]
                out["payload"] = [p for p, _ in resized]
                out["meta"] = [
                    {**(m or {}), "mime": mime, "width": width, "height": height}
                    for (_, mime), m in zip(resized, pdf["meta"])
                ]
            else:
                out["meta"] = [
                    {**(m or {}), "width": width, "height": height}
                    for m in pdf["meta"]
                ]
            yield out

    from ..sources.loaders import ensure_parallelism

    return ensure_parallelism(media).mapInPandas(run, schema=MEDIA_SCHEMA)
