"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The task brief requires the Spark-side plumbing (schema, partitioning,
UDF signature, Arrow batch shape) to be real and tested while the actual
codec work is stubbed — this container has no image/audio libraries. The
seam is explicit: ``_decode_image_real`` raises NotImplementedError and
every public op routes through ``_decode_image`` which falls back to a
deterministic fake (seeded from the payload bytes) so tests and
benchmarks exercise true batch shapes end-to-end.

At 10^12-document scale the design points are:
- assets live in their own table keyed by media_ref (documents stay
  narrow; the binary column never rides through document-level shuffles);
- every op is ``mapInPandas`` over Arrow batches — payload bytes cross
  into Python once per batch, never per row;
- feature vectors come back as ``array<float>`` ready for the
  similarity/dedup operators (operators/similarity.py, operators/dedup.py).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

ASSET_SCHEMA = T.StructType([
    T.StructField("asset_id", T.StringType()),
    T.StructField("kind", T.StringType()),          # image | audio | video
    T.StructField("payload", T.BinaryType()),        # opaque encoded bytes
    T.StructField("meta", T.StructType([
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
        T.StructField("codec", T.StringType()),
    ])),
])


def synthetic_assets(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Deterministic fake asset table (pure function of (seed, id))."""
    def gen(batches):
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                rng = np.random.default_rng(seed * 1_000_003 + int(i))
                kind = ("image", "audio", "video")[int(i) % 3]
                payload = rng.integers(0, 256, size=int(rng.integers(64, 512)),
                                       dtype=np.uint8).tobytes()
                meta = {"width": int(rng.integers(16, 256)) if kind != "audio" else None,
                        "height": int(rng.integers(16, 256)) if kind != "audio" else None,
                        "channels": 3 if kind == "image" else (2 if kind == "audio" else None),
                        "sample_rate": 16000 if kind == "audio" else None,
                        "duration_ms": int(rng.integers(1000, 60000)) if kind != "image" else None,
                        "codec": {"image": "png", "audio": "pcm16", "video": "h264-stub"}[kind]}
                rows.append((f"asset_{int(i):08d}", kind, payload, meta))
            yield pd.DataFrame(rows, columns=["asset_id", "kind", "payload", "meta"])

    return spark.range(n).mapInPandas(gen, schema=ASSET_SCHEMA)


# --------------------------------------------------------------------------
# codec seam
# --------------------------------------------------------------------------

try:  # optional dependency (same pattern as decode.py's orjson): the
    # codec seam auto-upgrades to a real decoder wherever PIL exists
    from PIL import Image as _PIL_Image
    from PIL import UnidentifiedImageError as _PILUnidentified
except ImportError:  # pragma: no cover - PIL present in some deployments
    _PIL_Image = None
    _PILUnidentified = None

# errors that route a payload to the deterministic fake instead of failing
_FAKE_FALLBACK = ((NotImplementedError, _PILUnidentified)
                  if _PILUnidentified else (NotImplementedError,))


def _decode_image_real(payload: bytes, width: int, height: int) -> np.ndarray:
    """Real decoder: PIL when importable, else NotImplementedError.
    width/height are the catalog metadata — the decoded raster's actual
    shape wins (metadata can lie; downstream ops re-measure)."""
    if _PIL_Image is None:
        raise NotImplementedError(
            "image codec not available in this environment; "
            "the deterministic fake below stands in for tests/benchmarks")
    import io
    img = _PIL_Image.open(io.BytesIO(payload))
    return np.asarray(img.convert("RGB"), dtype=np.uint8)


def _decode_image(payload: bytes, width: int, height: int) -> np.ndarray:
    """(H, W, 3) uint8. Tries the real codec first; payloads that no
    installed codec recognizes (including this sandbox's synthetic
    assets) get the deterministic fake: pixels are a seeded PRNG stream
    keyed by the payload digest — stable across runs/partitions."""
    try:
        return _decode_image_real(payload, width, height)
    except _FAKE_FALLBACK:
        seed = int.from_bytes(hashlib.blake2b(payload, digest_size=8).digest(), "big")
        rng = np.random.default_rng(seed)
        return rng.integers(0, 256, size=(height, width, 3), dtype=np.uint8)


# --------------------------------------------------------------------------
# operators (all mapInPandas — one Python crossing per Arrow batch)
# --------------------------------------------------------------------------

FEATURE_DIM = 64

FEATURES_SCHEMA = T.StructType([
    T.StructField("asset_id", T.StringType()),
    T.StructField("feature", T.ArrayType(T.FloatType())),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
])


def image_features(assets: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """Decode + pool each image into a `dim`-float feature vector
    (channel-mean grid pooling over the decoded array; vectorized per
    batch). Output feeds operators/similarity.py directly."""
    def gen(batches):
        for pdf in batches:
            out = []
            for aid, payload, meta in zip(pdf["asset_id"], pdf["payload"], pdf["meta"]):
                w, h = int(meta["width"]), int(meta["height"])
                img = _decode_image(bytes(payload), w, h).astype(np.float32)
                g = int(np.sqrt(dim / 1))  # g×g grid, channel-averaged
                gh, gw = max(h // g, 1), max(w // g, 1)
                pooled = img[: g * gh, : g * gw].reshape(g, gh, g, gw, 3).mean(axis=(1, 3, 4))
                vec = pooled.flatten()
                vec = np.pad(vec, (0, dim - len(vec)))[:dim] / 255.0
                out.append((aid, vec.tolist(), w, h))
            yield pd.DataFrame(out, columns=["asset_id", "feature", "width", "height"])

    imgs = assets.filter(F.col("kind") == "image").select(
        "asset_id", "payload", "meta.width", "meta.height",
        F.struct("meta.width", "meta.height").alias("meta"))
    return imgs.select("asset_id", "payload", "meta").mapInPandas(gen, schema=FEATURES_SCHEMA)


RESIZED_SCHEMA = T.StructType([
    T.StructField("asset_id", T.StringType()),
    T.StructField("payload", T.BinaryType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
])


def resize_images(assets: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Decode → nearest-neighbour resize → re-emit raw bytes (the
    re-encode step shares the codec seam; raw RGB stands in)."""
    def gen(batches):
        for pdf in batches:
            out = []
            for aid, payload, meta in zip(pdf["asset_id"], pdf["payload"], pdf["meta"]):
                img = _decode_image(bytes(payload), int(meta["width"]), int(meta["height"]))
                ys = (np.arange(out_h) * img.shape[0] // out_h)
                xs = (np.arange(out_w) * img.shape[1] // out_w)
                resized = img[ys][:, xs]
                out.append((aid, resized.tobytes(), out_w, out_h))
            yield pd.DataFrame(out, columns=["asset_id", "payload", "width", "height"])

    imgs = assets.filter(F.col("kind") == "image")
    return imgs.select("asset_id", "payload", "meta").mapInPandas(gen, schema=RESIZED_SCHEMA)


def frame_sample(assets: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video → one row per sampled frame timestamp — pure column algebra
    (sequence/explode), no Python: the expensive per-frame decode happens
    later, on the exploded (asset_id, frame_ms) rows, batch-wise."""
    vids = assets.filter(F.col("kind") == "video")
    return vids.select(
        "asset_id",
        F.explode(F.sequence(
            F.lit(0),
            F.col("meta.duration_ms") - 1,
            F.lit(every_ms))).alias("frame_ms"),
    )


def audio_stats(assets: DataFrame) -> DataFrame:
    """Audio → (n_samples, rms) from the raw payload interpreted as
    pcm16 — numpy-vectorized per batch (a stand-in spectral stage)."""
    schema = T.StructType([
        T.StructField("asset_id", T.StringType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("rms", T.DoubleType()),
    ])

    def gen(batches):
        for pdf in batches:
            out = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                buf = bytes(payload)
                samples = np.frombuffer(buf[: len(buf) // 2 * 2], dtype=np.int16).astype(np.float64)
                rms = float(np.sqrt((samples ** 2).mean())) if len(samples) else 0.0
                out.append((aid, len(samples), round(rms, 6)))
            yield pd.DataFrame(out, columns=["asset_id", "n_samples", "rms"])

    return assets.filter(F.col("kind") == "audio") \
        .select("asset_id", "payload").mapInPandas(gen, schema=schema)
