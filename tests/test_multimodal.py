"""Multimodal plumbing: schemas, batch shapes, determinism. The codec is
a documented stub (functions/multimodal.py seam) — the Spark-side
contract is what's under test."""

import numpy as np
import pyspark.sql.functions as F
import pytest

from dxf_postgis_converter_spark.functions.multimodal import (
    FEATURE_DIM,
    _decode_image,
    _decode_image_real,
    audio_stats,
    frame_sample,
    image_features,
    resize_images,
    synthetic_assets,
)


@pytest.fixture(scope="module")
def assets(spark):
    return synthetic_assets(spark, 60).cache()


def test_real_codec_is_stubbed():
    import dxf_postgis_converter_spark.functions.multimodal as mm
    if mm._PIL_Image is None:  # this container: no PIL → explicit seam
        with pytest.raises(NotImplementedError):
            _decode_image_real(b"\x00", 4, 4)


def test_codec_seam_auto_upgrades(monkeypatch):
    """With a codec installed the SAME seam decodes real bytes; payloads
    no codec recognizes still take the deterministic-fake path (that is
    what keeps the synthetic-corpus oracles environment-independent)."""
    import dxf_postgis_converter_spark.functions.multimodal as mm

    class FakeUnidentified(Exception):
        pass

    decoded = np.arange(4 * 3 * 3, dtype=np.uint8).reshape(3, 4, 3)

    class FakeImg:
        def convert(self, mode):
            assert mode == "RGB"
            return decoded

    class FakePIL:
        @staticmethod
        def open(buf):
            if buf.read(4) != b"PNG!":
                raise FakeUnidentified("not an image")
            return FakeImg()

    monkeypatch.setattr(mm, "_PIL_Image", FakePIL)
    monkeypatch.setattr(mm, "_FAKE_FALLBACK", (NotImplementedError, FakeUnidentified))
    # decodable payload → real path (catalog metadata is ignored: actual shape wins)
    assert (mm._decode_image(b"PNG!...", 99, 99) == decoded).all()
    # unrecognized payload → deterministic fake at metadata shape
    fake = mm._decode_image(b"garbage", 8, 6)
    assert fake.shape == (6, 8, 3)
    assert (fake == mm._decode_image(b"garbage", 8, 6)).all()


def test_fake_decode_deterministic():
    a = _decode_image(b"payload-bytes", 8, 6)
    b = _decode_image(b"payload-bytes", 8, 6)
    assert a.shape == (6, 8, 3) and a.dtype == np.uint8
    assert (a == b).all()
    assert not (_decode_image(b"other", 8, 6) == a).all()


def test_asset_table_shape(assets):
    assert assets.count() == 60
    kinds = {r.kind for r in assets.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}
    img = assets.filter("kind = 'image'").first()
    assert img.meta.width >= 16 and img.meta.codec == "png"


def test_image_features_shape_and_determinism(assets):
    f1 = image_features(assets).orderBy("asset_id").collect()
    f2 = image_features(assets).orderBy("asset_id").collect()
    assert len(f1) == assets.filter("kind = 'image'").count()
    assert all(len(r.feature) == FEATURE_DIM for r in f1)
    assert all(0.0 <= v <= 1.0 for v in f1[0].feature)
    assert [r.feature for r in f1] == [r.feature for r in f2]


def test_features_feed_similarity(assets):
    from dxf_postgis_converter_spark.operators.similarity import brute_force_topk
    feats = image_features(assets).select(
        F.col("asset_id").alias("vec_id"),
        F.col("feature").cast("array<double>").alias("embedding"))
    qs = feats.limit(2).select(F.col("vec_id").alias("query_id"),
                               F.col("embedding").alias("query_vec"))
    topk = brute_force_topk(feats, qs, k=3)
    assert topk.groupBy("query_id").count().collect()[0]["count"] == 3
    # self-match ranks first with cosine 1
    self_hits = topk.filter((F.col("query_id") == F.col("vec_id")) & (F.col("rank") == 1))
    assert self_hits.count() == 2


def test_resize_payload_size(assets):
    out = resize_images(assets, 16, 12).collect()
    assert all(len(r.payload) == 16 * 12 * 3 for r in out)
    assert all((r.width, r.height) == (16, 12) for r in out)


def test_frame_sample_counts(assets):
    frames = frame_sample(assets, every_ms=1000)
    got = {r.asset_id: r.n for r in
           frames.groupBy("asset_id").agg(F.count("*").alias("n")).collect()}
    for r in assets.filter("kind = 'video'").select("asset_id", "meta.duration_ms").collect():
        assert got[r.asset_id] == (r.duration_ms + 999) // 1000


def test_audio_stats(assets):
    st = audio_stats(assets).collect()
    assert len(st) == assets.filter("kind = 'audio'").count()
    assert all(r.n_samples > 0 and r.rms > 0 for r in st)


def test_png_roundtrip_and_filters():
    """encode_png → decode_png is the identity; the decoder also reverses
    Sub/Up/Average/Paeth-filtered scanlines (what real encoders emit)."""
    import struct
    import zlib

    from dxf_postgis_converter_spark.functions.multimodal import (
        decode_png, encode_png, gradient_pixels,
    )

    img = gradient_pixels(23, 17, 9)
    assert (decode_png(encode_png(img)) == img).all()

    # re-encode the same raster with each filter type per scanline
    rng = np.random.default_rng(7)
    img2 = rng.integers(0, 256, size=(6, 5, 3), dtype=np.uint8)
    h, w = img2.shape[:2]
    stride = w * 3

    def filt(ftype, line, prev):
        line = line.astype(np.int32)
        out = np.zeros(stride, dtype=np.uint8)
        for x in range(stride):
            a = int(line[x - 3]) if x >= 3 else 0
            b = int(prev[x])
            c = int(prev[x - 3]) if x >= 3 else 0
            if ftype == 1:
                pred = a
            elif ftype == 2:
                pred = b
            elif ftype == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            out[x] = (int(line[x]) - pred) & 0xFF
        return out

    raw = b""
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ftype = (y % 4) + 1
        line = img2[y].reshape(-1)
        raw += bytes([ftype]) + filt(ftype, line, prev).tobytes()
        prev = line

    def chunk(tag, body):
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))

    png = (b"\x89PNG\r\n\x1a\n"
           + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
           + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))
    assert (decode_png(png) == img2).all()


def test_png_assets_decode_for_real(assets):
    """id%9==0 image assets carry true PNG bytes whose decode (real codec
    or spec fallback — identical by losslessness) yields the documented
    gradient, NOT the blake2b fake."""
    from dxf_postgis_converter_spark.functions.multimodal import (
        _decode_image, gradient_pixels,
    )

    row = assets.filter("asset_id = 'asset_00000009'").first()
    assert row.kind == "image" and bytes(row.payload[:4]) == b"\x89PNG"
    got = _decode_image(bytes(row.payload), row.meta.width, row.meta.height)
    assert (got == gradient_pixels(row.meta.width, row.meta.height, 9)).all()


def test_pil_path_would_match_fallback(monkeypatch):
    """Wherever PIL appears, its decode of our PNG must equal the spec
    fallback's — simulate a PIL whose open() is our own spec decoder fed
    through an independent buffer, asserting the seam routes PNGs to it."""
    import io

    import dxf_postgis_converter_spark.functions.multimodal as mm

    calls = []

    class FakeImg:
        def __init__(self, arr):
            self.arr = arr

        def convert(self, mode):
            assert mode == "RGB"
            return self.arr

    class FakePIL:
        @staticmethod
        def open(buf):
            data = buf.read()
            calls.append(len(data))
            return FakeImg(mm.decode_png(data))

    monkeypatch.setattr(mm, "_PIL_Image", FakePIL)
    img = mm.gradient_pixels(12, 8, 0)
    png = mm.encode_png(img)
    got = mm._decode_image(png, 12, 8)
    assert calls and (got == img).all()


def test_png_wavefront_decoder_large_mixed_filters():
    """The vectorized anti-diagonal decoder must reverse a large image
    with ALL five filter types interleaved (incl. filter-0 rows between
    filtered rows — exercises the padded-border and row-mask paths)."""
    import struct
    import zlib

    from dxf_postgis_converter_spark.functions.multimodal import decode_png

    rng = np.random.default_rng(42)
    h, w = 64, 121
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    stride = w * 3

    def filt(ftype, line, prev):
        out = np.zeros(stride, dtype=np.uint8)
        for x in range(stride):
            a = int(line[x - 3]) if x >= 3 else 0
            b = int(prev[x])
            c = int(prev[x - 3]) if x >= 3 else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = a
            elif ftype == 2:
                pred = b
            elif ftype == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            out[x] = (int(line[x]) - pred) & 0xFF
        return out

    raw = b""
    prev = np.zeros(stride, dtype=np.uint8)
    ftypes = rng.integers(0, 5, size=h)
    for y in range(h):
        line = img[y].reshape(-1)
        raw += bytes([int(ftypes[y])]) + filt(int(ftypes[y]), line, prev).tobytes()
        prev = line

    def chunk(tag, body):
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))

    png = (b"\x89PNG\r\n\x1a\n"
           + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
           + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))
    assert (decode_png(png) == img).all()


def test_avi_roundtrip():
    """encode_avi → decode_avi is the identity on frames + timing."""
    from dxf_postgis_converter_spark.functions.multimodal import (
        decode_avi, encode_avi, gradient_frames,
    )
    for w, h, nf in [(24, 16, 5), (13, 7, 3), (1, 1, 1), (32, 32, 12)]:
        frames = gradient_frames(w, h, nf, key=w * 1000 + h)
        out, rate, scale = decode_avi(encode_avi(frames, rate=nf * 1000,
                                                 scale=4321))
        assert out.shape == (nf, h, w, 3)
        assert (out == frames).all()
        assert (rate, scale) == (nf * 1000, 4321)


def test_avi_rejects_malformed():
    import struct

    import pytest as _pytest

    from dxf_postgis_converter_spark.functions.multimodal import (
        decode_avi, encode_avi, gradient_frames,
    )
    good = encode_avi(gradient_frames(8, 8, 2, key=1), rate=2000, scale=1000)
    with _pytest.raises(ValueError, match="not an AVI"):
        decode_avi(b"RIFX" + good[4:])
    # corrupt the strf bit depth (24 → 32) — parser must refuse, not
    # misread pixel data
    pos = good.index(b"strf")
    bad = bytearray(good)
    struct.pack_into("<H", bad, pos + 8 + 14, 32)
    with _pytest.raises(ValueError, match="unsupported AVI pixel"):
        decode_avi(bytes(bad))
    # truncated mid-frame (idx1 is 40 bytes; cut past it into the movi
    # list so a frame chunk's declared length overruns the buffer)
    with _pytest.raises(ValueError):
        decode_avi(good[:len(good) - 60])


def test_video_assets_carry_real_avi(assets):
    """Every 3rd video asset is a parseable RIFF/AVI whose frames match
    the documented gradient formula — the container path is REAL."""
    from dxf_postgis_converter_spark.functions.multimodal import (
        decode_avi, gradient_frames,
    )
    real = [r for r in assets.filter("kind = 'video'").collect()
            if int(r.asset_id.split("_")[1]) % 9 == 5]
    assert real, "corpus must contain AVI-bearing videos"
    for r in real:
        i = int(r.asset_id.split("_")[1])
        assert r.meta.codec == "avi-rawrgb"
        frames, rate, scale = decode_avi(bytes(r.payload))
        nf = 4 + i % 5 * 2
        assert frames.shape[0] == nf and rate == nf * 1000
        assert scale == r.meta.duration_ms
        want = gradient_frames(min(r.meta.width, 32), min(r.meta.height, 32),
                               nf, key=i * 1009)
        assert (frames == want).all()


def test_video_frame_stats_matches_replica(assets):
    """Engine decode (real AVI parse + stub fake) vs the replica's
    spec-formula derivation — value-level, both paths covered."""
    from dxf_postgis_converter_spark import replicas
    from dxf_postgis_converter_spark.functions.multimodal import (
        video_frame_stats,
    )
    got = sorted(tuple(r) for r in video_frame_stats(assets).collect())
    want = sorted(replicas.video_frame_rows(60))
    assert got == want
