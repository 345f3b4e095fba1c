"""Hypothesis property tests for the pure-Python image codecs
(functions/multimodal.py): the example-based tests pin known-tricky
inputs (filter types, stride padding, truncation); these pin the general
contract — ANY image round-trips encode -> decode with EXACT sample
equality, so a filter-reconstruction or header-arithmetic slip shrinks
to a minimal failing image instead of hiding between examples."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from hive_server_spark.functions.multimodal import (
    _png_samples,
    _ppm_samples,
    encode_png,
)


@st.composite
def rgb_images(draw, max_dim: int = 12):
    w = draw(st.integers(1, max_dim))
    h = draw(st.integers(1, max_dim))
    data = draw(
        st.lists(st.integers(0, 255), min_size=w * h * 3, max_size=w * h * 3)
    )
    return np.array(data, dtype=np.uint8).reshape(h, w, 3)


@settings(max_examples=40, deadline=None)
@given(rgb_images())
def test_png_roundtrip_exact_samples(pixels):
    # encode_png rotates the filter type per row (y % 5), so any image
    # with h >= 5 exercises every reconstruction path
    h, w, _ = pixels.shape
    got = _png_samples(encode_png(pixels))
    assert got is not None
    gw, gh, out = got
    assert (gw, gh) == (w, h)
    assert out.shape == (h, w * 3)
    assert np.array_equal(out.reshape(h, w, 3), pixels)


@settings(max_examples=40, deadline=None)
@given(rgb_images(), st.booleans())
def test_ppm_roundtrip_exact_samples(pixels, ascii_form):
    h, w, _ = pixels.shape
    flat = pixels.reshape(-1)
    if ascii_form:  # P3: whitespace-separated decimal samples
        body = " ".join(str(int(v)) for v in flat)
        payload = f"P3\n{w} {h}\n255\n{body}\n".encode()
    else:  # P6: binary samples
        payload = f"P6\n{w} {h}\n255\n".encode() + flat.tobytes()
    got = _ppm_samples(payload)
    assert got is not None
    gw, gh, maxval, samples = got
    assert (gw, gh, maxval) == (w, h, 255)
    assert np.array_equal(
        np.asarray(samples, dtype=np.uint8).reshape(-1), flat
    )


@settings(max_examples=30, deadline=None)
@given(rgb_images(max_dim=8))
def test_png_and_ppm_agree_on_mean(pixels):
    """The two container formats of the same pixels must produce the same
    decode stats — the cross-codec invariant the gate's decode-profile
    oracle relies on (synthesize_png_media mirrors synthesize_ppm_media
    pixel-for-pixel)."""
    h, w, _ = pixels.shape
    png = _png_samples(encode_png(pixels))
    ppm = _ppm_samples(
        f"P6\n{w} {h}\n255\n".encode() + pixels.reshape(-1).tobytes()
    )
    assert png is not None and ppm is not None
    assert float(png[2].mean()) == float(np.asarray(ppm[3]).mean())
