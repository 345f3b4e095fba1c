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


@st.composite
def wav_payloads(draw):
    """A spec-valid RIFF/WAVE container with random PCM content, random
    unknown chunks before/after fmt/data, and odd-sized chunks exercising
    the word-alignment padding rule."""
    import struct

    bits = draw(st.integers(0, 1)) * 8 + 8  # 8 or 16
    n_channels = draw(st.integers(1, 3))
    rate = draw(st.sampled_from([8000, 16000, 44100]))
    n_frames = draw(st.integers(0, 40))
    if bits == 8:
        samples = draw(
            st.lists(
                st.integers(0, 255),
                min_size=n_frames * n_channels,
                max_size=n_frames * n_channels,
            )
        )
        data = bytes(samples)
        expect_mean = (sum(samples) / len(samples)) if samples else 0.0
    else:
        samples = draw(
            st.lists(
                st.integers(-32768, 32767),
                min_size=n_frames * n_channels,
                max_size=n_frames * n_channels,
            )
        )
        data = b"".join(struct.pack("<h", s) for s in samples)
        expect_mean = (
            sum(abs(s) for s in samples) / len(samples) if samples else 0.0
        )
    block_align = n_channels * (bits // 8)
    fmt = struct.pack(
        "<HHIIHH", 1, n_channels, rate, rate * block_align, block_align, bits
    )

    def chunk(cid: bytes, body: bytes) -> bytes:
        # odd-sized chunks carry one pad byte NOT counted in the size
        return cid + struct.pack("<I", len(body)) + body + (
            b"\x00" if len(body) & 1 else b""
        )

    pieces = []
    if draw(st.booleans()):  # unknown chunk before fmt, odd size allowed
        junk = draw(st.binary(min_size=1, max_size=9))
        pieces.append(chunk(b"JUNK", junk))
    pieces.append(chunk(b"fmt ", fmt))
    if draw(st.booleans()):  # unknown chunk between fmt and data
        pieces.append(chunk(b"LIST", draw(st.binary(min_size=0, max_size=7))))
    pieces.append(chunk(b"data", data))
    body = b"".join(pieces)
    payload = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    return payload, (rate, n_channels, bits, n_frames, expect_mean)


@settings(max_examples=40, deadline=None)
@given(wav_payloads())
def test_wav_roundtrip_exact(case):
    from hive_server_spark.functions.multimodal import _decode_wav

    payload, (rate, n_channels, bits, n_frames, expect_mean) = case
    got = _decode_wav(payload)
    assert got is not None
    grate, gch, gbits, gframes, gmean = got
    assert (grate, gch, gbits, gframes) == (rate, n_channels, bits, n_frames)
    assert abs(gmean - expect_mean) < 1e-9


@settings(max_examples=40, deadline=None)
@given(rgb_images(max_dim=9), st.booleans())
def test_bmp_roundtrip_mean_exact(pixels, top_down):
    """24-bit BI_RGB BMPs with random dims — widths that force 4-byte row
    stride padding are the interesting cases: a decoder that lets pad
    bytes leak into the pixel window shifts the mean."""
    import struct

    from hive_server_spark.functions.multimodal import _decode_bmp

    h, w, _ = pixels.shape
    stride = (w * 3 + 3) & ~3
    rows = []
    row_iter = range(h) if top_down else range(h - 1, -1, -1)
    for y in row_iter:
        row = pixels[y].reshape(-1).tobytes()
        rows.append(row + b"\xAA" * (stride - len(row)))  # non-zero pad
    data = b"".join(rows)
    height_field = -h if top_down else h
    info = struct.pack("<IiiHHIIiiII", 40, w, height_field, 1, 24, 0,
                       len(data), 2835, 2835, 0, 0)
    payload = (
        b"BM" + struct.pack("<IHHI", 14 + 40 + len(data), 0, 0, 54)
        + info + data
    )
    got = _decode_bmp(payload)
    assert got is not None
    gw, gh, gmean = got
    assert (gw, gh) == (w, h)
    assert gmean == float(pixels.mean()) / 255.0


def test_all_decoders_error_contract_under_mutation():
    """Every codec must answer malformed input with a result, None, or
    ValueError — never IndexError/struct.error — because the quarantine
    audit classifies payloads BY error behavior (decode_jpeg has its own
    deeper fuzz in test_jpeg.py; this pins the PNG/PPM/BMP/WAV parsers)."""
    import random
    import struct

    from hive_server_spark.functions import multimodal as M

    rng = random.Random(7)

    def check(fn, payload):
        try:
            r = fn(payload)
            assert r is None or isinstance(r, tuple)
        except ValueError:
            pass

    png = encode_png(np.arange(75, dtype=np.uint8).reshape(5, 5, 3))
    ppm6 = b"P6\n5 5\n255\n" + bytes(range(75))
    ppm3 = ("P3\n5 5\n255\n" + " ".join(str(i) for i in range(75))).encode()
    data = bytes(range(16)) * 10
    bmp = (
        b"BM" + struct.pack("<IHHI", 54 + len(data), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, 5, 5, 1, 24, 0, len(data), 0, 0, 0, 0)
        + data
    )
    body = b"fmt " + struct.pack("<I", 16) + struct.pack(
        "<HHIIHH", 1, 1, 8000, 8000, 1, 8
    )
    body += b"data" + struct.pack("<I", 10) + bytes(range(10))
    wav = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body

    for fn, seed in [
        (M._png_samples, png),
        (M._ppm_samples, ppm6),
        (M._ppm_samples, ppm3),
        (M._decode_bmp, bmp),
        (M._decode_wav, wav),
    ]:
        for pos in range(len(seed)):
            m = bytearray(seed)
            m[pos] ^= 0x80
            check(fn, bytes(m))
        for i in range(0, len(seed), 3):
            check(fn, seed[:i])
        for _ in range(200):
            m = bytearray(seed)
            for _ in range(3):
                m[rng.randrange(0, len(m))] = rng.randrange(256)
            check(fn, bytes(m))
