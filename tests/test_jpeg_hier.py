"""Hierarchical JPEG (T.81 Annex J) decode tests — round 10.

DHP + EXP + differential-frame decode against a numpy mirror of the
spec's reconstruction (J.1.1.2 expansion, modulo-2^16 differential
addition, output clip), plus the error contracts the quarantine audit
sorts on."""

from __future__ import annotations

import numpy as np
import pytest

from hive_server_spark.functions import jpeg
from hive_server_spark.functions.jpeg import (
    _exp_expand,
    decode_jpeg,
    decode_jpeg_samples,
    encode_jpeg_hierarchical_gray,
)


def _blocks_to_image(vals, bw, bh):
    img = np.zeros((8 * bh, 8 * bw), dtype=np.int64)
    for k, v in enumerate(vals):
        by, bx = divmod(k, bw)
        img[by * 8 : (by + 1) * 8, bx * 8 : (bx + 1) * 8] = v
    return img


def _mirror(base, bw, bh, stages):
    """Numpy reconstruction mirror: base image, then per stage EXP-expand
    and add the stage's per-block diffs, mod 2^16; clip at output."""
    ref = _blocks_to_image(base, bw, bh)
    gw, gh = bw, bh
    for eh, ev, diffs in stages:
        ref = _exp_expand(ref, eh, ev)
        gw *= 2 if eh else 1
        gh *= 2 if ev else 1
        ref = (ref + _blocks_to_image(diffs, gw, gh)) % 65536
    return np.clip(ref, 0, 255)


def test_exp_expand_semantics():
    a = np.array([[10, 20], [30, 40]], dtype=np.int64)
    h = _exp_expand(a, 1, 0)
    # even cols copy, odd cols floor((a+b+1)/2), edge replicates
    assert h.tolist() == [[10, 15, 20, 20], [30, 35, 40, 40]]
    v = _exp_expand(a, 0, 1)
    # odd rows average with the row below; the LAST row replicates
    assert v.tolist() == [[10, 20], [20, 30], [30, 40], [30, 40]]
    hv = _exp_expand(a, 1, 1)
    assert hv.shape == (4, 4)
    assert hv[0].tolist() == [10, 15, 20, 20]
    assert hv[3].tolist() == [30, 35, 40, 40]
    # no-op flags return the input unchanged
    assert _exp_expand(a, 0, 0) is a


def test_hierarchical_single_stage_exact():
    base = [40, 80, 120, 200]
    diffs = [3, -3, 7, -7, 1, -1, 2, -2, 11, -11, 5, -5, 0, 9, -9, 4]
    payload = encode_jpeg_hierarchical_gray(
        base, 2, 2, [(1, 1, diffs)], restart_interval=2
    )
    w, h, samples = decode_jpeg_samples(payload)
    assert (w, h) == (32, 32)
    expected = _mirror(base, 2, 2, [(1, 1, diffs)])
    assert np.array_equal(samples.astype(np.int64), expected)


def test_hierarchical_multi_stage_and_axis_flags():
    """Three stages with different EXP axes and a same-size refinement —
    every intermediate expansion interpolates across real block edges."""
    base = [10, 250]
    stages = [
        (1, 0, [5, -5, 6, -6]),          # 32x8: horizontal only
        (0, 1, [1, 2, 3, 4, -1, -2, -3, -4]),  # 32x16: vertical only
        (0, 0, [0, 1, 0, -1, 2, 0, -2, 0]),    # same-size refinement
    ]
    payload = encode_jpeg_hierarchical_gray(base, 2, 1, stages)
    w, h, samples = decode_jpeg_samples(payload)
    assert (w, h) == (32, 16)
    assert np.array_equal(
        samples.astype(np.int64), _mirror(base, 2, 1, stages)
    )


def test_hierarchical_mean_contract():
    payload = encode_jpeg_hierarchical_gray([100], 1, 1, [(1, 1, [5, -10, 20, -30])])
    w, h, mean = decode_jpeg(payload)
    assert (w, h) == (16, 16)
    expected = _mirror([100], 1, 1, [(1, 1, [5, -10, 20, -30])]).mean() / 255.0
    assert mean == pytest.approx(expected, abs=1e-12)


def test_hierarchical_clip_after_wraparound():
    """A differential that drives a sample below 0 wraps modulo 2^16
    (J.1) and clips at output — pinned so the mod-arithmetic stance is
    explicit, never an accidental negative pixel."""
    payload = encode_jpeg_hierarchical_gray([10], 1, 1, [(0, 0, [-50])])
    _w, _h, samples = decode_jpeg_samples(payload)
    assert samples.min() == samples.max() == 255  # 10-50 mod 65536 -> clip


@pytest.mark.parametrize("seed", range(5))
def test_hierarchical_property_random_stages(seed):
    rng = np.random.default_rng(seed)
    bw, bh = int(rng.integers(1, 4)), int(rng.integers(1, 4))
    base = rng.integers(0, 256, size=bw * bh).tolist()
    gw, gh = bw, bh
    stages = []
    for _ in range(int(rng.integers(1, 4))):
        eh, ev = int(rng.integers(0, 2)), int(rng.integers(0, 2))
        gw *= 2 if eh else 1
        gh *= 2 if ev else 1
        diffs = rng.integers(-40, 41, size=gw * gh).tolist()
        stages.append((eh, ev, diffs))
    ri = int(rng.choice([0, 1, 2, 5]))
    payload = encode_jpeg_hierarchical_gray(base, bw, bh, stages, restart_interval=ri)
    w, h, samples = decode_jpeg_samples(payload)
    assert (w, h) == (8 * gw, 8 * gh)
    assert np.array_equal(samples.astype(np.int64), _mirror(base, bw, bh, stages))


def test_hierarchical_error_contracts():
    payload = bytearray(
        encode_jpeg_hierarchical_gray([100], 1, 1, [(1, 1, [1, 2, 3, 4])])
    )
    # EXP flags out of range
    bad = bytearray(payload)
    i = bad.index(b"\xff\xdf") + 4
    bad[i] = 0x23
    with pytest.raises(ValueError, match="EXP flags"):
        decode_jpeg(bytes(bad))
    # a second DHP header (the DHP chunk is 2 marker + 11 length bytes)
    i = payload.index(b"\xff\xde")
    dhp = bytes(payload[i : i + 13])
    with pytest.raises(ValueError, match="multiple DHP"):
        decode_jpeg(bytes(payload[: i + 13]) + dhp + bytes(payload[i + 13 :]))
    # EOI straight after DHP (no frames decoded)
    with pytest.raises(ValueError, match="EOI before scan data"):
        decode_jpeg(bytes(payload[: i + 13]) + b"\xff\xd9")
    # EXP outside a hierarchical sequence
    flat = bytearray(jpeg.encode_jpeg_gray_blocks([100], 1, 1))
    exp_seg = b"\xff\xdf\x00\x03\x11"
    j = flat.index(b"\xff\xc0")
    with pytest.raises(ValueError, match="EXP marker outside"):
        decode_jpeg(bytes(flat[:j]) + exp_seg + bytes(flat[j:]))


def test_hierarchical_final_resolution_mismatch():
    # tamper the DHP dimensions so the last frame no longer matches
    payload = bytearray(
        encode_jpeg_hierarchical_gray([100], 1, 1, [(1, 1, [1, 2, 3, 4])])
    )
    i = payload.index(b"\xff\xde")
    payload[i + 5 : i + 7] = (8).to_bytes(2, "big")  # DHP Y: 16 -> 8
    with pytest.raises(ValueError, match="does not match the DHP"):
        decode_jpeg(bytes(payload))


def test_hierarchical_differential_needs_reference():
    # differential frame naming a component the base never coded: craft a
    # base frame with component id 1 and a differential frame with id 2
    payload = encode_jpeg_hierarchical_gray([100], 1, 1, [(0, 0, [5])])
    b = bytearray(payload)
    # the differential frame's SOF5 component id byte: marker(2) +
    # length(2) + P(1) + Y(2) + X(2) + Nf(1) -> offset 10
    i = b.index(b"\xff\xc5") + 10
    assert b[i] == 1
    b[i] = 2
    # ... and the matching SOS selector: marker(2) + length(2) + Ns(1)
    j = b.index(b"\xff\xda", i) + 5
    assert b[j] == 1
    b[j] = 2
    with pytest.raises(ValueError, match="undecoded component"):
        decode_jpeg(bytes(b))


def test_hierarchical_fuzz_never_misdecodes():
    """Random byte mutations either decode, raise ValueError, or dispatch
    None — the shared codec error contract."""
    import random

    rng = random.Random(7)
    payload = encode_jpeg_hierarchical_gray(
        [60, 90], 2, 1, [(1, 1, [2, -2, 4, -4, 6, -6, 8, -8])]
    )
    for _ in range(300):
        b = bytearray(payload)
        for _ in range(rng.randint(1, 4)):
            b[rng.randrange(len(b))] = rng.randrange(256)
        try:
            decode_jpeg(bytes(b))
        except ValueError:
            pass
