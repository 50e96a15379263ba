"""Hypothesis property tests over the two real codecs: any valid input
round-trips encode→decode consistently with a direct computation, and
the parsers never accept a truncation of their own output."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from map_reduce_in_go_spark.operators.multimodal import (
    S_MIN,
    S_MOD,
    WAV_RATES,
    decode_ppm,
    decode_wav,
    encode_ppm,
    encode_wav,
)


@given(st.binary(min_size=1, max_size=600))
@settings(max_examples=200, deadline=None)
def test_ppm_roundtrip_property(data):
    meta = decode_ppm(encode_ppm(data))
    n = len(data)
    w, h = n % 29 + 4, n % 13 + 4
    total = w * h * 3
    tiled = (data * (total // n + 1))[:total]
    assert (meta["width"], meta["height"]) == (w, h)
    assert meta["pixel_sum"] == sum(tiled)


@given(st.binary(min_size=1, max_size=600))
@settings(max_examples=200, deadline=None)
def test_wav_roundtrip_property(data):
    """Full byte range (0..255) — the int16 wrap keeps the kernel total
    where the naive b*256-16384 mapping overflows for bytes >= 192."""
    payload = encode_wav(data)
    meta = decode_wav(payload)
    n = len(data) % S_MOD + S_MIN
    tiled = (data * (n // len(data) + 1))[:n]
    vals = [((b * 256 - 16384 + 32768) % 65536) - 32768 for b in tiled]
    assert meta["sample_rate"] == WAV_RATES[len(data) % len(WAV_RATES)]
    assert meta["n_samples"] == n
    assert meta["peak"] == max(vals)
    assert meta["amp_sum"] == sum(abs(v) for v in vals)


@given(st.binary(min_size=1, max_size=200), st.integers(min_value=1, max_value=40))
@settings(max_examples=100, deadline=None)
def test_wav_rejects_truncations(data, cut):
    import pytest

    payload = encode_wav(data)
    cut = min(cut, len(payload) - 1)
    with pytest.raises(ValueError):
        decode_wav(payload[:-cut])
