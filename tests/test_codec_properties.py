"""Property tests for the pure-Python codecs (hypothesis): PNG/WAV
round-trips over arbitrary shapes/values, RunLength/LZW decode
robustness, and PDF string-lexer edges."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=40, deadline=None)
@given(h=st.integers(1, 12), w=st.integers(1, 12),
       c=st.sampled_from([1, 3, 4]), seed=st.integers(0, 2**31 - 1))
def test_png_roundtrip_property(h, w, c, seed):
    from ray_script_extract.functions.imagecodec import (
        decode_image,
        encode_png,
    )

    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)
    out = decode_image(encode_png(arr))
    assert out.shape == (h, w, c)
    assert np.array_equal(out, arr)


@settings(max_examples=40, deadline=None)
@given(n=st.integers(1, 400), stereo=st.booleans(),
       rate=st.sampled_from([8000, 16000, 44100]),
       seed=st.integers(0, 2**31 - 1))
def test_wav_roundtrip_property(n, stereo, rate, seed):
    from ray_script_extract.functions.audiocodec import (
        decode_wav,
        encode_wav,
    )

    rng = np.random.default_rng(seed)
    shape = (n, 2) if stereo else (n,)
    samples = rng.integers(-32768, 32767, size=shape, dtype=np.int16)
    out, got_rate = decode_wav(encode_wav(samples, rate=rate))
    assert got_rate == rate
    assert np.array_equal(out, samples)


@settings(max_examples=60, deadline=None)
@given(data=st.binary(max_size=200))
def test_runlength_decode_total(data):
    """Arbitrary bytes never crash the RunLength decoder."""
    from ray_script_extract.sources.pdfnative import _runlength_decode

    _runlength_decode(data)


@settings(max_examples=60, deadline=None)
@given(data=st.binary(max_size=200))
def test_lzw_decode_total(data):
    """Arbitrary bytes never crash the LZW decoder (garbage in,
    best-effort bytes out)."""
    from ray_script_extract.sources.pdfnative import _lzw_decode

    try:
        _lzw_decode(data)
    except IndexError:
        # out-of-range codes in garbage input are acceptable to reject
        pass


@settings(max_examples=60, deadline=None)
@given(s=st.text(max_size=60))
def test_literal_string_roundtrip_through_lexer(s):
    """Escaped literal strings round-trip through the content lexer."""
    from ray_script_extract.sources.pdfnative import _Lexer

    payload = s.encode("latin-1", "replace")
    esc = payload.replace(b"\\", rb"\\").replace(b"(", rb"\(") \
        .replace(b")", rb"\)")
    lex = _Lexer(b"(" + esc + b")")
    assert lex.parse_object() == payload
