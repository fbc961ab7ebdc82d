"""Property tests for the native PDF object lexer."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from ray_script_extract.sources.pdfnative import _Lexer


def _escape_literal(s: bytes) -> bytes:
    out = bytearray(b"(")
    for b in s:
        if b in (0x28, 0x29, 0x5C):
            out += b"\\" + bytes([b])
        elif b == 0x0D:
            out += b"\\r"
        else:
            out.append(b)
    out += b")"
    return bytes(out)


@given(st.binary(max_size=80))
@settings(max_examples=200)
def test_literal_string_roundtrip(raw):
    lex = _Lexer(_escape_literal(raw))
    assert lex.parse_object() == raw


@given(st.binary(max_size=40))
@settings(max_examples=100)
def test_hex_string_roundtrip(raw):
    lex = _Lexer(b"<" + raw.hex().encode() + b">")
    assert lex.parse_object() == raw


@given(st.lists(st.integers(-10**6, 10**6), max_size=10))
def test_array_of_numbers_roundtrip(nums):
    src = b"[" + b" ".join(str(n).encode() for n in nums) + b"]"
    lex = _Lexer(src)
    assert lex.parse_object() == nums


@given(st.dictionaries(
    st.text(alphabet="ABCdef", min_size=1, max_size=8),
    st.integers(0, 1000), max_size=6))
def test_dict_roundtrip(d):
    src = b"<< " + b" ".join(
        f"/{k} {v}".encode() for k, v in d.items()) + b" >>"
    lex = _Lexer(src)
    parsed = lex.parse_object()
    assert parsed == {f"/{k}": v for k, v in d.items()}
