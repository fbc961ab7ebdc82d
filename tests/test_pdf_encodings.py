"""Simple-font base encodings (/WinAnsiEncoding, /MacRomanEncoding):
Word-family writers emit WinAnsi literals whose 0x80-0x9F bytes carry
curly quotes and dashes — latin-1 would decode them to C1 control
characters, and the reference's CONT'D white-out family matches CURLY
quotes explicitly (Blocks.php white_out, reproduced in
engine/blocks.py::white_out), so a WinAnsi PDF must decode them
faithfully or (CONT'D) scrubbing silently stops firing."""

from __future__ import annotations

import re

from ray_script_extract.sources.pdf_fixtures import build_pdf
from ray_script_extract.sources.pdfnative import (_simple_encoding_table,
                                                  pdf_to_page_xml)

WINANSI_FONT = {"F4": (b"<< /Type /Font /Subtype /Type1 "
                       b"/BaseFont /Helvetica "
                       b"/Encoding /WinAnsiEncoding >>")}


def _texts(xml: str):
    return [re.sub(r"<[^>]+>", "", m)
            for m in re.findall(r"<text [^>]*>(.*?)</text>", xml)]


def test_winansi_curly_quotes_decode():
    # bytes 0x91/0x92 are U+2018/U+2019 in cp1252; 0x96 is en dash
    s = "don" + chr(0x92) + "t " + chr(0x96) + " now"
    pdf = build_pdf([[(72, 100, s, {"font": "F4"})]],
                    extra_fonts=WINANSI_FONT)
    (t,) = _texts(pdf_to_page_xml(pdf)[0])
    assert t == "don’t – now"


def test_latin1_default_unchanged():
    # no /Encoding: the engine's historical latin-1 decode holds
    s = "caf" + chr(0xE9)
    pdf = build_pdf([[(72, 100, s)]])
    (t,) = _texts(pdf_to_page_xml(pdf)[0])
    assert t == "café"


def test_macroman_accents():
    # MacRoman 0x8E is U+00E9 (eacute); latin-1 would give U+008E
    fonts = {"F4": (b"<< /Type /Font /Subtype /Type1 "
                    b"/BaseFont /Helvetica "
                    b"/Encoding /MacRomanEncoding >>")}
    s = "caf" + chr(0x8E)
    pdf = build_pdf([[(72, 100, s, {"font": "F4"})]], extra_fonts=fonts)
    (t,) = _texts(pdf_to_page_xml(pdf)[0])
    assert t == "café"


def test_differences_override_base_encoding():
    """/Differences on top of /BaseEncoding /WinAnsiEncoding: the
    remapped code follows Differences, unmapped codes the base."""
    fonts = {"F4": (b"<< /Type /Font /Subtype /Type1 "
                    b"/BaseFont /Helvetica /Encoding << "
                    b"/BaseEncoding /WinAnsiEncoding "
                    b"/Differences [145 /bullet] >> >>")}
    s = chr(0x91) + chr(0x92)  # 0x91 remapped, 0x92 stays WinAnsi
    pdf = build_pdf([[(72, 100, s, {"font": "F4"})]], extra_fonts=fonts)
    (t,) = _texts(pdf_to_page_xml(pdf)[0])
    assert t == "•’"


def test_winansi_undefined_bytes_fall_back():
    tbl = _simple_encoding_table("/WinAnsiEncoding")
    # cp1252's undefined 0x81/0x8D/0x8F/0x90/0x9D fall back to latin-1
    for b in (0x81, 0x8D, 0x8F, 0x90, 0x9D):
        assert tbl[b] == chr(b)
    assert tbl[0x93] == "“" and tbl[0x97] == "—"
    assert _simple_encoding_table("/SomethingElse") is None


def test_contd_whiteout_fires_from_winansi_pdf():
    """End to end: a WinAnsi CONT’D (curly apostrophe, the form
    Word produces) on a character cue must be whited out by the block
    engine exactly like the XML-path fixtures pin."""
    from ray_script_extract.engine.parse_text import parse_pages_xml

    f = {"font": "F4"}
    page1 = [(72, 108, "INT. LOBBY - DAY", f)]
    top = 96
    for k in range(10):
        page1.append((top, 108,
                      f"Filler action line {k} with plenty of words to "
                      f"exceed the fly-page caps.", f))
        top += 24
    page1 += [
        (top, 280, "HERO (CONT" + chr(0x92) + "D)", f),
        (top + 12, 180, "Still my scene after the page turn.", f),
    ]
    page2 = [(72, 108, "EXT. STREET - NIGHT", f),
             (96, 108, "Closing action keeps the doc honest.", f)]
    pdf = build_pdf([page1, page2], extra_fonts=WINANSI_FONT)
    spans = [(o.get_type_json(), o.content)
             for o in parse_pages_xml(pdf_to_page_xml(pdf))]
    chars = [c for k, c in spans if k == "Character"]
    assert chars == ["HERO"]  # (CONT'D) scrubbed, not mangled
    assert all("\x92" not in c for _, c in spans)
