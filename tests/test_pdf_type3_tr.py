"""Deterministic pins for two content-stream features:

* ``Tr`` text rendering mode (PDF 32000-1 §9.3.6): modes with
  ``(mode & 3) == 3`` (3 = invisible, 7 = clip-only) paint nothing —
  poppler's pdftohtml drops them without ``-hidden``, which is the
  toolchain the reference (`/root/reference` convert path) consumes —
  but the pen still advances, so following fragments keep their
  positions (the scanned-page OCR-underlay shape).

* Type3 fonts (§9.6.5): /Widths are in GLYPH space scaled by
  /FontMatrix, not the fixed 1/1000 of Type1/TrueType.
"""

from __future__ import annotations

from ray_script_extract.sources.pdfnative import (PdfDocument,
                                                  _extract_page_runs)

from tests.test_pdf_interpreter_fuzz import _pdf_around

COUR_ADV = 0.6 * 12  # Courier em 600/1000 × 12pt


def _runs(content: bytes, pdf_bytes: bytes | None = None):
    doc = PdfDocument(pdf_bytes if pdf_bytes is not None
                      else _pdf_around(content))
    (page,) = list(doc.pages())
    runs, _media, _w, _h = _extract_page_runs(doc, page)
    return [(r.text, r.x, r.y, r.width) for r in runs]


def test_tr_invisible_advances_silently():
    got = _runs(b"BT /F1 12 Tf 1 0 0 1 72 700 Tm "
                b"(vis) Tj 3 Tr (hid) Tj 0 Tr (vis2) Tj ET")
    assert [g[0] for g in got] == ["vis", "vis2"]
    assert got[0][1] == 72.0
    # vis2 starts AFTER the invisible run's full advance
    assert abs(got[1][1] - (72.0 + 2 * 3 * COUR_ADV)) < 1e-9


def test_tr_clip_mode7_also_hidden_but_stroke_fill_kept():
    got = _runs(b"BT /F1 12 Tf 1 0 0 1 72 700 Tm "
                b"1 Tr (stroke) Tj 2 Tr (fillstroke) Tj "
                b"7 Tr (clip) Tj 4 Tr (fillclip) Tj ET")
    # modes 1/2 paint; 7 is invisible ink; 4 (fill+clip) paints
    assert [g[0] for g in got] == ["stroke", "fillstroke", "fillclip"]


def test_tr_saved_and_restored_by_q_Q():
    got = _runs(b"BT /F1 12 Tf 1 0 0 1 72 700 Tm "
                b"q 3 Tr (hid) Tj Q (vis) Tj ET")
    assert [g[0] for g in got] == ["vis"]
    assert abs(got[0][1] - (72.0 + 3 * COUR_ADV)) < 1e-9


def _type3_pdf(content: bytes, font_matrix: str = "0.01 0 0 0.01 0 0",
               widths: str = "60 40", first_char: int = 65) -> bytes:
    """Minimal Type3 font PDF: /A and /B glyphs with CharProc stubs."""
    objs = []

    def add(b: bytes) -> int:
        objs.append(b)
        return len(objs)

    c = add(b"<< /Length %d >>\nstream\n" % len(content)
            + content + b"\nendstream")
    gbody = b"60 0 d0"
    glyph = add(b"<< /Length %d >>\nstream\n" % len(gbody)
                + gbody + b"\nendstream")
    f = add((f"<< /Type /Font /Subtype /Type3 "
             f"/FontBBox [0 0 100 100] "
             f"/FontMatrix [{font_matrix}] "
             f"/CharProcs << /A {glyph} 0 R /B {glyph} 0 R >> "
             f"/Encoding << /Differences [{first_char} /A /B] >> "
             f"/FirstChar {first_char} /LastChar {first_char + 1} "
             f"/Widths [{widths}] >>").encode())
    p = add(f"<< /Type /Page /Parent {len(objs) + 2} 0 R "
            f"/Contents {c} 0 R >>".encode())
    pages = add((f"<< /Type /Pages /Kids [{p} 0 R] /Count 1 "
                 f"/MediaBox [0 0 612 792] "
                 f"/Resources << /Font << /F1 {f} 0 R >> >> >>").encode())
    cat = add(f"<< /Type /Catalog /Pages {pages} 0 R >>".encode())
    out = bytearray(b"%PDF-1.4\n")
    offs = []
    for i, body in enumerate(objs, start=1):
        offs.append(len(out))
        out += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"
    xref = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for o in offs:
        out += f"{o:010d} 00000 n \n".encode()
    out += (f"trailer\n<< /Size {len(objs) + 1} /Root {cat} 0 R >>\n"
            f"startxref\n{xref}\n%%EOF\n").encode()
    return bytes(out)


def test_type3_fontmatrix_scales_widths():
    # FontMatrix a=0.01: glyph widths 60/40 → text-space 0.6/0.4 em
    # → at 12pt the advances are 7.2 and 4.8
    pdf = _type3_pdf(b"BT /F1 12 Tf 1 0 0 1 72 700 Tm (AB) Tj (A) Tj ET")
    got = _runs(b"", pdf)
    assert [g[0] for g in got] == ["AB", "A"]
    assert abs(got[0][3] - (7.2 + 4.8)) < 1e-9     # width of (AB)
    assert abs(got[1][1] - (72.0 + 12.0)) < 1e-9   # (A) starts after it


def test_type3_default_fontmatrix_is_thousandths():
    # a 0.001 FontMatrix makes Type3 widths behave like Type1's /1000
    pdf = _type3_pdf(b"BT /F1 10 Tf 1 0 0 1 0 700 Tm (AB) Tj ET",
                     font_matrix="0.001 0 0 0.001 0 0",
                     widths="600 500")
    got = _runs(b"", pdf)
    assert abs(got[0][3] - (6.0 + 5.0)) < 1e-9


def test_type3_never_uses_std14_metrics():
    from ray_script_extract.sources.pdfnative import _Font

    doc = PdfDocument(_type3_pdf(b"BT ET"))
    fd = None
    for num in list(doc.objects):
        obj = doc.resolve(doc.objects[num])
        if isinstance(obj, dict) and obj.get("/Subtype") == "/Type3":
            fd = obj
    # /Helvetica WOULD select proportional std-14 metrics for a simple
    # font with no /Widths — the /Type3 subtype must block that
    font = _Font(doc, dict(fd, **{"/Widths": None,
                                  "/BaseFont": "/Helvetica"}))
    assert font.std14 is None
