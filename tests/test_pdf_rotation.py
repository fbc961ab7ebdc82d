"""Page rotation (/Rotate, spec 7.7.3.3) + full-affine text matrices:
the scanned-then-OCR'd shape is a page stored rotated (/Rotate 90/270)
whose text objects carry the CANCELING rotation in Tm — poppler
rotates the device space first, so extraction sees horizontal lines.
Before round 5 the engine dropped both rotations (diag-only matrices)
and such pages garbled into one overlapping pile.

All expected coordinates are HAND-COMPUTED from the rotation matrices
derived in ``pdfnative._rotate_ctm`` docstring conventions:
  r=90:  x' = y,      y' = W - x   (display dims H×W)
  r=180: x' = W - x,  y' = H - y
  r=270: x' = H - y,  y' = x       (display dims H×W)
"""

from __future__ import annotations

import re

from ray_script_extract.sources.pdfnative import pdf_to_page_xml


def _one_page_pdf(content: bytes, rotate: int = 0,
                  rotate_on_pages_node: bool = False) -> bytes:
    objs = []

    def add(b: bytes) -> int:
        objs.append(b)
        return len(objs)

    c = add(b"<< /Length %d >>\nstream\n" % len(content)
            + content + b"\nendstream")
    f = add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Courier >>")
    page_rot = b"" if (not rotate or rotate_on_pages_node) \
        else b" /Rotate %d" % rotate
    pages_rot = b" /Rotate %d" % rotate \
        if (rotate and rotate_on_pages_node) else b""
    p = add(b"<< /Type /Page /Parent 4 0 R /Contents %d 0 R%s >>"
            % (c, page_rot))
    pages = add(b"<< /Type /Pages /Kids [%d 0 R] /Count 1 "
                b"/MediaBox [0 0 612 792] "
                b"/Resources << /Font << /F1 %d 0 R >> >>%s >>"
                % (p, f, pages_rot))
    cat = add(b"<< /Type /Catalog /Pages %d 0 R >>" % pages)
    out = bytearray(b"%PDF-1.4\n")
    offs = []
    for i, body in enumerate(objs, start=1):
        offs.append(len(out))
        out += b"%d 0 obj\n" % i + body + b"\nendobj\n"
    xref = len(out)
    out += b"xref\n0 %d\n" % (len(objs) + 1)
    out += b"0000000000 65535 f \n"
    for o in offs:
        out += b"%010d 00000 n \n" % o
    out += (b"trailer\n<< /Size %d /Root %d 0 R >>\n"
            b"startxref\n%d\n%%%%EOF\n" % (len(objs) + 1, cat, xref))
    return bytes(out)


def _text_attrs(xml: str):
    return [dict(re.findall(r'(\w+)="([^"]*)"', m)) |
            {"text": re.sub(r"<[^>]+>", "", m2)}
            for m, m2 in re.findall(r"<text ([^>]*)>(.*?)</text>", xml)]


def _page_dims(xml: str):
    m = re.search(r'<page number="1" width="(\d+)" height="(\d+)"', xml)
    return (m.group(1), m.group(2))


def test_rotate_0_unchanged():
    content = b"BT /F1 12 Tf 1 0 0 1 100 704 Tm (Hi) Tj ET"
    (page,) = pdf_to_page_xml(_one_page_pdf(content))
    (t,) = _text_attrs(page)
    assert (t["top"], t["left"], t["width"]) == ("72", "100", "14")
    assert _page_dims(page) == ("612", "792")


def test_rotate_180_mirrors_coordinates():
    # origin (100, 704) -> display (512, 88); advance runs -x so the
    # box left edge is 512 - 14.4 = 497.6 -> 498; top = 792-88-16=688
    content = b"BT /F1 12 Tf 1 0 0 1 100 704 Tm (Hi) Tj ET"
    (page,) = pdf_to_page_xml(_one_page_pdf(content, rotate=180))
    (t,) = _text_attrs(page)
    assert (t["top"], t["left"], t["width"]) == ("688", "498", "14")
    assert t["text"] == "Hi"
    assert _page_dims(page) == ("612", "792")


def test_rotate_90_with_canceling_tm_reads_horizontal():
    """The scanned-OCR shape: /Rotate 90 page, text written with the
    inverse rotation Tm (0 1 -1 0 ...).  Display: dims swap to
    792x612, the run lands upright at hand-computed (top 72, left
    100), and a SECOND Tj continues along display +x."""
    content = (b"BT /F1 12 Tf 0 1 -1 0 88 100 Tm (Hi) Tj (yo) Tj ET")
    (page,) = pdf_to_page_xml(_one_page_pdf(content, rotate=90))
    a, b = _text_attrs(page)
    assert _page_dims(page) == ("792", "612")
    assert (a["top"], a["left"], a["width"], a["text"]) \
        == ("72", "100", "14", "Hi")
    # second fragment starts at 100 + 14.4
    assert (b["top"], b["left"], b["text"]) == ("72", "114", "yo")


def test_rotate_270_with_canceling_tm():
    # CTM (0,1,-1,0,792,0); Tm linear inverse (0,-1,1,0); want display
    # (100, 524): ey = 792-100=692, ex = 524
    content = b"BT /F1 12 Tf 0 -1 1 0 524 692 Tm (Hi) Tj ET"
    (page,) = pdf_to_page_xml(_one_page_pdf(content, rotate=270))
    (t,) = _text_attrs(page)
    assert _page_dims(page) == ("792", "612")
    assert (t["top"], t["left"], t["width"]) == ("72", "100", "14")


def test_rotate_inherited_from_pages_node():
    content = b"BT /F1 12 Tf 0 1 -1 0 88 100 Tm (Hi) Tj ET"
    (page,) = pdf_to_page_xml(_one_page_pdf(content, rotate=90,
                                            rotate_on_pages_node=True))
    (t,) = _text_attrs(page)
    assert _page_dims(page) == ("792", "612")
    assert (t["top"], t["left"]) == ("72", "100")


def test_full_pipeline_rotated_twin_equals_unrotated():
    """A rotated screenplay page must produce the SAME page XML as its
    unrotated twin once the canceling Tm is applied — the invariant
    that makes scanned-OCR input segment identically downstream."""
    lines = [(72, 108, "INT. LOBBY - DAY"),
             (96, 108, "Some action text to carry through.")]

    def plain(ls):
        # authored directly on the 792x612 display-shaped page
        parts = ["BT", "/F1 12 Tf"]
        for top, left, s in ls:
            ty = 612 - top - 16
            parts.append(f"1 0 0 1 {left} {ty} Tm ({s}) Tj")
        parts.append("ET")
        return "\n".join(parts).encode()

    def rotated90(ls):
        # display (x0, y0_bottomup) -> Tm (0 1 -1 0, ex=612-y0, ey=x0)
        parts = ["BT", "/F1 12 Tf"]
        for top, left, s in ls:
            # display page is 792x612 after the swap
            y0 = 612 - top - 16
            ex, ey = 612 - y0, left
            parts.append(f"0 1 -1 0 {ex} {ey} Tm ({s}) Tj")
        parts.append("ET")
        return "\n".join(parts).encode()

    # the unrotated twin must be authored on the SWAPPED page size so
    # both produce identical display geometry
    def one_page(content, rotate, w, h):
        pdf = _one_page_pdf(content, rotate=rotate)
        return pdf.replace(b"/MediaBox [0 0 612 792]",
                           b"/MediaBox [0 0 %d %d]" % (w, h))

    plain_xml = pdf_to_page_xml(one_page(plain(lines), 0, 792, 612))
    rot_xml = pdf_to_page_xml(one_page(rotated90(lines), 90, 612, 792))
    assert plain_xml == rot_xml
