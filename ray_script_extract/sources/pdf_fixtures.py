"""Author minimal real PDF files for the native front-end tests
(FIXTURES.md §4): catalog → 2-level page tree → Courier text pages,
optionally Flate-compressed content streams, coordinates on the same
grid the page-XML fixtures use (top = page_h - ty - size_px)."""

from __future__ import annotations

import zlib
from typing import List, Optional, Sequence, Tuple

SIZE_PT = 12
SIZE_PX = 16  # floor(12 * 4/3)


def _escape_pdf_string(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def page_content(lines: Sequence[Tuple[int, int, str]],
                 page_h: int = 792) -> bytes:
    """lines: [(top, left, text)] on the engine's pixel grid."""
    parts = ["BT", f"/F1 {SIZE_PT} Tf"]
    for top, left, text in lines:
        ty = page_h - top - SIZE_PX
        parts.append(f"1 0 0 1 {left} {ty} Tm")
        parts.append(f"({_escape_pdf_string(text)}) Tj")
    parts.append("ET")
    return "\n".join(parts).encode("latin-1")


def build_pdf(pages: List[Sequence[Tuple[int, int, str]]],
              compress: bool = True, page_w: int = 612,
              page_h: int = 792) -> bytes:
    """Build a PDF with a 2-level page tree (pages split into two
    /Pages nodes when >1 page) and one Courier font."""
    objects: List[bytes] = []

    def add(obj_body: bytes) -> int:
        objects.append(obj_body)
        return len(objects)  # 1-based object number

    font_num = add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Courier >>")

    content_nums = []
    for page_lines in pages:
        data = page_content(page_lines, page_h)
        if compress:
            comp = zlib.compress(data)
            body = (f"<< /Length {len(comp)} /Filter /FlateDecode >>\n"
                    .encode() + b"stream\n" + comp + b"\nendstream")
        else:
            body = (f"<< /Length {len(data)} >>\n".encode()
                    + b"stream\n" + data + b"\nendstream")
        content_nums.append(add(body))

    n = len(pages)
    # reserve object numbers: pages, then kid nodes, then root pages node
    page_nums = [len(objects) + 1 + i for i in range(n)]
    split = (n + 1) // 2
    if n > 1:
        kid_a_num = len(objects) + n + 1
        kid_b_num = kid_a_num + 1
        root_num = kid_b_num + 1
        parent_of = [kid_a_num if i < split else kid_b_num for i in range(n)]
    else:
        root_num = len(objects) + n + 1
        parent_of = [root_num] * n

    for i in range(n):
        add((f"<< /Type /Page /Parent {parent_of[i]} 0 R "
             f"/Contents {content_nums[i]} 0 R >>").encode())

    resources = f"<< /Font << /F1 {font_num} 0 R >> >>"
    if n > 1:
        kids_a = " ".join(f"{p} 0 R" for p in page_nums[:split])
        kids_b = " ".join(f"{p} 0 R" for p in page_nums[split:])
        add((f"<< /Type /Pages /Parent {root_num} 0 R /Kids [{kids_a}] "
             f"/Count {split} >>").encode())
        add((f"<< /Type /Pages /Parent {root_num} 0 R /Kids [{kids_b}] "
             f"/Count {n - split} >>").encode())
        add((f"<< /Type /Pages /Kids [{kid_a_num} 0 R {kid_b_num} 0 R] "
             f"/Count {n} /MediaBox [0 0 {page_w} {page_h}] "
             f"/Resources {resources} >>").encode())
    else:
        kids = " ".join(f"{p} 0 R" for p in page_nums)
        add((f"<< /Type /Pages /Kids [{kids}] /Count {n} "
             f"/MediaBox [0 0 {page_w} {page_h}] "
             f"/Resources {resources} >>").encode())
    catalog_num = add(f"<< /Type /Catalog /Pages {root_num} 0 R >>".encode())

    # serialize with a classic xref table
    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for i, body in enumerate(objects, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_pos = len(out)
    out += f"xref\n0 {len(objects) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (f"trailer\n<< /Size {len(objects) + 1} /Root {catalog_num} 0 R >>\n"
            f"startxref\n{xref_pos}\n%%EOF\n").encode()
    return bytes(out)


def screenplay_pdf_lines(scenes: List[dict], start_top: int = 72
                         ) -> List[Tuple[int, int, str]]:
    """Same scene-dict shape as pagexml_fixtures.screenplay_page but
    producing (top, left, text) tuples for build_pdf."""
    lines: List[Tuple[int, int, str]] = []
    top = start_top
    first = True

    def emit(left: int, text: str, blank_before: int = 0) -> None:
        nonlocal top
        top += 12 * blank_before
        lines.append((top, left, text))
        top += 12

    for scene in scenes:
        emit(108, scene["slug"], 0 if first else 2)
        first = False
        for action in scene.get("action", ()):
            emit(108, action, 1)
        for name, paren, dialog in scene.get("speeches", ()):
            emit(280, name, 1)
            if paren:
                emit(245, paren)
            for d in dialog:
                emit(180, d)
        if scene.get("transition"):
            emit(430, scene["transition"], 1)
    return lines
