"""Synthetic pdftohtml-style page-XML builders for tests and the
synthetic corpus (FIXTURES.md §3 coordinate conventions).

Screenplay layout grid (pixel space, Letter 612x792 @72dpi):
slugline/action x=108, character x=280, paren x=245, dialog x=180,
transition x=430+, line pitch 12px, first baseline 72, header ≤42,
footer >742.
"""

from __future__ import annotations

from typing import List, Optional, Tuple
from xml.sax.saxutils import escape

CHAR_W = 7
LINE_H = 12


class PageBuilder:
    """Accumulates <text> nodes top-down on the 12px line grid."""

    def __init__(self, number: int = 1, width: int = 612, height: int = 792,
                 fonts: Optional[List[Tuple[str, int, str]]] = None) -> None:
        self.number = number
        self.width = width
        self.height = height
        # (id, size_pt, color)
        self.fonts = fonts if fonts is not None else [("0", 12, "#000000")]
        self.nodes: List[str] = []
        self.top = 72

    def raw_text(self, top: int, left: int, text: str, font: str = "0",
                 height: int = 12, width: Optional[int] = None) -> None:
        w = width if width is not None else len(text) * CHAR_W
        self.nodes.append(
            f'<text top="{top}" left="{left}" width="{w}" '
            f'height="{height}" font="{font}">{escape(text)}</text>')

    def line(self, left: int, text: str, blank_before: int = 0,
             font: str = "0") -> None:
        """One text line at the next grid position, after
        ``blank_before`` blank lines."""
        self.top += LINE_H * blank_before
        self.raw_text(self.top, left, text, font=font)
        self.top += LINE_H

    def xml(self) -> str:
        fontspecs = "".join(
            f'<fontspec id="{fid}" size="{size}" family="Courier" color="{color}"/>'
            for fid, size, color in self.fonts)
        return (f'<page number="{self.number}" width="{self.width}" '
                f'height="{self.height}">{fontspecs}{"".join(self.nodes)}</page>')


def screenplay_page(number: int, scenes: List[dict]) -> str:
    """Build a page from a list of scene dicts:
    {"slug": str, "action": [str], "speeches": [(name, paren|None, [dialog])]}"""
    pb = PageBuilder(number=number)
    first = True
    for scene in scenes:
        pb.line(108, scene["slug"], blank_before=0 if first else 2)
        first = False
        for action in scene.get("action", ()):
            pb.line(108, action, blank_before=1)
        for name, paren, dialog_lines in scene.get("speeches", ()):
            pb.line(280, name, blank_before=1)
            if paren:
                pb.line(245, paren)
            for d in dialog_lines:
                pb.line(180, d)
        if scene.get("transition"):
            pb.line(430, scene["transition"], blank_before=1)
    return pb.xml()
