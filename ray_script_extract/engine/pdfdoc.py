"""PDF document extraction entry points (page-XML path and native path).

``extract_pdf_xml_document`` consumes a list of pdftohtml-style
``<page>`` XML strings (one per page, in order) and runs the full
line-assembly + block-classification engine — the semantics of
`/root/reference/src/parser/analyzer/ParseText.php` re-expressed in
Python.  ``extract_pdf_raw_document`` first runs the native PDF
front-end to produce the same per-page tuples.
"""

from __future__ import annotations

from typing import List

from .objects import ScriptObject


def extract_pdf_xml_document(pages: List[str]) -> List[ScriptObject]:
    from .parse_text import parse_pages_xml

    return parse_pages_xml(pages)


def extract_pdf_raw_document(pdf_data: str) -> List[ScriptObject]:
    """``pdf_data`` is base64 (text column) of a native PDF."""
    import base64

    from ..sources.pdfnative import pdf_to_page_xml

    raw = base64.b64decode(pdf_data)
    return extract_pdf_xml_document(pdf_to_page_xml(raw))
