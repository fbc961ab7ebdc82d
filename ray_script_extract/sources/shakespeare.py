"""Shakespeare-style HTML play reader (the HTML extraction path).

Behavioral spec re-derived from the reference's shakespeare reader
(`/root/reference/src/parser/analyzer/ParseShakespeare.php:8-122`):

* title from ``<head><title>`` with the last 13 chars (": Entire Play")
  sliced off unconditionally;
* a synthesized 49-line title page: 17 blanks, Title, 3 blanks, a
  centered "By", 2 blanks, Author ("William Shakespeare"), 24 blanks;
* a walk over direct children of ``<body>`` consuming only ``a`` /
  ``blockquote`` / ``h3`` elements — everything else (nav tables,
  bare stage-direction ``<i>`` inside blockquotes, stray ``<p>``)
  is dropped: this IS the DOM-heuristic boilerplate strip;
* ``<a name=speechN>`` → Character, with consecutive speakers merged
  into ``"X & Y"``;
* inside blockquote: ``<a name=…>`` → Dialog (leading ``[…]`` pulled
  out as a Paren, keeping the quirky leading space on the remainder;
  literal "EPILOGUE" → Slugline); ``<p>`` → Action unless it starts
  with "To " or equals "Aside" (→ Paren);
* ``<h3>`` → Act when prefixed "ACT" else Slugline.
"""

from __future__ import annotations

from typing import List, Tuple

from ..engine.objects import ScriptObject
from ..functions.textutil import collapse_blanks_and_newlines, is_prefix
from .htmldom import Node, parse_html

ENTIRE_PLAY_SUFFIX_LEN = len(": Entire Play")


def _obj(type_: str, content: str, title_page: bool = False) -> ScriptObject:
    page_num = 1 if title_page else 2
    return ScriptObject(type_, content, page_num, page_num,
                        colors={}, font_size=16, text_attributes={},
                        pdf_path=False)


def parse_shakespeare_text(html_text: str) -> List[ScriptObject]:
    """Parse one Shakespeare-style HTML document into ordered ScriptObjects."""
    root = parse_html(html_text)
    objects: List[ScriptObject] = []

    # --- title page synthesis ---------------------------------------
    title = ""
    head = root.find_first("head")
    if head is not None:
        for child in head.element_children():
            if child.tag == "title":
                content = collapse_blanks_and_newlines(child.text())
                title = content[: len(content) - ENTIRE_PLAY_SUFFIX_LEN]
    author = "William Shakespeare"

    def blanks(n: int) -> None:
        for _ in range(n):
            objects.append(_obj("Text", "", True))

    blanks(17)
    objects.append(_obj("Title", title, True))
    blanks(3)
    by = _obj("Text", "By", True)
    by.set_attribute("alignment", "center")
    objects.append(by)
    blanks(2)
    objects.append(_obj("Author", author, True))
    blanks(24)

    # --- body walk ----------------------------------------------------
    body = root.find_first("body")
    if body is not None:
        for child in body.element_children():
            if child.tag == "a":
                name = child.get("name")
                content = collapse_blanks_and_newlines(child.text())
                if name is not None and is_prefix(name, "speech"):
                    if objects and objects[-1].type == "Character":
                        # Two characters speaking at once merge: "X & Y"
                        last = objects[-1]
                        last.set_content(last.content + f" & {content}")
                    else:
                        objects.append(_obj("Character", content))
                # non-speech anchors at body level are dropped
            elif child.tag == "blockquote":
                for c2 in child.element_children():
                    if c2.tag == "a":
                        content = collapse_blanks_and_newlines(c2.text())
                        if content == "EPILOGUE":
                            objects.append(_obj("Slugline", content))
                        else:
                            if content[:1] == "[":
                                end = content.find("]")
                                if end != -1:
                                    paren = "(" + content[1:end] + ")"
                                    content = content[end + 1:]
                                    objects.append(_obj("Paren", paren))
                            if content != "":
                                objects.append(_obj("Dialog", content))
                    elif c2.tag == "p":
                        content = collapse_blanks_and_newlines(c2.text())
                        if is_prefix(content, "To ") or content == "Aside":
                            objects.append(_obj("Paren", "(" + content + ")"))
                        else:
                            objects.append(_obj("Action", content))
                    # other blockquote children (bare <i>, <br>, text) dropped
            elif child.tag == "h3":
                content = collapse_blanks_and_newlines(child.text())
                if is_prefix(content, "ACT"):
                    objects.append(_obj("Act", content))
                else:
                    objects.append(_obj("Slugline", content))
            # all other body children (tables/nav/boilerplate) dropped

    return objects


def objects_to_spans(objects: List[ScriptObject]) -> List[Tuple[str, str, str, int]]:
    """Project ScriptObjects to output span tuples
    (kind, text, media_ref, offset) using the JSON type names."""
    return [(o.get_type_json(), o.content, "", i) for i, o in enumerate(objects)]
