"""Generic DOM-density boilerplate strip for arbitrary HTML — the
"main-content extraction" tier of a web-scale pipeline.

Method: the densitometric classifier of Kohlschütter, Fankhauser &
Nejdl, "Boilerplate Detection Using Shallow Text Features" (WSDM'10),
with jusText-style (Pomikálek 2011) neighbour smoothing: segment the
DOM into leaf text blocks, score each by WORD COUNT and LINK DENSITY
only (shallow features — no site templates, no rendering), keep the
content-dense blocks.

The reference's single HTML path is its screenplay-specific strip
(``sources/shakespeare.py:13`` — drop non-dialog body children),
which IS its boilerplate heuristic for that domain; this module is
the general-web operator the 100-TB extraction tier needs for mixed
documents (north rule: "HTML boilerplate strip, … DOM heuristics").

Classification rules (deterministic, oracle-checkable):

* ``link_density > 1/3``                → boilerplate (nav, footers,
  related-post lists are link-dominated — WSDM'10 fig. 4);
* ``words >= GOOD_WORDS`` (default 8)   → content;
* ``SHORT_MIN <= words < GOOD_WORDS``   → content IFF an adjacent
  block is content by the rules above (jusText "short" promotion —
  picks up single-sentence paragraphs inside articles);
* otherwise                             → boilerplate.

Word counting uses the engine-wide ``\\S+`` convention so DuckDB
replicates it exactly (``pipelines/queries.py`` oracle discipline).
"""

from __future__ import annotations

import re
from typing import List, Tuple

from .htmldom import Node, parse_html

# block-level segmentation tags: an element here with no block-level
# descendant is one text block (WSDM'10 segments on the same HTML
# block set)
BLOCK_TAGS = frozenset((
    "p", "div", "td", "li", "h1", "h2", "h3", "h4", "h5", "h6",
    "blockquote", "pre", "article", "section", "main", "dd", "dt",
))
# subtrees that never contribute text
_SKIP = frozenset(("script", "style", "noscript", "head", "template"))

MAX_LINK_DENSITY = 1 / 3
GOOD_WORDS = 8
SHORT_MIN = 3

_WORDS = re.compile(r"\S+")


def _block_stats(node: Node) -> Tuple[str, int, int]:
    """(text, total_chars, link_chars) of a block subtree, skipping
    script/style; link chars = chars under any <a> descendant."""
    out: List[str] = []
    link = 0
    total = 0
    stack: List[Tuple[object, bool]] = [(node, False)]
    while stack:
        n, in_link = stack.pop()
        if isinstance(n, str):
            out.append(n)
            total += len(n)
            if in_link:
                link += len(n)
            continue
        if n.tag in _SKIP:
            continue
        child_in_link = in_link or n.tag == "a"
        stack.extend((c, child_in_link) for c in reversed(n.children))
    return "".join(out), total, link


def text_blocks(root: Node) -> List[Tuple[str, int, float]]:
    """Leaf text blocks in document order: (text, words,
    link_density).  A block is a BLOCK_TAGS element with no BLOCK_TAGS
    descendant; empty blocks are dropped."""
    blocks: List[Tuple[str, int, float]] = []

    def walk(node: Node) -> bool:
        """Returns True when the subtree contained a block element."""
        had_block = False
        for child in node.children:
            if isinstance(child, str):
                continue
            if child.tag in _SKIP:
                continue
            if walk(child):
                had_block = True
            elif child.tag in BLOCK_TAGS:
                had_block = True
                text, total, link = _block_stats(child)
                words = len(_WORDS.findall(text))
                if words:
                    ld = (link / total) if total else 0.0
                    blocks.append((text.strip(), words, ld))
        return had_block

    walk(root)
    return blocks


def classify_blocks(blocks) -> List[bool]:
    """WSDM'10 shallow-feature rule + jusText short-block promotion.
    The promotion pass uses the BASE labels of the neighbours (one
    pass, no cascade) so classification stays order-independent and
    exactly reproducible."""
    base = [ld <= MAX_LINK_DENSITY and words >= GOOD_WORDS
            for _t, words, ld in blocks]
    out = list(base)
    for i, (_t, words, ld) in enumerate(blocks):
        if (not base[i] and ld <= MAX_LINK_DENSITY
                and SHORT_MIN <= words < GOOD_WORDS):
            prev_good = i > 0 and base[i - 1]
            next_good = i + 1 < len(blocks) and base[i + 1]
            if prev_good or next_good:
                out[i] = True
    return out


def extract_main_content(html: str) -> Tuple[str, int]:
    """(main_text, n_boilerplate_blocks): content blocks joined with
    blank lines, boilerplate count for auditability."""
    blocks = text_blocks(parse_html(html))
    keep = classify_blocks(blocks)
    main = "\n\n".join(t for (t, _w, _ld), k in zip(blocks, keep) if k)
    return main, sum(1 for k in keep if not k)
