"""Deterministic PDF-engine regression scenarios.

Each scenario builds page-XML for one rule family; expected outputs
are frozen in tests/data/pdf_engine_golden.json (generated once by
``python tests/regression_docs.py``, reviewed, committed) and guarded
by test_pdf_golden_regression.py — refactor armor for the block
engine.
"""

from __future__ import annotations

import json
import os
import sys
from typing import Dict, List

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ray_script_extract.sources.pagexml_fixtures import PageBuilder  # noqa: E402

GOLDEN_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "data", "pdf_engine_golden.json")


def _dense(pb: PageBuilder, n: int = 10, start: int = 0) -> None:
    pb.line(108, "INT. HALL - DAY")
    for k in range(start, start + n):
        pb.line(108, f"Filler action line {k} with plenty of words to exceed caps.",
                blank_before=1)


def scenario_contact_info_and_hrule() -> List[str]:
    pb = PageBuilder(number=1)
    _dense(pb)
    pb.line(108, "-----------------", blank_before=1)
    pb.line(108, "Jane Writer", blank_before=1)
    pb.line(108, "123 Elm Street")
    pb.line(108, "Springfield, IL 62704")
    pb.line(108, "Phone: 555-123-4567 today")
    return [pb.xml(), PageBuilder(number=2).xml()]


def scenario_date_page_header() -> List[str]:
    pb = PageBuilder(number=1)
    pb.line(108, "Rev. 3/14/22")
    pb.line(108, "INT. OFFICE - DAY", blank_before=1)
    for k in range(9):
        pb.line(108, f"Busy office action number {k} with words to exceed caps.",
                blank_before=1)
    return [pb.xml(), PageBuilder(number=2).xml()]


def scenario_orphan_character() -> List[str]:
    pb = PageBuilder(number=1)
    _dense(pb)
    pb.line(280, "JANE", blank_before=1)
    pb.line(280, "MARK", blank_before=1)  # orphan: no dialog between
    pb.line(180, "I am the only one who talks.")
    return [pb.xml(), PageBuilder(number=2).xml()]


def scenario_dialog_after_slug_demotion() -> List[str]:
    """'1492' scrolling-epilogue case: dialog-indented block preceded
    by a slugline (no character) demotes."""
    pb = PageBuilder(number=1)
    _dense(pb)
    pb.line(280, "JANE", blank_before=1)
    pb.line(180, "I will read you my sign now.")
    pb.line(108, "EXT. TOWN SQUARE - DAY", blank_before=2)
    pb.line(180, "Welcome, weary travelers, one and all.", blank_before=1)
    return [pb.xml(), PageBuilder(number=2).xml()]


def scenario_orphan_trailing_characters() -> List[str]:
    """Non-dialog lines that look_like_character are caught by the
    character clause, then demoted by the orphan-Character fix
    (they never reach the Unknown-at-modal-indent rule)."""
    pb = PageBuilder(number=1)
    for k in range(6):
        pb.line(280, "JANE" if k % 2 == 0 else "MARK", blank_before=1)
        pb.line(180, f"I will speak my line number {k} right here.")
    pb.line(108, "somewhere else entirely", blank_before=1)
    pb.line(108, "ANOTHER PLACE ENTIRELY", blank_before=1)
    return [pb.xml(), PageBuilder(number=2).xml()]


def scenario_tight_fragments_concatenate() -> List[str]:
    """Fragments 3px apart on one line concatenate with 0 gap spaces
    at line assembly (floor(3/7)=0) — the reference\'s
    intersentence block merge is unreachable on the XML path since
    the 12-space splitter implies >=84px inter-piece gaps."""
    pb = PageBuilder(number=1)
    _dense(pb)
    top = pb.top + 12
    pb.raw_text(top, 108, "He stops.")
    # right edge = 108 + 9*7 = 171; next at 174 (gap 3 <= 5)
    pb.raw_text(top, 174, "Then he turns around slowly.")
    pb.top = top + 12
    return [pb.xml(), PageBuilder(number=2).xml()]


def scenario_transition_backprop() -> List[str]:
    """Uppercase unsure block right before a slugline at index >20
    becomes a Transition."""
    pb = PageBuilder(number=1)
    _dense(pb, 10)
    pb.line(280, "JANE", blank_before=1)
    pb.line(180, "I anchor the character indent at 280 here.")
    pb.line(280, "MARK", blank_before=1)
    pb.line(180, "I keep that indent honest with my line.")
    # x=430 matches no indent level → classification stays unsure;
    # tight above the slugline (a blank between defeats the rule)
    pb.line(430, "RIPPLE WIPE", blank_before=1)
    pb.line(108, "INT. DREAMSCAPE - NIGHT")
    pb.line(108, "Everything shimmers and melts away.", blank_before=1)
    return [pb.xml(), PageBuilder(number=2).xml()]


def scenario_dual_multiline_columns() -> List[str]:
    pb = PageBuilder(number=1)
    _dense(pb, 12)
    pb.line(280, "JANE" + " " * 22 + "MARK", blank_before=1)
    for l, r in [("I speak my first left line.", "And I the first right one."),
                 ("Then my second left line.", "Then my second right one.")]:
        pb.raw_text(pb.top, 180, l)
        pb.raw_text(pb.top, 390, r)
        pb.top += 12
    pb.line(108, "They finish together.", blank_before=1)
    return [pb.xml(), PageBuilder(number=2).xml()]


def scenario_dual_paren_column() -> List[str]:
    pb = PageBuilder(number=1)
    _dense(pb, 12)
    pb.line(280, "JANE" + " " * 22 + "MARK", blank_before=1)
    pb.raw_text(pb.top, 180, "I speak plainly here.")
    pb.raw_text(pb.top, 390, "(whispering)")
    pb.top += 12
    pb.raw_text(pb.top, 390, "And I whisper my reply.")
    pb.top += 12
    pb.line(108, "Silence falls.", blank_before=1)
    return [pb.xml(), PageBuilder(number=2).xml()]


SCENARIOS: Dict[str, List[str]] = {
    "dual_multiline_columns": scenario_dual_multiline_columns(),
    "dual_paren_column": scenario_dual_paren_column(),
    "contact_info_and_hrule": scenario_contact_info_and_hrule(),
    "date_page_header": scenario_date_page_header(),
    "orphan_character": scenario_orphan_character(),
    "dialog_after_slug_demotion": scenario_dialog_after_slug_demotion(),
    "orphan_trailing_characters": scenario_orphan_trailing_characters(),
    "tight_fragments_concatenate": scenario_tight_fragments_concatenate(),
    "transition_backprop": scenario_transition_backprop(),
}


def compute_outputs() -> Dict[str, List]:
    from ray_script_extract.engine.parse_text import parse_pages_xml

    return {name: [[o.get_type_json(), o.content]
                   for o in parse_pages_xml(pages)]
            for name, pages in SCENARIOS.items()}


if __name__ == "__main__":
    os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
    outputs = compute_outputs()
    with open(GOLDEN_PATH, "w") as f:
        json.dump(outputs, f, indent=1)
    for name, spans in outputs.items():
        print(f"== {name}")
        for kind, text in spans:
            print(f"  {kind:12s} {text[:60]!r}")
