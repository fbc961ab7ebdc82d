"""Writers (Fountain / WD-JSON), post-passes (lineNumbers, revisions),
and the full conversion entry point."""

from __future__ import annotations

from ray_script_extract.engine.pdfdoc import convert_pdf_xml_document
from ray_script_extract.pipelines.analytics import (
    split_character_modifier,
    split_speakers,
    strip_parens,
)
from ray_script_extract.sources.pagexml_fixtures import PageBuilder, screenplay_page

SCENES = [{
    "slug": "INT. KITCHEN - DAY",
    "action": ["Jane enters. We see her smile.",
               "She opens the oven and pulls out a cake."],
    "speeches": [("JANE", "(hopeful)", ["I made you something.",
                                        "It took me all day."]),
                 ("MARK (V.O.)", None, ["What is it? Tell me now."]),
                 ("JANE", None, ["You will have to wait and see.",
                                 "I promise it is worth the wait."])],
    "transition": "CUT TO:",
}, {
    "slug": "INT. HALLWAY - LATER",
    "action": ["Mark paces back and forth along the hallway rug."],
    "speeches": [("MARK", None, ["I should just go and look already."]),
                 ("JANE", None, ["Patience is a virtue, you know."])],
}]
SCENES_2 = [{
    "slug": "EXT. GARDEN - NIGHT",
    "action": ["Mark walks outside quickly."],
    "speeches": [("MARK", None, ["I cannot wait any longer."])],
}]


def _pages():
    return [screenplay_page(1, SCENES), screenplay_page(2, SCENES_2)]


def test_wd_json_document_shape():
    doc = convert_pdf_xml_document(_pages(), output="json")
    assert set(doc) >= {"lines", "titlePage", "pageSettings", "revisions",
                        "lineNumbers"}
    assert doc["pageSettings"]["pageSize"] == "Letter"
    types = [l["type"] for l in doc["lines"]]
    assert "Scene" in types and "Dialogue" in types and "Character" in types
    # first line of each page carries givenPageNum
    assert "givenPageNum" in doc["lines"][0]
    # dense body: no titlePage for this input (page 1 is dense)
    assert doc["titlePage"]["lines"] == []


def test_wd_json_dual_column_flags():
    pb = PageBuilder(number=1)
    pb.line(108, "INT. HALL - DAY")
    for k in range(12):
        pb.line(108, f"Filler action line {k} with plenty of words to exceed caps.",
                blank_before=1)
    pb.line(280, "JANE" + " " * 20 + "MARK", blank_before=1)
    pb.raw_text(pb.top, 180, "I say left things.")
    pb.raw_text(pb.top, 380, "I say right things.")
    pb.top += 12
    doc = convert_pdf_xml_document([pb.xml(), PageBuilder(number=2).xml()])
    cols = [(l["type"], l.get("column")) for l in doc["lines"]
            if l["type"] == "Character"]
    assert ("Character", 1) in cols and ("Character", 2) in cols


def test_fountain_output():
    text = convert_pdf_xml_document(_pages(), output="fountain")
    assert "INT. KITCHEN - DAY" in text
    assert "\nJANE\n" in text
    assert "(hopeful)" in text
    assert "CUT TO:" in text
    # transitions ending in " TO:" are not > prefixed
    assert ">CUT TO:" not in text


def test_fountain_forced_slug_prefix():
    """A Slugline not matching INT/EXT grammar gets a forcing dot."""
    pb = PageBuilder(number=1)
    pb.line(108, "MONTAGE OF SEASONS")
    for k in range(11):
        pb.line(108, f"Filler action line {k} with plenty of words to exceed caps.",
                blank_before=1)
    text = convert_pdf_xml_document([pb.xml(), PageBuilder(number=2).xml()],
                                    output="fountain")
    assert "\n.MONTAGE OF SEASONS\n" in text


def test_line_numbers_vote():
    """Left scene numbers on most sluglines → lineNumbers entry."""
    pb = PageBuilder(number=1)
    pb.line(108, "Some opening action to anchor the page with words.")
    for k in range(6):
        top = pb.top + 12
        pb.raw_text(top, 40, str(k + 1))
        pb.raw_text(top, 108, f"INT. ROOM {k + 1} - DAY")
        pb.top = top + 12
        pb.line(108, f"Action in room number {k + 1} happens right here.",
                blank_before=1)
    doc = convert_pdf_xml_document([pb.xml(), PageBuilder(number=2).xml()])
    assert doc["lineNumbers"].get("Scene") == {"left": 1}


def test_character_name_helpers():
    assert strip_parens("DANIEL (O.S.)") == "DANIEL"
    assert split_character_modifier("JANE (V.O.) (CONT'D)") == ("JANE", "V.O.")
    assert split_speakers("MARCELLUS & BERNARDO") == ["MARCELLUS", "BERNARDO"]
    assert split_speakers("X, Y AND Z") == ["X", "Y", "Z"]
    assert split_speakers("NICK (front and center)") == ["NICK"]


def test_revisions_from_colored_fonts():
    """A page with a red revision font + header name produces a
    revision entry."""
    pb = PageBuilder(number=1, fonts=[("0", 12, "#000000"),
                                      ("1", 12, "#ff0000")])
    pb.raw_text(30, 108, "Blue Revision Draft")
    pb.line(108, "Normal action on this page with several words.")
    for k in range(10):
        pb.line(108, f"More filler action line {k} to defeat the title page.",
                blank_before=1)
    pb.line(108, "A changed line in the revision color.", blank_before=1,
            font="1")
    doc = convert_pdf_xml_document([pb.xml(), PageBuilder(number=2).xml()])
    assert any(r["name"] == "Blue Revision Draft" for r in doc["revisions"])


def test_analyzer_walk_contd_merge():
    """Analyzer semantics: NICK → NICK (CONT'D) merges into one
    speech; unattributed Dialogue opens a speech for the last
    speaker (Analyzer.php:480-517)."""
    from ray_script_extract.pipelines.analytics import _doc_dialog_counts

    spans = [
        {"kind": "Scene", "text": "INT. A - DAY"},
        {"kind": "Character", "text": "NICK"},
        {"kind": "Dialogue", "text": "one two three"},
        {"kind": "Character", "text": "NICK (CONT'D)"},
        {"kind": "Dialogue", "text": "four five"},
        {"kind": "Action", "text": "He leaves."},
        {"kind": "Character", "text": "NICK"},
        {"kind": "Dialogue", "text": "six"},
        {"kind": "Character", "text": "A & B"},
        {"kind": "Dialogue", "text": "seven eight"},
    ]
    counts = _doc_dialog_counts(spans)
    assert counts["NICK"] == (2, 6)
    assert counts["A"] == (1, 2) and counts["B"] == (1, 2)
