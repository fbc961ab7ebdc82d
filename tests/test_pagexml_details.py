"""Detail tests for line-assembly semantics: CONTINUED flags, docx
header split, auto-text blacklist, header/footer reassembly, A4,
dual-dialog shared-line split."""

from __future__ import annotations

from ray_script_extract.engine.parse_text import parse_pages_xml, parse_pages_xml_full
from ray_script_extract.engine.pdfdoc import convert_pdf_xml_document
from ray_script_extract.sources.pagexml_fixtures import PageBuilder


def _dense(pb, n=10):
    pb.line(108, "INT. HALL - DAY")
    for k in range(n):
        pb.line(108, f"Filler action line {k} with plenty of words to exceed caps.",
                blank_before=1)


def test_continued_flags_set_and_scrubbed():
    pb = PageBuilder(number=1)
    pb.raw_text(30, 108, "CONTINUED: (2)")
    _dense(pb)
    pb.raw_text(760, 108, "(CONTINUED)")
    doc = convert_pdf_xml_document([pb.xml(), PageBuilder(number=2).xml()])
    ps = doc["pageSettings"]
    assert ps.get("sceneContinuedTop") is True
    assert ps.get("sceneContinuedNumber") is True
    assert ps.get("sceneContinuedBottom") is True
    assert all("CONTINUED" not in l["text"] for l in doc["lines"])


def test_docx_header_ten_space_split_page_number():
    """A docx-style header 'My Script          7.' splits: text part
    becomes the header, number part becomes givenPageNum."""
    pb = PageBuilder(number=1)
    pb.raw_text(30, 108, "My Script" + " " * 10 + "7.")
    _dense(pb)
    objects, state = parse_pages_xml_full([pb.xml(), PageBuilder(number=2).xml()])
    assert state.header_objects[0][0]["value"] == "My Script"
    assert objects[0].given_page_num == "7"


def test_auto_header_footer_blacklist():
    pb = PageBuilder(number=1)
    pb.raw_text(30, 108, "Created using Celtx")
    pb.raw_text(770, 108, "Created using Celtx")
    _dense(pb)
    objects, state = parse_pages_xml_full([pb.xml(), PageBuilder(number=2).xml()])
    assert state.header_objects[0] == []
    assert state.footer_objects[0] == []


def test_header_footer_reassembly_in_json():
    pb1 = PageBuilder(number=1)
    pb1.raw_text(30, 108, "Draft Three")
    pb1.raw_text(770, 108, "Footer Left")
    _dense(pb1)
    pb2 = PageBuilder(number=2)
    pb2.raw_text(30, 108, "Draft Three")
    pb2.line(108, "Second page action happens right here for sure.")
    doc = convert_pdf_xml_document([pb1.xml(), pb2.xml()])
    hf = doc["pageSettings"].get("headersAndFooters", {})
    assert hf.get("page1_header", {}).get("text") == "Draft Three"
    assert hf.get("page1_footer", {}).get("text") == "Footer Left"


def test_a4_page_size_in_json():
    pb = PageBuilder(number=1, width=595, height=842)
    _dense(pb)
    doc = convert_pdf_xml_document([pb.xml(),
                                    PageBuilder(number=2, width=595,
                                                height=842).xml()])
    assert doc["pageSettings"]["pageSize"] == "A4"


def test_dual_dialog_shared_line_split():
    """One physical line holds BOTH dual-dialog columns separated by a
    3-9 space gap — the reconstruction splits it on the widest gap
    left of character2's x (ParseText.php:1449-1496)."""
    pb = PageBuilder(number=1)
    _dense(pb, 12)
    pb.line(280, "JANE" + " " * 20 + "MARK", blank_before=1)
    # single text node: left column, 6-space gap, right column
    line = "I speak on the left." + " " * 6 + "And I on the right."
    pb.raw_text(pb.top, 180, line)
    pb.top += 12
    pb.line(108, "They pause together.", blank_before=1)
    objs = parse_pages_xml([pb.xml(), PageBuilder(number=2).xml()])
    tail = [(o.get_type_json(), o.content) for o in objs[-5:]]
    assert tail == [
        ("Character", "JANE"),
        ("Dialogue", "I speak on the left."),
        ("Character", "MARK"),
        ("Dialogue", "And I on the right."),
        ("Action", "They pause together."),
    ]
