"""Frozen-output regression: every scenario in regression_docs must
reproduce tests/data/pdf_engine_golden.json exactly.

Regenerate intentionally with ``python tests/regression_docs.py``
after reviewing the printed outputs — never to paper over a diff."""

from __future__ import annotations

import json

import pytest

from tests.regression_docs import GOLDEN_PATH, SCENARIOS, compute_outputs

with open(GOLDEN_PATH) as _f:
    GOLDEN = json.load(_f)


@pytest.mark.parametrize("name", sorted(SCENARIOS))
def test_scenario_matches_golden(name):
    from ray_script_extract.engine.parse_text import parse_pages_xml

    got = [[o.get_type_json(), o.content]
           for o in parse_pages_xml(SCENARIOS[name])]
    assert got == GOLDEN[name]


def test_golden_covers_all_scenarios():
    assert set(GOLDEN) == set(SCENARIOS)


def test_revision_colored_pdf_revisions_pinned():
    """The span golden can't see revision metadata, so pin the
    revisions list of the colored real-PDF scenario directly: two key
    pages, weight order blue-then-pink, hex colors from the content
    stream's rg operators (Parser.php:239-486 semantics)."""
    from ray_script_extract.engine.pdfdoc import convert_pdf_xml_document

    doc = convert_pdf_xml_document(SCENARIOS["pdf_revision_colored"])
    assert doc["revisions"] == [
        {"name": "Blue Revision Draft", "color": "#0000ff"},
        {"name": "Pink Revision Draft", "color": "#ff00ff"},
    ]
