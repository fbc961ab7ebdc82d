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
