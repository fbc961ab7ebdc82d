"""DOM-density boilerplate strip (sources/boilerplate.py, WSDM'10
shallow features + jusText short-block promotion) — crafted-page
behavior plus the planted-article recovery the SQL oracle relies on."""

from __future__ import annotations

from ray_script_extract.pipelines.html_extract import (
    HTML_MAIN_CONTENT_SQL, wrap_in_boilerplate)
from ray_script_extract.sources.boilerplate import (classify_blocks,
                                                    extract_main_content,
                                                    text_blocks)
from ray_script_extract.sources.htmldom import parse_html

ARTICLE = ("The committee published its full findings on Tuesday after "
           "a nine month review of the program.")
SHORT_FOLLOWUP = "Few objected to that."  # 4 words — promotion case

PAGE = f"""
<html><head><title>t</title><style>p {{x}}</style></head><body>
<div id="nav"><a href="/">Home</a> <a href="/b">Blog</a> <a href="/c">About</a></div>
<div id="main">
  <h1>Committee findings released</h1>
  <p>{ARTICLE}</p>
  <p>{SHORT_FOLLOWUP}</p>
</div>
<ul class="related">
  <li><a href="/1">Ten ways to read reports</a></li>
  <li><a href="/2">More committee news</a></li>
</ul>
<div class="footer"><a href="/tos">Terms</a> - <a href="/p">Privacy</a></div>
</body></html>
"""


def test_blocks_and_classification():
    blocks = text_blocks(parse_html(PAGE))
    texts = [t for t, _w, _ld in blocks]
    assert texts[0].startswith("Home")          # nav
    assert ARTICLE in texts
    keep = classify_blocks(blocks)
    kept = [t for (t, _w, _l), k in zip(blocks, keep) if k]
    # nav / related / footer are link-dense -> dropped; the headline
    # (3 words, ld 0) is promoted by its good article neighbour; the
    # short follow-up is promoted by the good article before it
    assert kept == ["Committee findings released", ARTICLE,
                    SHORT_FOLLOWUP]


def test_promotion_needs_a_good_neighbour():
    html = ("<body><p>tiny one</p>"
            "<p><a href='/x'>all link text here for sure</a></p>"
            "<p>tiny two</p></body>")
    main, n_boiler = extract_main_content(html)
    assert main == ""
    assert n_boiler == 3


def test_link_density_boundary():
    # exactly 1/3 link chars is NOT boilerplate (rule is strict >):
    # non-link 'aaa bbb ccc ddd ' = 16 chars + 8 link chars = 24
    inner = "x" * 8
    html = (f"<body><p>aaa bbb ccc ddd <a href='/'>{inner}</a></p>"
            "</body>")
    blocks = text_blocks(parse_html(html))
    ((_t, words, ld),) = blocks
    assert abs(ld - 8 / 24) < 1e-9 and words == 5
    # 5 words is under GOOD_WORDS and no neighbour -> still dropped,
    # but via the word rule, not link density
    assert classify_blocks(blocks) == [False]


def test_nested_blocks_segment_on_leaves():
    html = ("<body><div><div><p>one paragraph of eight words exactly "
            "here now</p><p>and a second good paragraph with plenty "
            "of words</p></div></div></body>")
    main, n_boiler = extract_main_content(html)
    assert n_boiler == 0
    assert main.count("\n\n") == 1


def test_planted_article_recovered_exactly():
    text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    for doc_id in (0, 1, 2, 17):
        main, n_boiler = extract_main_content(
            wrap_in_boilerplate(doc_id, text))
        assert main == text
        assert n_boiler == 5 + doc_id % 3


def test_escaped_entities_round_trip():
    text = "profit & loss <above> plan for the whole nine yards today"
    main, _ = extract_main_content(wrap_in_boilerplate(3, text))
    assert main == text


def test_short_doc_yields_empty_main():
    main, _ = extract_main_content(wrap_in_boilerplate(1, "too few"))
    assert main == ""


def test_oracle_matches_on_testdata():
    import duckdb

    from ray_script_extract.pipelines.html_extract import \
        html_main_content

    sf = "/root/testdata/sf0.001"
    got = html_main_content(sf).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    want = con.execute(HTML_MAIN_CONTENT_SQL).df()
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["main_text"].tolist() == want["main_text"].tolist()
    assert got["n_boiler"].tolist() == want["n_boiler"].tolist()
