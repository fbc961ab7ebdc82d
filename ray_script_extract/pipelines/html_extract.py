"""Main-content extraction over HTML-wrapped documents: the corpus
query surface for ``sources/boilerplate.py`` (WSDM'10 density strip).

Oracle construction (exact, not rows-only, despite being a DOM op):
each document's text is wrapped in a DETERMINISTIC page template —
link-dense nav/sidebar/footer, short link-bearing comment stubs, the
text as the single article paragraph — so a correct density extractor
must return exactly the planted text and exactly the template's
boilerplate-block count.  DuckDB then checks the whole operator with
``SELECT doc_id, text, 5 + doc_id % 3`` — any mis-kept nav block,
dropped article, or whitespace mangling breaks the hash.

Scale shape: one streamed ``map_batches`` pass (wrap + parse +
classify per doc — the same per-doc UDF shape as the flagship
extraction), zero shuffles before the budgeted determinism sort.
"""

from __future__ import annotations

from xml.sax.saxutils import escape

import pyarrow as pa

import ray.data

from ..sources.boilerplate import extract_main_content
from .joins import sorted_small

# sidebar grows with doc_id % 3 so the boilerplate count is a
# nontrivial SQL-checkable function, not a constant
_SIDEBAR_ITEMS = ("Related post one", "Another related post",
                  "Yet more reading")


def wrap_in_boilerplate(doc_id: int, text: str) -> str:
    n_side = 1 + doc_id % 3
    sidebar = "".join(
        f'<li><a href="/p{i}">{_SIDEBAR_ITEMS[i]}</a></li>'
        for i in range(n_side))
    return (
        "<html><head><title>Doc</title><style>.x{color:red}</style>"
        "<script>var x = 1;</script></head><body>"
        '<div class="nav"><a href="/">Home</a> <a href="/a">Archive</a>'
        ' <a href="/c">Contact</a></div>'
        f'<div class="sidebar"><ul>{sidebar}</ul></div>'
        f'<div class="content"><p>{escape(text)}</p></div>'
        '<div class="comments"><p>Nice <a href="/r">reply</a></p>'
        '<p>+1 <a href="/r">reply</a></p></div>'
        '<div class="footer"><a href="/tos">Terms</a> - '
        '<a href="/priv">Privacy</a> - <a href="/rss">RSS</a></div>'
        "</body></html>")


def html_main_content(sf_dir: str):
    """(doc_id, main_text, n_boiler) per document — the planted
    article recovered from its boilerplate wrap."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])

    def run(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        mains, boilers, keep_ids = [], [], []
        for did, text in zip(ids, texts):
            main, n_boiler = extract_main_content(
                wrap_in_boilerplate(did, text))
            if main:
                keep_ids.append(did)
                mains.append(main)
                boilers.append(n_boiler)
        return pa.table({
            "doc_id": pa.array(keep_ids, pa.int64()),
            "main_text": pa.array(mains, pa.string()),
            "n_boiler": pa.array(boilers, pa.int64()),
        })

    return sorted_small(ds.map_batches(run, batch_format="pyarrow",
                                       zero_copy_batch=True), "doc_id")


# boilerplate blocks in the wrap: nav div + (1 + doc_id%3) sidebar
# li + 2 comment stubs + footer div = 5 + doc_id % 3; the article
# paragraph survives whenever it has >= GOOD_WORDS (8) words
HTML_MAIN_CONTENT_SQL = """
SELECT doc_id,
       regexp_replace(text, '(^\\s+)|(\\s+$)', '', 'g') AS main_text,
       CAST(5 + doc_id % 3 AS BIGINT) AS n_boiler
FROM documents
WHERE len(regexp_extract_all(text, '\\S+')) >= 8
ORDER BY doc_id
"""
