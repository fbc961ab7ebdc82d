"""`winnow_plagiarism_pairs` (MOSS-style overlap pairs on winnow
fingerprints): crafted shared-passage corpus vs the exact DuckDB
oracle, boilerplate-cap suppression (incl. the poison-row prune when
one batch alone proves a fingerprint over-cap), a single-process
brute-force twin on the sf corpus, and empty-result schema."""

from __future__ import annotations

from collections import defaultdict

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def _write_docs(tmp_path, texts):
    docs = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * len(texts)),
    })
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def _brute_pairs(texts_by_id, cap, min_shared):
    """Single-process reference: winnow per doc, bucket by fp, count
    shared eligible fingerprints per pair."""
    from ray_script_extract.pipelines.text_analysis import _winnow_doc

    buckets = defaultdict(set)
    for did, text in texts_by_id.items():
        for fp in np.unique(_winnow_doc(text)[:, 1]).tolist():
            buckets[fp].add(did)
    counts: dict = defaultdict(int)
    for members in buckets.values():
        if 2 <= len(members) <= cap:
            ms = sorted(members)
            for i in range(len(ms)):
                for j in range(i + 1, len(ms)):
                    counts[(ms[i], ms[j])] += 1
    rows = [(a, b, n) for (a, b), n in counts.items() if n >= min_shared]
    return pd.DataFrame(sorted(rows),
                        columns=["doc_a", "doc_b", "n_shared"]) \
        .astype(np.int64)


@pytest.mark.usefixtures("ray_session")
def test_shared_passage_pairs_and_oracle(tmp_path):
    import duckdb

    from ray_script_extract.pipelines.text_analysis import (
        WINNOW_PAIRS_SQL,
        winnow_plagiarism_pairs,
    )

    passage = ("the quick brown fox jumps over the lazy dog while "
               "the band plays a slow waltz in the rain")
    texts = [
        "completely unrelated first document about gardening tools",
        f"INTRO ALPHA {passage} OUTRO ALPHA",          # 1: shares passage
        f"INTRO BETA {passage} CODA BETA",             # 2: shares passage
        "another unrelated document mentioning spacecraft telemetry",
        "short",                                       # 4: below k+w-1
    ]
    sf = _write_docs(tmp_path, texts)

    got = winnow_plagiarism_pairs(sf).to_pandas().reset_index(drop=True)

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    want = con.execute(WINNOW_PAIRS_SQL).df()
    cast = {c: np.int64 for c in want.columns}
    pd.testing.assert_frame_equal(got.astype(cast), want.astype(cast))

    # the long shared passage guarantees shared fingerprints (every
    # match >= k+w-1 chars shares one — SIGMOD'03 property)
    pairs = set(zip(got["doc_a"], got["doc_b"]))
    assert (1, 2) in pairs


@pytest.mark.usefixtures("ray_session")
def test_boilerplate_cap_suppresses_pairs(tmp_path):
    import duckdb

    from ray_script_extract.pipelines.text_analysis import (
        _PAIR_FP_CAP,
        WINNOW_PAIRS_SQL,
        winnow_plagiarism_pairs,
    )

    # one boilerplate footer planted in cap+3 docs (single batch →
    # the poison-row prune fires), otherwise pairwise-unique bodies
    footer = ("copyright two thousand twenty four all rights "
              "reserved worldwide in perpetuity forever and ever")
    texts = [f"unique body {i} zz{i}qq{i}ww{i}ee rr{i}tt {footer}"
             for i in range(_PAIR_FP_CAP + 3)]
    sf = _write_docs(tmp_path, texts)

    got = winnow_plagiarism_pairs(sf).to_pandas().reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    want = con.execute(WINNOW_PAIRS_SQL).df()
    assert len(got) == len(want)
    if len(want):
        cast = {c: np.int64 for c in want.columns}
        pd.testing.assert_frame_equal(got.astype(cast),
                                      want.astype(cast))
    # footer fingerprints alone may NOT connect all-pairs: the
    # complete graph over cap+3 docs would be (cap+3 choose 2) pairs
    n = _PAIR_FP_CAP + 3
    assert len(got) < n * (n - 1) // 2


@pytest.mark.usefixtures("ray_session")
def test_matches_brute_force_on_sf_corpus():
    from ray_script_extract.pipelines.text_analysis import (
        _PAIR_FP_CAP,
        _PAIR_MIN_SHARED,
        winnow_plagiarism_pairs,
    )

    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    texts_by_id = dict(zip(t.column("doc_id").to_pylist(),
                           t.column("text").to_pylist()))
    want = _brute_pairs(texts_by_id, _PAIR_FP_CAP, _PAIR_MIN_SHARED)
    got = winnow_plagiarism_pairs(SF).to_pandas().reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype(np.int64), want, check_dtype=True)
    assert len(got) > 0  # the synthetic corpus does share passages


@pytest.mark.usefixtures("ray_session")
def test_empty_result_keeps_schema(tmp_path):
    # schema on empty results is the REGISTRY contract (_empty_safe):
    # Ray 2.49 loses an all-empty Dataset's schema at consumption, so
    # go through the registered entry like the driver does
    from ray_script_extract.pipelines.queries import QUERIES

    sf = _write_docs(tmp_path, ["first lonely document text here",
                                "second entirely different words now"])
    got = QUERIES["winnow_plagiarism_pairs"](sf).to_pandas()
    assert list(got.columns) == ["doc_a", "doc_b", "n_shared"]
    assert len(got) == 0
