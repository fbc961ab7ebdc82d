"""curation_funnel: a planted corpus where every stage transition
fires (short doc fails Gopher, an exact duplicate is deduped, a
shingle-sharing doc is decontaminated, one survivor is above the
DSIR par line and one below), checked against BOTH an independent
pure-Python naive reference and the composed DuckDB oracle."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ray_script_extract.pipelines.text_analysis import STOPWORDS


def _tokens(t):
    return t.lower().split()


def _gopher(t):
    ws = _tokens(t)
    n, sl = len(ws), sum(map(len, ws))
    alpha = sum(any("a" <= c <= "z" for c in w) for w in ws)
    stop = sum(w in STOPWORDS for w in ws)
    return (50 <= n <= 100_000 and n > 0
            and 3 * n <= sl <= 10 * n
            and 5 * alpha >= 4 * n and stop >= 2)


def _shingles(t):
    ws = _tokens(t)
    if len(ws) >= 3:
        return {" ".join(ws[i:i + 3]) for i in range(len(ws) - 2)}
    if len(ws) >= 1:
        return {" ".join(ws[:2])}
    return set()


def _naive_funnel(rows):
    """Pure-Python reference mirroring the documented stage semantics."""
    target = [t for i, t in rows if i % 20 == 0]
    train = [(i, t) for i, t in rows if i % 20 != 0]
    bench = set().union(*(_shingles(t) for t in target)) if target \
        else set()

    # DSIR vocab over the WHOLE corpus
    tc, rc = {}, {}
    for i, t in rows:
        side = tc if i % 20 == 0 else rc
        for w in _tokens(t):
            side[w] = side.get(w, 0) + 1
    vocab = set(tc) | set(rc)
    T, R, V = sum(tc.values()), sum(rc.values()), len(vocab)

    def ppm(w):
        return (1_000_000 * (tc.get(w, 0) + 1) * (R + V)
                // ((rc.get(w, 0) + 1) * (T + V)))

    s3 = [(i, t) for i, t in train if _gopher(t)]
    best = {}
    for i, t in s3:
        if t not in best or i < best[t]:
            best[t] = i
    s4 = [(i, t) for i, t in s3 if best[t] == i]
    s5 = [(i, t) for i, t in s4 if not (_shingles(t) & bench)]
    s6 = [(i, t) for i, t in s5
          if sum(ppm(w) for w in _tokens(t))
          >= 1_000_000 * len(_tokens(t))]
    return [len(rows), len(train), len(s3), len(s4), len(s5), len(s6)]


@pytest.mark.usefixtures("ray_session")
def test_funnel_every_stage_fires(tmp_path):
    import duckdb

    from ray_script_extract.pipelines.curation import (
        CURATION_FUNNEL_SQL,
        curation_funnel,
    )

    pad = ["abcd"] * 45
    passing = " ".join(["the", "of"] + pad + ["p1", "p2", "p3"])
    rows = [
        (0, "the of w1 w2 w3 w1 w2 w3 w1 w2"),          # target slice
        (1, "the of abc"),                                # fails Gopher
        (2, passing),                                     # dup winner
        (22, passing),                                    # dup loser
        (3, " ".join(["the", "of", "w1", "w2", "w3"] + pad)),
                                                          # contaminated
        (4, " ".join(["w1", "qqqqq"] * 24 + ["the", "of"])),
                                                          # target-heavy, no
                                                          # shared shingle
                                                          # (stops at the END
                                                          # so "the of w1"
                                                          # never forms)
        (5, " ".join(["the", "of"] + ["zz%d" % i for i in range(48)])),
                                                          # below par
    ]
    docs = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows]),
        "lang": pa.array(["en"] * len(rows)),
    })
    pq.write_table(docs, str(tmp_path / "documents.parquet"))

    got = curation_funnel(str(tmp_path))
    naive = _naive_funnel(rows)

    assert got["docs_remaining"].tolist() == naive
    # every transition fires: raw 7 → train 6 → gopher 5 → dedup 4 →
    # decontam 3, and the par line separates the survivors
    assert naive[:5] == [7, 6, 5, 4, 3]
    assert 0 < naive[5] < naive[4]

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    want = con.execute(CURATION_FUNNEL_SQL).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_funnel_registry():
    from ray_script_extract.pipelines.queries import ORACLE_SQL, QUERIES

    assert "curation_funnel" in QUERIES
    assert "curation_funnel" in ORACLE_SQL


@pytest.mark.usefixtures("ray_session")
def test_funnel_refuses_over_budget(tmp_path, monkeypatch):
    """Above the benchmark broadcast budget the one-pass plan refuses
    and points at the constituent partitioned twins."""
    from ray_script_extract.pipelines import decontam
    from ray_script_extract.pipelines.curation import curation_funnel

    docs = pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["a b c", "a b c d"]),
        "lang": pa.array(["en", "en"]),
    })
    pq.write_table(docs, str(tmp_path / "documents.parquet"))

    monkeypatch.setattr(decontam, "_BENCH_HASH_CAP", 0)
    with pytest.raises(ValueError, match="partitioned"):
        curation_funnel(str(tmp_path))
