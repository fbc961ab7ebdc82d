"""End-to-end test for the composed curation chain
(`prep_training_mix`): quality rejects and dedup losers must vanish
from the packed stream (shifting every later doc's window), the
budget prefix must cut per language, and the final window layout must
match the chained SQL oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.mark.usefixtures("ray_session")
def test_training_mix_chain(tmp_path):
    import duckdb

    from ray_script_extract.pipelines.curation import (
        PREP_TRAINING_MIX_SQL,
        prep_training_mix,
    )

    # quality-passing filler: >=5 tokens, low stopword/long-token rates
    body = "alpha beta gamma delta epsilon zeta " * 40   # 240 tokens
    texts = {
        1: body + "one",
        2: "the of and to in is it",          # stopword-heavy -> REJECTED
        3: body + "one",                       # dup of 1, same length —
                                               # tie -> doc 1 wins
        4: body + "one extended somewhat",     # near doc 1? no: distinct fp
        5: "tiny doc",                         # < 5 tokens -> REJECTED
        6: body * 12,                          # 2880 tokens: big budget eater
        7: body + "seven",
        8: body + "eight",
    }
    docs = pa.table({
        "doc_id": pa.array(sorted(texts), pa.int64()),
        "text": pa.array([texts[d] for d in sorted(texts)]),
        "lang": pa.array(["en"] * len(texts)),
        "n_chars": pa.array([len(texts[d]) for d in sorted(texts)],
                            pa.int64()),
    })
    pq.write_table(docs, str(tmp_path / "documents.parquet"))

    got = prep_training_mix(str(tmp_path)).to_pandas() \
        .reset_index(drop=True)

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    want = con.execute(PREP_TRAINING_MIX_SQL).df()
    cast = {c: np.int64 for c in
            ("doc_id", "n_tokens", "bin_first", "bin_last")}
    pd.testing.assert_frame_equal(
        got[want.columns.tolist()].astype(cast), want.astype(cast))

    ids = set(got["doc_id"])
    assert 2 not in ids and 5 not in ids   # quality rejects
    assert 3 not in ids and 1 in ids       # dedup: equal length, min id wins
    # the budget (2000 tokens) cannot hold every survivor: doc 6 alone
    # is 2880 tokens, so at most a handful of docs make the mix
    assert int(got["n_tokens"].sum()) >= 2000 or len(ids) == 5
    # packed stream is contiguous: consecutive docs' windows chain
    g = got.sort_values("doc_id")
    starts = np.concatenate(([0], np.cumsum(g["n_tokens"].to_numpy())[:-1]))
    assert (g["bin_first"].to_numpy() == starts // 512).all()
