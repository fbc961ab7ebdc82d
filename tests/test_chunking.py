"""Boundary tests for strided chunking (`chunk_documents`): the
repeat/arange expansion must agree with the generate_series oracle at
the exact window edges (n_tok = size, size+1, size+stride,
size+stride+1) and on empty documents — the sf tables' docs are all
single-chunk, so this is the only multi-chunk coverage."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.mark.usefixtures("ray_session")
def test_chunk_boundaries(tmp_path):
    import duckdb

    from ray_script_extract.pipelines.queries import (
        CHUNK_DOCUMENTS_SQL,
        chunk_documents,
    )

    # token counts straddling every boundary of size=128 / stride=96
    counts = [0, 1, 127, 128, 129, 224, 225, 500]
    docs = pa.table({
        "doc_id": pa.array(range(len(counts)), pa.int64()),
        "text": pa.array(["tok " * n for n in counts]),
        "lang": pa.array(["en"] * len(counts)),
    })
    pq.write_table(docs, str(tmp_path / "documents.parquet"))

    got = chunk_documents(str(tmp_path))
    got = got.to_pandas() if not isinstance(got, pd.DataFrame) else got
    got = got.sort_values(["doc_id", "chunk_id"]).reset_index(drop=True)

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    want = con.execute(CHUNK_DOCUMENTS_SQL).df()
    cast = {c: np.int64 for c in want.columns}
    pd.testing.assert_frame_equal(got.astype(cast), want.astype(cast))

    per_doc = got.groupby("doc_id").size()
    assert per_doc.tolist() == [1, 1, 1, 1, 2, 2, 3, 5]
    # chunk windows tile the doc: first starts at 0, last ends at
    # n_tok, consecutive chunks overlap by exactly size - stride
    d7 = got[got["doc_id"] == 7]
    assert d7["start_tok"].tolist() == [0, 96, 192, 288, 384]
    assert d7["end_tok"].tolist() == [128, 224, 320, 416, 500]
