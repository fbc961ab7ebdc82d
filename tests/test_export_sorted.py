"""Range-partitioned sorted export: global (n_chars, doc_id) order
across files, disjoint partition ranges, permutation-of-input
completeness, and verified-lineage resume (second run rewrites
nothing yet reports the identical manifest)."""

from __future__ import annotations

import json
import os

import pandas as pd
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def _read_back(out_dir: str) -> "list[tuple[int, pd.DataFrame]]":
    parts = []
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not name.startswith("part-"):
            continue
        with open(os.path.join(d, "_LINEAGE.json")) as f:
            pid = json.load(f)["metrics"]["pid"]
        parts.append((pid, pq.read_table(
            os.path.join(d, "data.parquet")).to_pandas()))
    return sorted(parts, key=lambda p: p[0])


@pytest.mark.usefixtures("ray_session")
def test_export_sorted_order_and_resume(tmp_path):
    from ray_script_extract.pipelines.curation import export_sorted

    out = str(tmp_path / "sorted")
    manifest = export_sorted(SF, out)

    parts = _read_back(out)
    assert [p for p, _ in parts] == manifest["pid"].tolist()

    # each file internally sorted; ranges strictly disjoint in order
    prev_max = None
    frames = []
    for pid, df in parts:
        keys = list(zip(df["n_chars"], df["doc_id"]))
        assert keys == sorted(keys), f"partition {pid} not sorted"
        if prev_max is not None:
            assert df["n_chars"].iloc[0] > prev_max, \
                f"partition {pid} overlaps previous range"
        prev_max = df["n_chars"].iloc[-1]
        frames.append(df)

    # concatenation is a permutation of the input (nothing lost/duped)
    got = pd.concat(frames, ignore_index=True)
    src = pq.read_table(f"{SF}/documents.parquet",
                        columns=["doc_id", "lang", "text",
                                 "n_chars"]).to_pandas()
    pd.testing.assert_frame_equal(
        got.sort_values("doc_id").reset_index(drop=True),
        src.sort_values("doc_id").reset_index(drop=True))

    # manifest row counts match the files
    assert manifest["n_rows"].tolist() == [len(df) for _, df in parts]

    # resume: second run skips every verified partition (no rewrite —
    # mtimes unchanged) but reports the identical manifest
    mtimes = {name: os.path.getmtime(os.path.join(out, name, "data.parquet"))
              for name in os.listdir(out) if name.startswith("part-")}
    manifest2 = export_sorted(SF, out)
    pd.testing.assert_frame_equal(manifest, manifest2)
    for name, t in mtimes.items():
        assert os.path.getmtime(os.path.join(out, name,
                                             "data.parquet")) == t


@pytest.mark.usefixtures("ray_session")
def test_export_sorted_tie_skew(tmp_path):
    """90% of docs share one length: equal-rank targets collapse to
    duplicate boundary values (np.unique dedup), the tie mass stays
    whole in ONE partition (tie cohesion is what keeps cross-file
    order total), and fewer-than-requested partitions come out."""
    import numpy as np
    import pyarrow as pa

    n = 200
    lens = np.full(n, 50, np.int64)
    lens[:10] = np.arange(10) + 1        # a small low tail
    lens[-10:] = np.arange(10) + 100     # a small high tail
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(n), pa.int64()),
        "text": pa.array(["x"] * n),
        "lang": pa.array(["en"] * n),
        "n_chars": pa.array(lens, pa.int64()),
    }), tmp_path / "documents.parquet")

    from ray_script_extract.pipelines.curation import export_sorted

    out = str(tmp_path / "sorted")
    manifest = export_sorted(tmp_path.as_posix(), out)
    assert len(manifest) < 8  # duplicate bounds collapsed partitions
    assert manifest["n_rows"].sum() == n
    # the dominant length lands whole in exactly one partition
    host = manifest[(manifest["min_n_chars"] <= 50)
                    & (manifest["max_n_chars"] >= 50)]
    assert len(host) == 1
    assert host["n_rows"].iloc[0] >= 180
    # ranges stay disjoint and ordered despite the skew
    parts = _read_back(out)
    prev_max = None
    for pid, df in parts:
        if prev_max is not None:
            assert df["n_chars"].iloc[0] > prev_max
        prev_max = df["n_chars"].iloc[-1]
