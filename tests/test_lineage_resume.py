"""Resume-from-checkpoint: kill after K partitions, restart, assert
exactly-once output with identical bytes."""

from __future__ import annotations

import json
import os
import shutil

import pyarrow.parquet as pq
import pytest


@pytest.mark.usefixtures("ray_session")
def test_resumable_extract_exactly_once(tmp_path):
    from ray_script_extract.stages.lineage import (
        completed_partitions,
        run_resumable_extract,
    )

    out = str(tmp_path / "extract_out")
    summary1 = run_resumable_extract(120, out, docs_per_shard=30)
    assert summary1["partitions_written"] == 4
    assert summary1["partitions_skipped"] == 0
    assert summary1["rows_written"] == 120

    done = completed_partitions(out)
    assert len(done) == 4
    checksums = {k: v["checksum"] for k, v in done.items()}

    # simulate a mid-run crash: remove one finished partition and
    # corrupt another's lineage (invalid size → must be redone)
    parts = sorted(p for p in os.listdir(out) if p.startswith("part-"))
    shutil.rmtree(os.path.join(out, parts[0]))
    bad = os.path.join(out, parts[1], "_LINEAGE.json")
    record = json.load(open(bad))
    record["size_bytes"] = -1
    json.dump(record, open(bad, "w"))

    summary2 = run_resumable_extract(120, out, docs_per_shard=30)
    assert summary2["partitions_skipped"] == 2
    assert summary2["partitions_written"] == 2

    done2 = completed_partitions(out)
    assert len(done2) == 4
    # determinism: re-extracted partitions byte-identical to round 1
    assert {k: v["checksum"] for k, v in done2.items()} == checksums

    # full second resume is a no-op
    summary3 = run_resumable_extract(120, out, docs_per_shard=30)
    assert summary3["partitions_written"] == 0
    assert summary3["partitions_skipped"] == 4

    total_rows = sum(
        pq.read_table(os.path.join(out, p, "data.parquet")).num_rows
        for p in sorted(os.listdir(out)) if p.startswith("part-"))
    assert total_rows == 120
