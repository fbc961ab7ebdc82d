"""Hard-crash resume: SIGKILL the driver mid-extract, restart, assert
exactly-once output with intact lineage."""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import time

import pyarrow.parquet as pq

_CHILD = r"""
import sys
sys.path.insert(0, {repo!r})
import ray
ray.init(address="local", num_cpus=4, include_dashboard=False,
         logging_level="ERROR")
from ray_script_extract.stages.lineage import run_resumable_extract
print(run_resumable_extract({ndocs}, {out!r}, docs_per_shard=20))
ray.shutdown()
"""


def test_sigkill_mid_run_then_resume(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = str(tmp_path / "kill_out")
    code = _CHILD.format(repo=repo, ndocs=200, out=out)

    # start, let it write some partitions, then SIGKILL the whole tree
    proc = subprocess.Popen([sys.executable, "-c", code],
                            stdout=subprocess.DEVNULL,
                            stderr=subprocess.DEVNULL,
                            start_new_session=True)
    deadline = time.time() + 120
    while time.time() < deadline:
        done = [p for p in (os.listdir(out) if os.path.isdir(out) else [])
                if p.startswith("part-")]
        if len(done) >= 2:
            break
        time.sleep(0.5)
    os.killpg(proc.pid, signal.SIGKILL)
    proc.wait()

    partial = [p for p in os.listdir(out) if p.startswith("part-")]
    assert partial, "child never wrote a partition before the kill"

    # restart in a fresh process — must skip finished partitions and
    # complete the rest exactly once
    result = subprocess.run([sys.executable, "-c", code],
                            capture_output=True, text=True, timeout=300)
    assert result.returncode == 0, result.stderr[-2000:]
    summary = result.stdout.strip().splitlines()[-1]
    assert "'partitions_total': 10" in summary

    from ray_script_extract.stages.lineage import completed_partitions

    done = completed_partitions(out)
    assert len(done) == 10
    total_rows = sum(
        pq.read_table(os.path.join(out, p, "data.parquet")).num_rows
        for p in sorted(os.listdir(out)) if p.startswith("part-"))
    assert total_rows == 200
    # every lineage record checksums its data file
    for rec in done.values():
        assert rec["row_count"] == 20
        assert rec["metrics"]["rows"] == 20
