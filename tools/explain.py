"""Per-stage execution report for any queries() entry: run it and
print Ray Data's stage breakdown (wall time, blocks, rows, peak heap
per stage) so slow pipelines show WHERE the time goes instead of just
a total.  This is the measure-don't-guess loop the perf work uses —
e.g. the q1 partial-aggregate fix and the emb-LSH fused verify both
came from reading these breakdowns.

Usage: python tools/explain.py <query> [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

    os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", str(1 << 30))
    os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", str(1 << 30))
    import ray

    ray.init(address="local", num_cpus=int(os.environ.get(
        "RAY_GRAFT_CPUS", "32")), include_dashboard=False,
        logging_level="ERROR")
    try:
        import __ray_entry__ as entry

        fn = entry.queries()[name]
        t0 = time.perf_counter()
        res = fn(sf_dir)
        # consume: a Dataset is lazy — stats exist only after execution
        if hasattr(res, "to_pandas"):
            df = res.to_pandas()
        else:
            df = res
        wall = time.perf_counter() - t0
        print(f"== {name} @ {sf_dir}: {len(df)} rows in {wall:.2f}s ==\n")
        if hasattr(res, "stats"):
            print(res.stats())
        else:
            print("(result is a driver-side DataFrame — the pipeline "
                  "materialized internally; wrap the inner Dataset to "
                  "see stages)")
        return 0
    finally:
        ray.shutdown()


if __name__ == "__main__":
    raise SystemExit(main())
