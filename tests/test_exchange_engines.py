"""The exchange primitive's two engines must agree bit-for-bit.

``exchange_map_partitions`` (pipelines/joins.py) is the backbone under
every keyed op: "task" (default) is the raw-task two-stage hash
shuffle that avoids Ray Data's groupby sort barrier; "sort" is the
legacy ``groupby(part).map_groups`` path kept as the A/B twin.  These
tests run representative shapes under BOTH engines and require
identical results — the guarantee that the fast path is a pure engine
swap, not a semantics change.
"""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


def _run_both(fn):
    """Call fn() under each exchange engine; return (task, sort)."""
    results = {}
    for engine in ("task", "sort"):
        os.environ["RAY_GRAFT_EXCHANGE"] = engine
        try:
            results[engine] = fn()
        finally:
            os.environ.pop("RAY_GRAFT_EXCHANGE", None)
    return results["task"], results["sort"]


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _assert_same(a, b):
    a = a.to_pandas() if hasattr(a, "to_pandas") else a
    b = b.to_pandas() if hasattr(b, "to_pandas") else b
    pd.testing.assert_frame_equal(_norm(a), _norm(b))


@pytest.mark.usefixtures("ray_session")
def test_engines_agree_join_and_groupby():
    """q3 (shuffle join + pre_left/post fusion) and a high-cardinality
    partitioned groupby agree across engines."""
    from ray_script_extract.pipelines.queries import QUERIES

    task, sort = _run_both(lambda: QUERIES["q3_top_orders"](SF).to_pandas())
    _assert_same(task, sort)


@pytest.mark.usefixtures("ray_session")
def test_engines_agree_left_join_nulls():
    """LEFT join with a real null surface (unmatched customers) —
    pads, Int64 nullable promotion, and empty partitions all ride the
    exchange."""
    from ray_script_extract.pipelines.queries import QUERIES

    task, sort = _run_both(
        lambda: QUERIES["customer_urgent_counts"](SF).to_pandas())
    _assert_same(task, sort)


@pytest.mark.usefixtures("ray_session")
def test_engines_agree_keyed_window():
    """hash_partitioned_map shape (sessionize: per-key stateful pandas
    reduce) agrees across engines."""
    from ray_script_extract.pipelines.queries import QUERIES

    task, sort = _run_both(
        lambda: QUERIES["events_sessionize"](SF).to_pandas())
    _assert_same(task, sort)


@pytest.mark.usefixtures("ray_session")
def test_engines_agree_salted_join():
    """Hot-key salting extends the partition-id space past
    num_partitions — the task engine must size its reduce width to
    include every salted partition."""
    import ray.data

    from ray_script_extract.pipelines.joins import hash_join_via_groupby

    n = 20_000
    keys = np.where(np.arange(n) % 3 == 0, 7, np.arange(n) % 500)

    def build():
        left = ray.data.from_arrow(pa.table({
            "k": pa.array(keys, pa.int64()),
            "v": pa.array(np.arange(n), pa.int64()),
        })).repartition(8)
        right = ray.data.from_arrow(pa.table({
            "rk": pa.array(np.arange(500), pa.int64()),
            "w": pa.array(np.arange(500) * 10, pa.int64()),
        })).repartition(4)
        out = hash_join_via_groupby(
            left, right, "k", "rk",
            left_schema=pa.schema([("k", pa.int64()), ("v", pa.int64())]),
            right_schema=pa.schema([("rk", pa.int64()), ("w", pa.int64())]),
            hot_keys=np.array([7], np.int64), num_salts=4)
        return out.to_pandas()

    task, sort = _run_both(build)
    assert len(task) == n
    _assert_same(task, sort)


@pytest.mark.usefixtures("ray_session")
def test_task_engine_skips_empty_partitions_and_blocks():
    """An exchange whose upstream contains untagged EMPTY blocks (an
    inner-join partition that matched nothing, passed through
    map_batches without the UDF running) must not crash, and empty
    partitions must schedule no merge task (map_groups contract)."""
    import ray.data

    from ray_script_extract.pipelines.joins import (
        groupby_agg_partitioned,
        hash_join_via_groupby,
    )

    # disjoint key ranges -> most partitions of the inner join are empty
    left = ray.data.from_arrow(pa.table({
        "k": pa.array([1, 2, 3], pa.int64()),
        "v": pa.array([10, 20, 30], pa.int64()),
    })).repartition(3)
    right = ray.data.from_arrow(pa.table({
        "rk": pa.array([2, 999], pa.int64()),
        "w": pa.array([5, 6], pa.int64()),
    })).repartition(2)
    j = hash_join_via_groupby(
        left, right, "k", "rk",
        left_schema=pa.schema([("k", pa.int64()), ("v", pa.int64())]),
        right_schema=pa.schema([("rk", pa.int64()), ("w", pa.int64())]))
    out = groupby_agg_partitioned(j, ["k"], {"v": "sum"}).to_pandas()
    assert out[["k", "v"]].to_dict("records") == [{"k": 2, "v": 20}]
import pyarrow as pa
import pytest

@pytest.mark.usefixtures("ray_session")
def test_sorted_small_empty_keeps_declared_schema():
    import ray
    from ray_script_extract.pipelines.joins import (
        exchange_map_partitions, sorted_small)

    sch = pa.schema([("k", pa.int64()), ("v", pa.int64())])
    # an all-empty exchange yields a zero-column placeholder dataset
    empty = ray.data.from_arrow(pa.table({"k": pa.array([], pa.int64()),
                                          "v": pa.array([], pa.int64())}))
    ex = exchange_map_partitions(
        empty.map_batches(lambda t: t.append_column(
            "part", pa.array([0] * len(t), pa.int64())),
            batch_format="pyarrow"),
        "part", 4, lambda t: t)
    out = sorted_small(ex, ["k"], schema=sch)
    # the declared columns survive at the Dataset level (Ray 2.49's
    # to_pandas drops columns on any 0-row dataset, so assert on the
    # schema and on select_columns — the op the ADVICE KeyError hit)
    assert out.schema().names == ["k", "v"]
    assert out.select_columns(["k", "v"]).count() == 0
