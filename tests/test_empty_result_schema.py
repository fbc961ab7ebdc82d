"""Empty results must keep their declared columns.

Ray 2.49 loses an all-empty Dataset's schema at consumption
(``iter_batches`` yields nothing for zero-row blocks), so a
threshold query that keeps nothing at some scale factor would
schema-mismatch its oracle despite agreeing on zero rows — found
live when q11's fraction-of-global HAVING went empty at sf0.1.
Two guards: the registry-boundary ``_empty_safe`` wrapper and
``sorted_small``'s schema inference."""

from __future__ import annotations

import pyarrow as pa

import ray
import ray.data

from ray_script_extract.pipelines.joins import sorted_small
from ray_script_extract.pipelines.queries import _empty_safe


def _empty_ds(ray_session):
    src = ray.data.from_arrow(pa.table({
        "p_partkey": pa.array([1, 2, 3], pa.int64()),
        "value_cents": pa.array([10, 20, 30], pa.int64())}))
    return src.map_batches(
        lambda t: t.filter(pa.array([False] * len(t))),
        batch_format="pyarrow")


def test_empty_safe_returns_schema_carrying_table(ray_session):
    fn = _empty_safe(lambda sf: _empty_ds(ray_session))
    res = fn("unused")
    df = res.to_pandas()
    assert list(df.columns) == ["p_partkey", "value_cents"]
    assert len(df) == 0
    assert str(df.dtypes["p_partkey"]) == "int64"


def test_empty_safe_passthrough_nonempty(ray_session):
    t = pa.table({"a": pa.array([2, 1], pa.int64())})
    fn = _empty_safe(lambda sf: ray.data.from_arrow(t))
    res = fn("unused")
    assert sorted(res.to_pandas()["a"].tolist()) == [1, 2]


def test_sorted_small_all_filtered_keeps_columns(ray_session):
    out = sorted_small(_empty_ds(ray_session),
                       ["value_cents", "p_partkey"],
                       descending=[True, False])
    tabs = ray.get(out.to_arrow_refs())
    cols = set()
    for t in tabs:
        cols.update(t.column_names)
    assert cols == {"p_partkey", "value_cents"}
