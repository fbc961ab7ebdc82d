"""Join strategies.

* ``broadcast`` — small side collected once and shipped via ray.put
  (queries.py q5/top_brands use this inline).
* ``Dataset.join`` — Ray Data's native hash join (aggregator actor
  pool); kept in ``q3_top_orders_native`` — on this sandbox the actor
  pool costs ~15 s of cold spawn per run, so the default q3 uses:
* ``hash_join_via_groupby`` — the classic partitioned shuffle join in
  task-only primitives: tag both sides, union, hash-partition on the
  key (one groupby shuffle on a small int partition id), then ONE
  vectorized merge per partition.  Same all-to-all movement a cluster
  join performs, none of the actor-pool fixed cost.
"""

from __future__ import annotations

from typing import List

import numpy as np
import pandas as pd

import ray.data


def groupby_agg_partitioned(ds: "ray.data.Dataset", keys: List[str],
                            agg: dict, num_partitions: int = 32
                            ) -> "ray.data.Dataset":
    """High-cardinality groupby: Ray 2.49's native
    ``groupby().aggregate()`` degrades badly past ~10^5 groups (98 s
    for 600 k rows / 590 k groups measured here), so for high-group
    shapes we hash-partition on the key ONCE (the same single shuffle)
    and reduce each partition with a vectorized pandas groupby.

    ``agg``: {column: "sum"|"min"|"max"|"count"} — result columns keep
    their input names."""

    def add_part(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        h = np.zeros(len(df), dtype=np.uint64)
        for k in keys:
            col = df[k]
            if col.dtype == object:
                vals = pd.util.hash_array(col.to_numpy(dtype=object))
            else:
                vals = col.to_numpy().astype(np.uint64, copy=False)
            h = h * np.uint64(1000003) + vals
        df["__gp"] = (h % np.uint64(num_partitions)).astype(np.int64)
        return df

    def reduce(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(keys, as_index=False, sort=False)
        return g.agg(agg)

    return (ds.map_batches(add_part, batch_format="pandas")
              .groupby("__gp")
              .map_groups(reduce, batch_format="pandas"))


def hash_join_via_groupby(left: "ray.data.Dataset", right: "ray.data.Dataset",
                          left_on: str, right_on: str,
                          num_partitions: int = 32,
                          how: str = "inner") -> "ray.data.Dataset":
    """Equi-join on integer keys.  Column sets must be disjoint apart
    from the key columns; the right key column is dropped after the
    merge (keeping the left name), matching SQL equi-join output."""

    def tag(side: str, key: str):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            df["__part"] = (df[key].to_numpy(dtype=np.int64)
                            % num_partitions).astype(np.int64)
            df["__side"] = side
            return df
        return fn

    lt = left.map_batches(tag("l", left_on), batch_format="pandas")
    rt = right.map_batches(tag("r", right_on), batch_format="pandas")
    unioned = lt.union(rt)

    import pyarrow as pa

    left_schema, right_schema = left.schema(), right.schema()
    left_cols: List[str] = list(left_schema.names)
    right_cols: List[str] = list(right_schema.names)
    # the union null-fills the other side's columns, floating int
    # dtypes; restore integer columns after the merge
    int_cols = {name for schema in (left_schema, right_schema)
                for name, typ in zip(schema.names, schema.types)
                if pa.types.is_integer(typ)}

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        lrows = df[df["__side"] == "l"]
        rrows = df[df["__side"] == "r"]
        out_cols = left_cols + [c for c in right_cols if c != right_on]
        merged = lrows[left_cols].merge(
            rrows[right_cols], left_on=left_on, right_on=right_on, how=how)
        merged = merged[out_cols]
        for c in merged.columns:
            if c in int_cols:
                merged[c] = merged[c].astype("int64")
        return merged

    return unioned.groupby("__part").map_groups(merge, batch_format="pandas")
