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
