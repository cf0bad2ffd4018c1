#!/usr/bin/env python
"""Scale-replicate the driver testdata for engine scaling sweeps.

The driver generates sf0.001/0.01/0.1; the scaling claims in SCALING.md
and the operator docstrings ("near-linear at 100 TB") deserve a
measured slope, which needs a larger SF. The driver's generator is not
in this repo, so this script builds sfN by replicating sf0.1 K times
with deterministic key remapping — workload-preserving, not
value-identical to what the driver's generator would emit at sfN:

- ``region``/``nation`` stay fixed (TPC-H convention: dimension
  cardinality doesn't scale), so star-join fan-in is preserved.
- Every scaling table shifts its keys by ``replica * OFFSET`` with FK
  consistency (lineitem→orders/part/supplier, orders→customer,
  events.user_id→customer), so join selectivities and per-key group
  sizes are EXACTLY those of sf0.1 — a query's work grows 10× because
  the data does, not because the data got weirder. int32 key columns
  are overflow-checked (K ≤ 21 for a 100M offset) and fail loudly.
- ``events.ts`` shifts by one year per replica, so time-windowed
  queries see K-times-more windows with sf0.1-sized groups per window
  (matching the per-key invariant above), not K-times-larger groups.
- ``documents.text`` gets a per-replica token bijection (every token
  prefixed with ``r{replica}·``): within-replica similarity structure
  (shingle-set sizes, Jaccard values, near-dup pairs) is preserved
  bijectively, while cross-replica Jaccard is 0 — so LSH candidate
  counts scale linearly, as a real 10× corpus's would, instead of
  quadratically as naive copy-paste duplicates would.
- ``embeddings`` replicas shift ``vec_id``; vectors are perturbed by a
  deterministic per-replica rotation of coordinates (cosine structure
  within a replica preserved; cross-replica top-k collisions avoided).

Usage: python scripts/make_scaled_testdata.py /tmp/sf1 10
"""

from __future__ import annotations

import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
OFFSET = 100_000_000


def _shift(tbl: pa.Table, cols: list[str], r: int) -> pa.Table:
    for c in cols:
        idx = tbl.schema.get_field_index(c)
        field_t = tbl.schema.field(c).type
        shifted = pc.add(tbl.column(c), pa.scalar(r * OFFSET, pa.int64()))
        # int32 key columns overflow at replica*OFFSET ≈ 2^31 (K > 21):
        # fail loudly instead of wrapping into duplicate/negative keys
        if pa.types.is_integer(field_t) and field_t.bit_width <= 32:
            hi = pc.max(shifted).as_py()
            if hi is not None and hi > 2 ** (field_t.bit_width - 1) - 1:
                raise ValueError(
                    f"{c} is {field_t}: replica {r} shift overflows "
                    f"(max shifted value {hi}); reduce K or widen the column"
                )
        tbl = tbl.set_column(idx, c, shifted.cast(field_t))
    return tbl


def _shift_events_ts(tbl: pa.Table, r: int) -> pa.Table:
    """Shift events.ts by one year per replica so time-windowed queries
    see K-times-MORE windows with sf0.1-sized groups per window (the
    workload-preserving shape), not K-times-larger groups in the same
    windows."""
    idx = tbl.schema.get_field_index("ts")
    ts = tbl.column("ts")
    unit = ts.type.unit
    per_unit = {"s": 1, "ms": 10**3, "us": 10**6, "ns": 10**9}[unit]
    shifted = pc.add(
        ts, pa.scalar(r * 365 * 86_400 * per_unit, pa.duration(unit))
    )
    return tbl.set_column(idx, "ts", shifted.cast(ts.type))


def _salt_documents(tbl: pa.Table, r: int) -> pa.Table:
    texts = tbl.column("text").to_pylist()
    salted = [
        " ".join(f"r{r}·{t}" for t in (s or "").split()) for s in texts
    ]
    idx = tbl.schema.get_field_index("text")
    return tbl.set_column(idx, "text", pa.array(salted, pa.string()))


def _rotate_embeddings(tbl: pa.Table, r: int) -> pa.Table:
    vecs = np.asarray(tbl.column("embedding").to_pylist(), dtype=np.float32)
    rolled = np.roll(vecs, r, axis=1)
    idx = tbl.schema.get_field_index("embedding")
    return tbl.set_column(
        idx, "embedding", pa.array(rolled.tolist(), pa.list_(pa.float32()))
    )


def main(out_dir: str, k: int) -> None:
    import os

    os.makedirs(out_dir, exist_ok=True)
    plans: dict[str, list[str]] = {
        "region": [],
        "nation": [],
        "customer": ["c_custkey"],
        "supplier": ["s_suppkey"],
        "part": ["p_partkey"],
        "orders": ["o_orderkey", "o_custkey"],
        "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
        "events": ["event_id", "user_id"],
        "documents": ["doc_id"],
        "embeddings": ["vec_id"],
    }
    for name, keys in plans.items():
        src = pq.read_table(f"{SRC}/{name}.parquet")
        if not keys:  # fixed dims: one copy
            pq.write_table(src, f"{out_dir}/{name}.parquet")
            continue
        replicas = []
        for r in range(k):
            t = _shift(src, keys, r) if r else src
            if name == "events" and r:
                t = _shift_events_ts(t, r)
            if name == "documents" and r:
                t = _salt_documents(t, r)
            if name == "embeddings" and r:
                t = _rotate_embeddings(t, r)
            replicas.append(t)
        out = pa.concat_tables(replicas)
        # ~32 row groups so a cold Spark scan plans parallel splits,
        # like real multi-file cluster input
        pq.write_table(
            out, f"{out_dir}/{name}.parquet",
            row_group_size=max(1000, out.num_rows // 32),
        )
        print(f"{name}: {src.num_rows} -> {out.num_rows}")


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 10)
