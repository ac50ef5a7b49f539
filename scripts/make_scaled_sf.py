#!/usr/bin/env python
"""Generate a LARGER synthetic SF dir by replicating /root/testdata/sf0.1
with shifted keys — measurement-only data for optimization work (the
driver generates its own large SF; this reproduces its SHAPE so per-query
timings can be taken locally at sf1.0+ without the driver).

Replication rules (replica i of R):
  customer   c_custkey += i*15000
  orders     o_orderkey += i*150000, o_custkey += i*15000
  lineitem   l_orderkey += i*150000
  part       p_partkey += i*20000
  supplier   s_suppkey += i*1000
  events     event_id += i*100000, user_id += i*1500 (ts unchanged)
  documents  doc_id += i*5000; replicas i>0 append a unique token to the
             text so exact-dup groups stay planted-only (driver data has
             near-unique texts; plain replication would make every text a
             10-member dup group and distort the dedup workloads)
  embeddings vec_id += i*2000; replicas i>0 add deterministic ~5%%-norm
             gaussian noise (cos(orig, replica) ~ 0.999 < the 0.9999
             near-dup threshold, so the pair set stays planted-only,
             while LSH/IVF bucket geometry stays realistic)
  nation/region copied as-is (fixed dimension tables)

Usage: python scripts/make_scaled_sf.py /root/sfbig/sf1.0 10
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"

SHIFTS = {
    "customer": {"c_custkey": 15_000},
    "orders": {"o_orderkey": 150_000, "o_custkey": 15_000},
    "lineitem": {"l_orderkey": 150_000},
    "part": {"p_partkey": 20_000},
    "supplier": {"s_suppkey": 1_000},
    "events": {"event_id": 100_000, "user_id": 1_500},
    "documents": {"doc_id": 5_000},
}


def shifted(tbl: pa.Table, shifts: dict[str, int], i: int) -> pa.Table:
    for col, step in shifts.items():
        idx = tbl.schema.get_field_index(col)
        tbl = tbl.set_column(
            idx, tbl.schema.field(col),
            pc.add(tbl.column(col), i * step),
        )
    return tbl


def main() -> None:
    out_dir = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    os.makedirs(out_dir, exist_ok=True)

    for name in ("nation", "region"):
        t = pq.read_table(f"{SRC}/{name}.parquet")
        pq.write_table(t, f"{out_dir}/{name}.parquet")
        print(f"{name}: {t.num_rows} rows (copied)")

    for name in ("customer", "orders", "lineitem", "part", "supplier", "events"):
        t = pq.read_table(f"{SRC}/{name}.parquet")
        parts = [shifted(t, SHIFTS[name], i) for i in range(reps)]
        big = pa.concat_tables(parts)
        pq.write_table(big, f"{out_dir}/{name}.parquet")
        print(f"{name}: {big.num_rows} rows")

    # documents: make replica texts globally unique
    t = pq.read_table(f"{SRC}/documents.parquet")
    parts = []
    for i in range(reps):
        r = shifted(t, SHIFTS["documents"], i)
        if i > 0:
            tag = pc.binary_join_element_wise(
                r.column("text").cast(pa.string()),
                pc.cast(r.column("doc_id"), pa.string()),
                " u",
            )
            r = r.set_column(
                r.schema.get_field_index("text"), r.schema.field("text"), tag
            )
        parts.append(r)
    big = pa.concat_tables(parts)
    pq.write_table(big, f"{out_dir}/documents.parquet")
    print(f"documents: {big.num_rows} rows")

    # embeddings: deterministic per-replica noise keeps replicas below the
    # 0.9999 near-dup threshold against their originals
    t = pq.read_table(f"{SRC}/embeddings.parquet")
    vecs = np.asarray(t.column("embedding").to_pylist(), dtype=np.float32)
    n, dim = vecs.shape
    elem_std = float(vecs.std())
    parts = []
    for i in range(reps):
        r = shifted(t, {"vec_id": 2_000}, i)
        if i > 0:
            rng = np.random.default_rng(1234 + i)
            noisy = vecs + rng.normal(0.0, 0.05 * elem_std, size=(n, dim)).astype(
                np.float32
            )
            arr = pa.array(list(noisy), type=t.schema.field("embedding").type)
            r = r.set_column(
                r.schema.get_field_index("embedding"),
                r.schema.field("embedding"),
                arr,
            )
        parts.append(r)
    big = pa.concat_tables(parts)
    pq.write_table(big, f"{out_dir}/embeddings.parquet")
    print(f"embeddings: {big.num_rows} rows")
    with open(f"{out_dir}/_DONE", "w") as f:
        f.write("scaled from sf0.1\n")


if __name__ == "__main__":
    main()
