#!/usr/bin/env python
"""Synthesize an sf1 test set by replicating /root/testdata/sf0.1 KX with
consistent key shifts (default K=10 -> /tmp/sf1).

The driver provides sf0.001/0.01/0.1 only; the sf1 soak (VERDICT r1 item 7)
needs 10x more. Replication preserves every arrow schema bit-for-bit
(events keeps TIMESTAMP(NANOS)) and shifts foreign keys consistently so
join cardinalities scale with the data:

- customer/orders/lineitem/part/supplier shift their shared key domains
  together (copy i adds i * (max_key + 1));
- region/nation are dimensions and stay single-copy;
- documents/embeddings shift doc_id/vec_id in lockstep (J1 zip alignment
  and the doc<->vec joins keep 1:1 cardinality);
- document text gets a per-copy ' repI' suffix for i>0 so the dedup
  family size stays bounded (10 near-dups per source doc, linear corpus
  growth) instead of exact-dup explosion.

Usage: python tools/make_sf1.py [K] [SRC_DIR] [DST_DIR]
"""

from __future__ import annotations

import sys
from pathlib import Path

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC_DEFAULT = "/root/testdata/sf0.1"
DST_DEFAULT = "/tmp/sf1"

#: table -> columns shifted by i * (max(primary domain) + 1). The shift
#: base is keyed by *domain* so orders.o_custkey moves exactly like
#: customer.c_custkey.
DOMAINS = {
    "cust": ("customer", "c_custkey"),
    "supp": ("supplier", "s_suppkey"),
    "part": ("part", "p_partkey"),
    "order": ("orders", "o_orderkey"),
    "event": ("events", "event_id"),
    "doc": ("documents", "doc_id"),
}

SHIFTS = {
    "customer": {"c_custkey": "cust"},
    "supplier": {"s_suppkey": "supp"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "order", "o_custkey": "cust"},
    "lineitem": {"l_orderkey": "order", "l_partkey": "part", "l_suppkey": "supp"},
    "events": {"event_id": "event"},
    "documents": {"doc_id": "doc"},
    "embeddings": {"vec_id": "doc"},
}

DIM_TABLES = ["region", "nation"]


def replicate(src: Path, dst: Path, k: int) -> None:
    dst.mkdir(parents=True, exist_ok=True)
    bases = {}
    for dom, (tbl, col) in DOMAINS.items():
        t = pq.read_table(src / f"{tbl}.parquet", columns=[col])
        bases[dom] = int(pc.max(t[col]).as_py()) + 1

    for tbl in DIM_TABLES:
        t = pq.read_table(src / f"{tbl}.parquet")
        pq.write_table(t, dst / f"{tbl}.parquet")
        print(f"{tbl}: {t.num_rows} rows (dimension, single copy)")

    for tbl, shifts in SHIFTS.items():
        t = pq.read_table(src / f"{tbl}.parquet")
        copies = []
        for i in range(k):
            c = t
            for col, dom in shifts.items():
                idx = c.schema.get_field_index(col)
                typ = c.schema.field(idx).type
                shifted = pc.cast(
                    pc.add(c[col], pa.scalar(i * bases[dom], type=typ)), typ
                )
                c = c.set_column(idx, c.schema.field(idx), shifted)
            if tbl == "documents" and i > 0:
                idx = c.schema.get_field_index("text")
                suffixed = pc.binary_join_element_wise(
                    pc.cast(c["text"], pa.string()), f" rep{i}", ""
                )
                c = c.set_column(idx, c.schema.field(idx), pc.cast(suffixed, c.schema.field(idx).type))
            copies.append(c)
        out = pa.concat_tables(copies)
        # Bounded row groups: pyarrow's default writes ONE row group per
        # call, and a single-row-group file caps Spark's scan parallelism
        # at 1 task no matter how many byte-range splits exist (measured:
        # the sf1 char-shingle stage ran as one straggler task on 32
        # cores — every "super-linear" text query traced back to this).
        # ≥64 groups per table mirrors what real compacted shards look
        # like at scale (S6: many ~100 MB row groups, never one blob).
        row_group_size = max(1024, out.num_rows // 64)
        pq.write_table(out, dst / f"{tbl}.parquet", row_group_size=row_group_size)
        print(
            f"{tbl}: {t.num_rows} -> {out.num_rows} rows "
            f"(row_group_size {row_group_size})"
        )


if __name__ == "__main__":
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = Path(sys.argv[2]) if len(sys.argv) > 2 else Path(SRC_DEFAULT)
    dst = Path(sys.argv[3]) if len(sys.argv) > 3 else Path(DST_DEFAULT)
    replicate(src, dst, k)
