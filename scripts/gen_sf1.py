#!/usr/bin/env python3
"""Scale sf0.1 to a 10x "sf1" dataset for plan-cliff checks (broadcast
threshold flips, AQE coalesce behavior) that the small factors hide.

Each scaling table is replicated `REPS` times with surrogate-key offsets
(rep * 10_000_000) applied consistently across FK pairs (orders.o_custkey
tracks customer.c_custkey, lineitem's orderkey/partkey/suppkey track their
parents), so join selectivities stay realistic. region/nation stay fixed
(as in TPC-H). Text/embedding payloads are replicated verbatim — exact
dedup collapses the copies before any near-dup stage, mirroring how a real
crawl's replica pages behave. pyarrow is used (not DuckDB) so events.ts
keeps its physical type exactly as generated (TIMESTAMP(NANOS) in older
testdata generations, TIMESTAMP(MICROS) since round 9 — graft.Tables
branches on whichever it scans).

Usage: python3 scripts/gen_sf1.py [outdir=/tmp/graft_sf1] [reps=10]
"""
import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_sf1"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 10
OFF = 10_000_000

KEYS = {
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

os.makedirs(OUT, exist_ok=True)
for name, keys in KEYS.items():
    tab = pq.read_table(f"{SRC}/{name}.parquet")
    if not keys:
        out = tab
    else:
        parts = []
        for rep in range(REPS):
            t = tab
            for k in keys:
                i = t.schema.get_field_index(k)
                shifted = pc.add(t.column(k), rep * OFF).cast(t.schema.field(i).type)
                t = t.set_column(i, t.schema.field(i), shifted)
            parts.append(t)
        out = pa.concat_tables(parts)
    pq.write_table(out, f"{OUT}/{name}.parquet")
    print(f"{name}: {tab.num_rows} -> {out.num_rows}")
