#!/usr/bin/env python3
"""Scale the driver's sf parquet tables by an integer factor, for
bench-only scaling points (e.g. sf0.1 x10 ~= sf1). NOT for correctness
runs — the driver's generator owns those inputs.

Replica i shifts every key column by i*stride, where stride = max(key)+1
over the base table's owning domain, so foreign keys stay consistent
within a replica (orders.o_custkey and customer.c_custkey shift by the
same custkey stride; events.user_id references c_custkey). region and
nation stay fixed, TPC-H style. All other columns (timestamps, text,
embeddings) are copied verbatim, preserving parquet physical types —
events.ts must stay TIMESTAMP(NANOS) for graft.Tables.events.

Usage: scale.py SRC_DIR DST_DIR FACTOR
"""
import sys
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
from pathlib import Path

src, dst, factor = Path(sys.argv[1]), Path(sys.argv[2]), int(sys.argv[3])
dst.mkdir(parents=True, exist_ok=True)


def stride(table, col):
    t = pq.read_table(src / f"{table}.parquet", columns=[col])
    return pc.max(t.column(col)).as_py() + 1


C = stride("customer", "c_custkey")
O = stride("orders", "o_orderkey")
P = stride("part", "p_partkey")
S = stride("supplier", "s_suppkey")
E = stride("events", "event_id")
D = stride("documents", "doc_id")
V = stride("embeddings", "vec_id")

SHIFTS = {
    "customer": {"c_custkey": C},
    "supplier": {"s_suppkey": S},
    "part": {"p_partkey": P},
    "orders": {"o_orderkey": O, "o_custkey": C},
    "lineitem": {"l_orderkey": O, "l_partkey": P, "l_suppkey": S},
    "events": {"event_id": E, "user_id": C},  # user_id joins c_custkey
    "documents": {"doc_id": D},
    "embeddings": {"vec_id": V},
}

for t in ("region", "nation"):
    pq.write_table(pq.read_table(src / f"{t}.parquet"), dst / f"{t}.parquet")
    print(f"{t}: copied fixed")

# Output layout: a DIRECTORY of part files per table (<= 10 replicas
# each, bounded row groups). A single-file single-row-group output is
# unsplittable, so every row-local operator's scan collapses to ONE
# Spark task at ANY scale factor — the x100 bench then measures one
# core's regex throughput, not the engine (measured: corpus_filter
# 51s single-task vs ~5s split). A real 100 TB corpus is always many
# files; the scaled proxy must be too. Spark reads the directory
# transparently under the same `{table}.parquet` path.
PER_FILE = 10

for t, shifts in SHIFTS.items():
    base = pq.read_table(src / f"{t}.parquet")
    outdir = dst / f"{t}.parquet"
    if outdir.exists() and outdir.is_file():
        outdir.unlink()
    outdir.mkdir(parents=True, exist_ok=True)
    total = 0
    for lo in range(0, factor, PER_FILE):
        replicas = []
        for i in range(lo, min(lo + PER_FILE, factor)):
            cols = [
                pc.add(base.column(name), i * shifts[name]) if name in shifts and i else base.column(name)
                for name in base.column_names
            ]
            replicas.append(pa.table(dict(zip(base.column_names, cols)), schema=base.schema))
        out = pa.concat_tables(replicas)
        total += out.num_rows
        pq.write_table(out, outdir / f"part-{lo:05d}.parquet",
                       row_group_size=max(8192, base.num_rows))
    print(f"{t}: {base.num_rows} -> {total}")
