"""Generate a larger scale factor from the driver's sf0.1 testdata.

The driver ships sf{0.001,0.01,0.1} (TESTDATA.md, read-only). The
round-9 evidence leg (VERDICT r8 #1) needs an sf1-sized dataset to
re-certify the heaviest queries at 10x data. Correctness at sf1 is a
Spark-vs-DuckDB property of the SAME files, so the synthesis law does
not need to match the driver's generator — it needs the same schemas,
preserved referential integrity, and preserved modulus laws. This
script replicates each scaling table REPLICAS times with key columns
shifted by r * OFFSET:

- OFFSET = 100_000_000 is divisible by every modulus the query surface
  uses as a slice law (% 50 holdouts, % 20 benchmark slices, % 2/4/8
  parities), so the held-out/benchmark fractions are preserved exactly;
- replica 0 is byte-identical to the source, so literal-parameter
  queries (point lookups, fixed container ids, probe vec_ids) keep
  their anchors;
- foreign keys shift together (o_custkey with c_custkey, l_orderkey
  with o_orderkey, ...), so join fan-outs scale linearly instead of
  quadratically;
- region/nation stay fixed (the TPC-H convention).

Replicated text/embedding payloads make every document/vector a 10-way
exact twin across replicas — a deliberate dedup stress: pair volumes
scale 10x and tie-break laws (min doc_id, vec_id asc) get exercised at
scale.

Usage: python tools/gen_scale.py [src_dir] [dst_dir] [replicas]
Default: /root/testdata/sf0.1 -> /root/repo/.testdata/sf1 x10
"""

from __future__ import annotations

import os
import sys

import duckdb

OFFSET = 100_000_000

COPY_AS_IS = ["region", "nation"]
SHIFTS = {
    "customer": {"c_custkey"},
    "supplier": {"s_suppkey"},
    "part": {"p_partkey"},
    "orders": {"o_orderkey", "o_custkey"},
    "lineitem": {"l_orderkey", "l_partkey", "l_suppkey"},
    "events": {"event_id", "user_id"},
    "documents": {"doc_id"},
    "embeddings": {"vec_id"},
}


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.testdata/sf1"
    replicas = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for t in COPY_AS_IS + list(SHIFTS):
        path = f"{src}/{t}.parquet"
        cols = [
            r[0]
            for r in con.execute(f"DESCRIBE SELECT * FROM '{path}'").fetchall()
        ]
        if t in COPY_AS_IS:
            q = f"SELECT * FROM read_parquet('{path}')"
        else:
            sel = ", ".join(
                f"{c} + r * {OFFSET} AS {c}" if c in SHIFTS[t] else c
                for c in cols
            )
            q = (
                f"SELECT {sel} FROM read_parquet('{path}'),"
                f" range({replicas}) t(r)"
            )
        out = f"{dst}/{t}.parquet"
        con.execute(f"COPY ({q}) TO '{out}' (FORMAT PARQUET)")
        n = con.execute(f"SELECT count(*) FROM '{out}'").fetchone()[0]
        print(f"{t}: {n} rows -> {out}")


if __name__ == "__main__":
    main()
