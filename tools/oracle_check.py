"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB at the given sf, then compares
row-count, sorted column names, and an order-insensitive value hash.

Usage:  python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402
from hadoop_ozone_spark.model import TABLES  # noqa: E402
from hadoop_ozone_spark.session import get_spark  # noqa: E402


def normalize(df: pd.DataFrame, strict: bool = False) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)

    def norm_cell(v):
        if v is None or v is pd.NaT or (isinstance(v, float) and pd.isna(v)):
            return "NULL"
        if isinstance(v, bool):
            return str(v).lower()
        if isinstance(v, float):
            if strict:
                return repr(v)
            return repr(round(v, 6))
        if isinstance(v, pd.Timestamp):
            return v.strftime("%Y-%m-%d %H:%M:%S.%f")
        return str(v)

    out = df.map(norm_cell)
    return out.sort_values(by=list(out.columns), kind="mergesort").reset_index(drop=True)


def value_hash(df: pd.DataFrame) -> str:
    h = hashlib.sha256()
    for row in df.itertuples(index=False):
        h.update("\x1f".join(row).encode())
        h.update(b"\x1e")
    return h.hexdigest()[:16]


# Chunked compare (VERDICT r12 #1): --chunked swaps the driver-side
# toPandas pull for the bounded-memory multiset hash fold in
# hadoop_ozone_spark/foldhash.py (there, not here, so mapInPandas
# workers can import it by module reference). The fold hash is NOT
# comparable to the full-frame hash (different law); VERDICTS are —
# tests/test_oracle_gate.py pins verdict equivalence on planted
# equal/mutated frames, and green sf10 rows re-run --chunked to
# identical verdicts before the mode certifies anything new.
from hadoop_ozone_spark.foldhash import (  # noqa: E402
    fold_duckdb,
    fold_frame,
    fold_spark,
)


def main() -> int:
    argv = list(sys.argv[1:])
    json_out = None
    chunked = "--chunked" in argv
    if chunked:
        argv.remove("--chunked")
    if "--json" in argv:
        i = argv.index("--json")
        if i + 1 >= len(argv):
            print("usage: oracle_check.py [sf_dir] [--json OUT] [query ...]")
            return 2
        json_out = argv[i + 1]
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    records: dict[str, dict] = {}
    spark = get_spark("oracle-check")
    # bound the oracle side: at sf10 a replay's intermediate (e.g. the
    # dup-span position self-join) can exceed RAM; unlimited, DuckDB
    # grows until the kernel OOM-kills the whole gate (observed: 93 GB
    # RSS alongside the 48g JVM). A limit + temp_directory makes it
    # spill instead.
    import atexit
    import os
    import shutil
    import tempfile

    _spill = tempfile.mkdtemp(prefix="oracle_duckdb_spill_")
    # remove the spill dir even on an exceptional exit — a single sf10
    # replay can spill tens of GB, and repeated gate runs would leak it
    atexit.register(shutil.rmtree, _spill, ignore_errors=True)

    def fresh_con():
        c = duckdb.connect()
        c.execute(
            f"SET memory_limit='{os.environ.get('ORACLE_DUCKDB_MEM', '32GB')}'"
        )
        c.execute(f"SET temp_directory='{_spill}'")
        for t in TABLES:
            c.execute(
                f"CREATE VIEW {t} AS"
                f" SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
        return c

    con = fresh_con()
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = []
    strict_failures = []  # repr-level float compare, no 6dp tolerance

    def flush_json(partial: bool) -> None:
        # write the artifact INCREMENTALLY (after every query), not
        # once at the end: the r12 sf10 widen batches ran 100+ minutes
        # of green rows and then lost ALL of it when the process was
        # OOM-killed before the single end-of-run dump (observed in
        # artifacts/sf10_r12_widen_driver.log — exit 137 with zero
        # artifacts for three batches)
        if not json_out:
            return
        import json

        with open(json_out, "w") as fh:
            json.dump(
                {
                    "sf_dir": sf_dir,
                    "partial": partial,
                    "failures": len(failures),
                    "strict_float_failures": len(strict_failures),
                    "queries": records,
                    "n_queries": len(records),
                },
                fh,
                indent=1,
            )

    for name, fn in qs.items():
        if only and name not in only:
            continue
        flush_json(partial=True)
        t0 = time.time()
        def record_error(kind: str, e: Exception) -> None:
            # errored queries must appear in the artifact as failures,
            # not silently vanish from the per-query records
            records[name] = {
                "rows_match": False,
                "schema_match": False,
                "hash_match": False,
                "rows": None,
                "sec": round(time.time() - t0, 1),
                "err": f"{kind}: {e}"[:500],
            }

        if chunked:
            sql = oracles.get(name)
            try:
                sn, shs, shss, scols = fold_spark(fn(get_spark("oracle-check"), sf_dir))
            except Exception as e:
                failures.append(name)
                record_error("spark error", e)
                print(f"FAIL {name}: spark error: {e}")
                continue
            if sql is None:
                print(f"SKIP {name}: no oracle (rows-only: {sn} rows)")
                continue
            try:
                on, ohs, ohss, ocols = fold_duckdb(con, sql)
            except Exception as e:
                failures.append(name)
                record_error("duckdb error", e)
                print(f"FAIL {name}: duckdb error: {e}")
                try:
                    con.close()
                except Exception:
                    pass
                con = fresh_con()
                continue
            elapsed = time.time() - t0
            problems = []
            if sn != on:
                problems.append(f"rows {sn} != {on}")
            if scols != ocols:
                problems.append(f"cols {scols} != {ocols}")
            if not problems and shs != ohs:
                problems.append(f"fold {shs:032x} != {ohs:032x}")
            if not problems and shss != ohss:
                strict_failures.append(name)
            if problems:
                failures.append(name)
                if name not in strict_failures:
                    strict_failures.append(name)
                print(f"FAIL {name}: {'; '.join(problems)}")
            else:
                print(f"OK   {name} ({sn} rows, {elapsed:.1f}s, chunked)")
            records[name] = {
                "rows_match": not any(p.startswith("rows") for p in problems),
                "schema_match": not any(p.startswith("cols") for p in problems),
                "hash_match": not problems,
                "rows": sn,
                "sec": round(elapsed, 1),
                "mode": "chunked",
                "err": "; ".join(problems) or None,
            }
            continue
        try:
            sdf = fn(get_spark("oracle-check"), sf_dir).toPandas()
        except Exception as e:
            failures.append(name)
            record_error("spark error", e)
            print(f"FAIL {name}: spark error: {e}")
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"SKIP {name}: no oracle (rows-only: {len(sdf)} rows)")
            continue
        try:
            odf = con.execute(sql).fetchdf()
        except Exception as e:
            failures.append(name)
            record_error("duckdb error", e)
            print(f"FAIL {name}: duckdb error: {e}")
            # a failed replay (OOM / spill-disk death) can leave the
            # connection's allocator poisoned — every later query then
            # dies on tiny block allocations (observed: one 48GB-limit
            # OOM failed 20 downstream queries). Rebuild the connection
            # so one infeasible twin can never poison the rest of the
            # gate.
            try:
                con.close()
            except Exception:
                pass
            con = fresh_con()
            continue
        elapsed = time.time() - t0
        problems = []
        if len(sdf) != len(odf):
            problems.append(f"rows {len(sdf)} != {len(odf)}")
        if sorted(sdf.columns) != sorted(odf.columns):
            problems.append(f"cols {sorted(sdf.columns)} != {sorted(odf.columns)}")
        if not problems:
            ns, no = normalize(sdf), normalize(odf)
            hs, ho = value_hash(ns), value_hash(no)
            if hs != ho:
                problems.append(f"hash {hs} != {ho}")
                diff = ns.compare(no) if ns.shape == no.shape else None
                if diff is not None and len(diff):
                    print(diff.head(5))
                else:
                    print("  spark:\n", ns.head(3), "\n  oracle:\n", no.head(3))
            # strict certification (VERDICT r5 #7): same frames, repr-level
            # float compare — surfaced as its own tail line every run so
            # the driver artifact carries the result
            ss, so = normalize(sdf, strict=True), normalize(odf, strict=True)
            if value_hash(ss) != value_hash(so):
                strict_failures.append(name)
        if problems:
            failures.append(name)
            if name not in strict_failures:
                strict_failures.append(name)
            print(f"FAIL {name}: {'; '.join(problems)}")
        else:
            print(f"OK   {name} ({len(sdf)} rows, {elapsed:.1f}s)")
        records[name] = {
            "rows_match": not any(p.startswith("rows") for p in problems),
            "schema_match": not any(p.startswith("cols") for p in problems),
            "hash_match": not problems,
            "rows": len(sdf),
            "sec": round(elapsed, 1),
            "err": "; ".join(problems) or None,
        }
    flush_json(partial=False)
    print(
        f"\nstrict_floats: {len(strict_failures)} failures"
        + (f": {strict_failures}" if strict_failures else "")
    )
    print(f"{len(failures)} failures" + (f": {failures}" if failures else ""))
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
