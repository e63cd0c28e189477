"""Order-insensitive multiset hash fold for result comparison at scale
(VERDICT r12 #1).

The oracle gate's full-frame compare sorts the whole normalized result
and hashes it in one driver-side pass — corpus-sized sf10 results
(a7_datanode_growth ~53M rows, f5_slim_projection = the whole key
plane) die in the collect long before any hashing happens. This module
is the bounded-memory replacement:

    row   ->  sha256 over the normalized cells  ->  128-bit int
    fold  ->  sum of row ints mod 2^128

The modular sum is commutative and associative, so the fold is
chunking-invariant (per-partition partials on Spark, per-fetch_df_chunk
on DuckDB, summed in any order), and multiset-sensitive (a duplicated
or dropped row moves the sum — an xor fold would cancel duplicates).

Cell normalization is the SAME law as the full-frame gate
(tools/oracle_check.normalize), with one addition: cells of columns the
ENGINE declares integral are formatted as ints. The full-frame path
gets that for free — pandas floats an integer column iff it has a NULL
anywhere, identically on both engines — but per-chunk the dtype flips
with each chunk's null pattern, so the declared schema, not the chunk
dtype, must drive the format or the fold would disagree with itself
across chunks of one result.

Lives in the package (not tools/) so mapInPandas workers can import it
by module reference; tools/oracle_check.py re-exports it.
Verdict-equivalence with the full-frame law is pinned in
tests/test_oracle_gate.py.
"""

from __future__ import annotations

import hashlib

import pandas as pd

FOLD_MOD = 1 << 128

SPARK_INT_TYPES = {"byte", "short", "int", "integer", "long", "bigint"}
DUCK_INT_TYPES = {
    "TINYINT", "SMALLINT", "INTEGER", "BIGINT", "HUGEINT",
    "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT",
}


def fold_frame(pdf: pd.DataFrame, int_cols: set[str]) -> tuple[int, int, int]:
    """(rows, hsum, hsum_strict) of one chunk under the multiset law.
    ``hsum`` uses the gate's 6-decimal float tolerance; ``hsum_strict``
    is the repr-level certification tail."""
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    n, hsum, hsum_strict = len(pdf), 0, 0
    is_int = [c in int_cols for c in pdf.columns]
    for row in pdf.itertuples(index=False):
        cells, cells_strict = [], []
        for v, as_int in zip(row, is_int):
            if v is None or v is pd.NaT or (
                isinstance(v, float) and pd.isna(v)
            ):
                cells.append("NULL")
                cells_strict.append("NULL")
                continue
            if as_int:
                s = str(int(v))
                cells.append(s)
                cells_strict.append(s)
                continue
            if isinstance(v, bool):
                s = str(v).lower()
                cells.append(s)
                cells_strict.append(s)
                continue
            if isinstance(v, float):
                cells.append(repr(round(v, 6)))
                cells_strict.append(repr(v))
                continue
            if isinstance(v, pd.Timestamp):
                s = v.strftime("%Y-%m-%d %H:%M:%S.%f")
                cells.append(s)
                cells_strict.append(s)
                continue
            s = str(v)
            cells.append(s)
            cells_strict.append(s)
        d = hashlib.sha256("\x1f".join(cells).encode()).digest()
        hsum = (hsum + int.from_bytes(d[:16], "big")) % FOLD_MOD
        d = hashlib.sha256("\x1f".join(cells_strict).encode()).digest()
        hsum_strict = (hsum_strict + int.from_bytes(d[:16], "big")) % FOLD_MOD
    return n, hsum, hsum_strict


def fold_spark(df) -> tuple[int, int, int, list[str]]:
    """Distributed multiset fold of a Spark DataFrame: mapInPandas
    emits one (rows, hsum, hsum_strict) partial per task; the driver
    sums the partials. Only the tiny partials cross the socket — the
    result itself never leaves the executors."""
    int_cols = {
        f.name for f in df.schema.fields
        if f.dataType.simpleString() in SPARK_INT_TYPES
    }

    def run(batches):
        n, hs, hss = 0, 0, 0
        for pdf in batches:
            a, b, c = fold_frame(pdf, int_cols)
            n, hs, hss = n + a, (hs + b) % FOLD_MOD, (hss + c) % FOLD_MOD
        yield pd.DataFrame({"n": [n], "hs": [str(hs)], "hss": [str(hss)]})

    parts = df.mapInPandas(run, "n long, hs string, hss string").collect()
    n = sum(p.n for p in parts)
    hs = sum(int(p.hs) for p in parts) % FOLD_MOD
    hss = sum(int(p.hss) for p in parts) % FOLD_MOD
    return n, hs, hss, sorted(df.columns)


def fold_duckdb(con, sql: str) -> tuple[int, int, int, list[str]]:
    """Streamed multiset fold of the oracle side via fetch_df_chunk —
    the replay never materializes the full result either."""
    res = con.execute(sql)
    int_cols = {
        d[0] for d in res.description if str(d[1]).upper() in DUCK_INT_TYPES
    }
    cols = [d[0] for d in res.description]
    n, hs, hss = 0, 0, 0
    while True:
        pdf = res.fetch_df_chunk(16)
        if pdf is None or len(pdf) == 0:
            break
        a, b, c = fold_frame(pdf, int_cols)
        n, hs, hss = n + a, (hs + b) % FOLD_MOD, (hss + c) % FOLD_MOD
    return n, hs, hss, sorted(cols)
