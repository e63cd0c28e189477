"""Pins for the oracle gate's chunked multiset fold (VERDICT r12 #1).

The full-frame gate sorts the whole normalized result and hashes it in
one pass — impossible for corpus-sized sf10 results, which die in the
driver-side pull. The chunked fold (tools/oracle_check.py fold_frame /
fold_spark / fold_duckdb) must reach the SAME verdict from bounded
memory: equal row multisets agree, and any mutation — a changed value,
a dropped row, a duplicated row, chunk-boundary placement — disagrees.
These pins are what licenses swapping the fold in for the pull on the
sf10 legs without weakening the gate.
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, "/root/repo/tools")

from oracle_check import (  # noqa: E402
    fold_duckdb,
    fold_frame,
    fold_spark,
    normalize,
    value_hash,
)


BASE = pd.DataFrame(
    {
        "k": [1, 2, 3, 4, 5],
        "v": [1.5, 2.25, None, 4.125, 4.125],
        "s": ["a", "b", "c", None, "e"],
    }
)


def _fold(pdf: pd.DataFrame, chunks: int = 1) -> tuple[int, int, int]:
    n, hs, hss = 0, 0, 0
    for part in (
        [pdf] if chunks == 1 else
        [pdf.iloc[i::chunks] for i in range(chunks)]
    ):
        a, b, c = fold_frame(part, int_cols={"k"})
        n, hs, hss = n + a, (hs + b) % (1 << 128), (hss + c) % (1 << 128)
    return n, hs, hss


def test_fold_is_chunking_invariant():
    # the fold of the whole frame equals the fold of any chunking of it
    # (commutativity + associativity of the modular sum) — the property
    # that makes per-partition / per-fetch_df_chunk folding sound
    assert _fold(BASE, 1) == _fold(BASE, 2) == _fold(BASE, 3) == _fold(BASE, 5)


def test_fold_verdict_tracks_full_frame_verdict():
    # equal multisets: fold agrees, full-frame hash agrees
    shuffled = BASE.sample(frac=1.0, random_state=7).reset_index(drop=True)
    assert _fold(BASE) == _fold(shuffled)
    assert value_hash(normalize(BASE)) == value_hash(normalize(shuffled))
    # mutations every gate must catch: changed value, dropped row,
    # duplicated row (multiset-sensitivity — an xor fold would miss it)
    changed = BASE.copy()
    changed.loc[0, "v"] = 1.5000020  # beyond the 6dp tolerance
    dropped = BASE.iloc[1:]
    duped = pd.concat([BASE, BASE.iloc[[2]]], ignore_index=True)
    for mutant in (changed, dropped, duped):
        assert _fold(mutant) != _fold(BASE)
        assert (
            value_hash(normalize(mutant.reset_index(drop=True)))
            != value_hash(normalize(BASE))
        )
    # within the 6dp tolerance: tolerant fold agrees, strict fold differs
    eps = BASE.copy()
    eps.loc[0, "v"] = 1.5 + 1e-9
    n0, hs0, hss0 = _fold(BASE)
    n1, hs1, hss1 = _fold(eps)
    assert (n0, hs0) == (n1, hs1)
    assert hss0 != hss1


def test_fold_int_columns_are_chunk_dtype_stable():
    # a declared-integer column goes float64 in pandas exactly when a
    # chunk carries a NULL — the declared-schema coercion must make the
    # int64 chunk and the float64 chunk format identically
    ints = pd.DataFrame({"k": pd.array([1, 2], dtype="int64")})
    floats = pd.DataFrame({"k": pd.array([1.0, 2.0], dtype="float64")})
    assert _fold(ints) == _fold(floats)


def test_spark_and_duckdb_folds_agree(spark):
    sdf = spark.createDataFrame(BASE).repartition(3)
    sn, shs, shss, scols = fold_spark(sdf)
    con = duckdb.connect()
    con.register("base", BASE)
    on, ohs, ohss, ocols = fold_duckdb(
        con, "SELECT k, v, s FROM base"
    )
    assert (sn, shs, shss, scols) == (on, ohs, ohss, ocols)
    # and a planted oracle-side mutation flips the verdict
    on2, ohs2, _, _ = fold_duckdb(
        con, "SELECT k, v, s FROM base WHERE k <> 3"
    )
    assert on2 == sn - 1 and ohs2 != shs


def test_duckdb_fold_streams_past_one_chunk(spark):
    # 10k rows spans multiple fetch_df_chunk vectors; fold must equal
    # the one-shot frame fold (the sf10 soundness claim in miniature)
    con = duckdb.connect()
    pdf = con.execute(
        "SELECT range AS k, range * 0.5 AS v, CAST(range AS VARCHAR) AS s"
        " FROM range(10000)"
    ).fetchdf()
    n, hs, hss = _fold(pdf)
    on, ohs, ohss, _ = fold_duckdb(
        con,
        "SELECT range AS k, range * 0.5 AS v, CAST(range AS VARCHAR) AS s"
        " FROM range(10000)",
    )
    assert (on, ohs, ohss) == (n, hs, hss)
    sdf = spark.createDataFrame(pdf).repartition(8)
    sn, shs, shss, _ = fold_spark(sdf)
    assert (sn, shs, shss) == (n, hs, hss)
