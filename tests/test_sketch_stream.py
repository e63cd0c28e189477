"""Rolling sketch zones fold to EXACTLY the batch sketches (the merge
laws are associative/commutative and batches are disjoint), and a
replayed batch is a no-op."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hadoop_ozone_spark.datapipe import sketches
from hadoop_ozone_spark.streaming import sketch_stream


def test_sketch_stream_matches_batch_and_replays(spark):
    whole = spark.range(30_000).select(
        F.concat(F.lit("k"), F.expr("id DIV (id % 7 + 1)")).alias("k")
    ).persist()
    batches = [whole.filter(F.crc32("k") % 3 == i) for i in range(3)]
    tmp = tempfile.mkdtemp(prefix="ozspark_sketchstream_")
    try:
        for i, b in enumerate(batches):
            sketch_stream.process_batch(spark, b, i, tmp, "k")

        def hll(df):
            return {r.bucket: r.register for r in df.collect()}

        def cm(df):
            return {(r.row, r.bucket): r.cnt for r in df.collect()}

        assert hll(sketch_stream.read_hll_registers(spark, tmp)) == hll(
            sketches.hll_registers(whole, "k")
        )
        assert cm(sketch_stream.read_cm_counters(spark, tmp)) == cm(
            sketches.cm_counters(whole, "k")
        )
        assert {r.bit for r in sketch_stream.read_bloom_bits(spark, tmp).collect()} == {
            r.bit for r in sketches.bloom_bits(whole, "k").collect()
        }
        before = hll(sketch_stream.read_hll_registers(spark, tmp))
        sketch_stream.process_batch(spark, batches[1], 1, tmp, "k")  # replay
        assert hll(sketch_stream.read_hll_registers(spark, tmp)) == before
    finally:
        whole.unpersist()
        shutil.rmtree(tmp, ignore_errors=True)


def test_qsketch_stream_matches_batch_and_replays(spark):
    whole = spark.range(20_000).select(
        (F.col("id") % 2048 + 1).alias("v")
    ).persist()
    batches = [whole.filter(F.col("v") % 3 == i) for i in range(3)]
    tmp = tempfile.mkdtemp(prefix="ozspark_qsstream_")
    try:
        for i, b in enumerate(batches):
            sketch_stream.process_numeric_batch(spark, b, i, tmp, "v")

        def qs(df):
            return {r.bin: r.cnt for r in df.collect()}

        merged = qs(sketch_stream.read_qsketch_counts(spark, tmp))
        assert merged == qs(sketches.qsketch_counts(whole, "v"))
        # quantiles from the merged state equal the batch sketch's
        est = {
            r.q_ppm: r.est
            for r in sketches.qsketch_quantiles(
                sketch_stream.read_qsketch_counts(spark, tmp)
            ).collect()
        }
        est_batch = {
            r.q_ppm: r.est
            for r in sketches.qsketch_quantiles(
                sketches.qsketch_counts(whole, "v")
            ).collect()
        }
        assert est == est_batch
        sketch_stream.process_numeric_batch(spark, batches[1], 1, tmp, "v")
        assert qs(sketch_stream.read_qsketch_counts(spark, tmp)) == merged
    finally:
        whole.unpersist()
        shutil.rmtree(tmp, ignore_errors=True)


def test_kmv_stream_matches_batch_exactly_and_replays(spark):
    whole = spark.range(25_000).select(
        F.concat(F.lit("u"), F.col("id")).alias("k")
    ).persist()
    batches = [whole.filter(F.crc32("k") % 3 == i) for i in range(3)]
    tmp = tempfile.mkdtemp(prefix="ozspark_kmvstream_")
    try:
        for i, b in enumerate(batches):
            sketch_stream.process_set_batch(spark, b, i, tmp, "k")
        folded = sorted(
            r.h for r in sketch_stream.read_kmv_sketch(spark, tmp).collect()
        )
        direct = sorted(r.h for r in sketches.kmv_sketch(whole, "k").collect())
        # union-then-k-smallest is EXACT: stream == batch
        assert folded == direct
        sketch_stream.process_set_batch(spark, batches[1], 1, tmp, "k")  # replay
        assert sorted(
            r.h for r in sketch_stream.read_kmv_sketch(spark, tmp).collect()
        ) == folded
    finally:
        whole.unpersist()
        shutil.rmtree(tmp, ignore_errors=True)


def test_mg_stream_error_law_and_replays(spark):
    # skewed stream split into 3 disjoint day-batches
    rows = [("hot",)] * 900
    for i in range(120):
        rows += [(f"t{i}",)] * (i % 6 + 1)
    whole = spark.createDataFrame(rows, "k string").persist()
    batches = [whole.filter(F.crc32("k") % 3 == i) for i in range(3)]
    tmp = tempfile.mkdtemp(prefix="ozspark_mgstream_")
    try:
        for i, b in enumerate(batches):
            sketch_stream.process_set_batch(spark, b, i, tmp, "k")
        zone = sketch_stream.read_mg_summary(spark, tmp).collect()
        # zone-form contract (ADVICE r9): exactly one NULL-key sentinel
        # carrying the folded bound rides along with the summary rows
        assert sum(1 for r in zone if r.key is None) == 1
        folded = [r for r in zone if r.key is not None]
        assert 0 < len(folded) <= sketches.MG_K
        truth = {
            r.k: r["count"] for r in whole.groupBy("k").count().collect()
        }
        bound = zone[0].mg_threshold
        assert all(r.mg_threshold == bound for r in zone)  # incl. sentinel
        for r in folded:
            assert r.mg_count <= truth[r.key] <= r.mg_count + bound
        # the global heavy hitter survives the fold
        assert any(r.key == "hot" for r in folded)
        # replay is a no-op
        before = {(r.key, r.mg_count, r.mg_threshold) for r in zone}
        sketch_stream.process_set_batch(spark, batches[2], 2, tmp, "k")
        after = {
            (r.key, r.mg_count, r.mg_threshold)
            for r in sketch_stream.read_mg_summary(spark, tmp).collect()
        }
        assert after == before
    finally:
        whole.unpersist()
        shutil.rmtree(tmp, ignore_errors=True)


def test_mg_zone_sentinel_preserves_empty_summary_threshold(spark):
    # a batch where EVERY key ties at the (k+1)-th largest count: the
    # summary is empty but its error t must survive into the fold
    rows = [(f"t{i}",) for i in range(sketches.MG_K + 4) for _ in range(3)]
    batch = spark.createDataFrame(rows, "k string")
    z = sketches.mg_zone(batch, "k").collect()
    assert all(r.key is None for r in z)  # nothing survives truncation
    assert len(z) == 1 and z[0].mg_threshold == 3
    tmp = tempfile.mkdtemp(prefix="ozspark_mgsentinel_")
    try:
        sketch_stream.process_set_batch(spark, batch, 0, tmp, "k")
        heavy = spark.createDataFrame([("hot",)] * 50, "k string")
        sketch_stream.process_set_batch(spark, heavy, 1, tmp, "k")
        folded = sketch_stream.read_mg_summary(spark, tmp).collect()
        by_key = {r.key: r for r in folded}
        assert "hot" in by_key
        # the bound carries batch 0's sentinel threshold (3): true - est
        # for every key must stay within it, including t0..t19 (true 3,
        # est 0 -> needs bound >= 3, which only the sentinel provides)
        assert by_key["hot"].mg_threshold >= 3
        truth = {"hot": 50, **{f"t{i}": 3 for i in range(sketches.MG_K + 4)}}
        bound = folded[0].mg_threshold
        for k, v in truth.items():
            est = by_key[k].mg_count if k in by_key else 0
            assert est <= v <= est + bound
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_mg_fold_all_truncated_keeps_bound(spark):
    """ADVICE r9: a fold where EVERY key truncates away must still
    return the accumulated error bound — read_mg_summary returns zone
    form, so the worst case is one sentinel row carrying Σ zone
    thresholds (+ the re-truncation's own), never an empty frame."""
    tmp = tempfile.mkdtemp(prefix="ozspark_mgallcut_")
    try:
        for bid in range(2):
            # MG_K + 4 distinct keys, every count tied at 3: the zone
            # summary is empty, only the sentinel (t = 3) lands
            rows = [
                (f"b{bid}k{i}",)
                for i in range(sketches.MG_K + 4)
                for _ in range(3)
            ]
            batch = spark.createDataFrame(rows, "k string")
            sketch_stream.process_set_batch(spark, batch, bid, tmp, "k")
        zone = sketch_stream.read_mg_summary(spark, tmp).collect()
        # both zone summaries are empty, so the fold's own re-truncation
        # adds 0 — the fold is ONE sentinel whose bound is the two lost
        # zone thresholds: t0 + t1 = 3 + 3
        assert len(zone) == 1 and zone[0].key is None
        assert zone[0].mg_threshold == 6
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_set_sketch_stream_foreachbatch_end_to_end(spark):
    """Drive the real writeStream/foreachBatch wiring (availableNow)
    over a file stream: the folded KMV state must equal the batch
    sketch of the whole input, and the MG fold must satisfy the
    one-sided law vs the whole's exact counts."""
    import os

    whole = spark.range(12_000).select(
        F.when(
            F.col("id") % 4 == 0, F.lit("hot_key")
        ).otherwise(F.concat(F.lit("u"), F.col("id"))).alias("k")
    )
    tmp = tempfile.mkdtemp(prefix="ozspark_setstream_e2e_")
    try:
        src = os.path.join(tmp, "src")
        whole.repartition(3).write.parquet(src)
        stream = spark.readStream.schema(whole.schema).parquet(src)
        q = sketch_stream.run_set_sketch_stream(
            stream, os.path.join(tmp, "state"), os.path.join(tmp, "ckpt"), "k"
        )
        q.awaitTermination(120)
        state = os.path.join(tmp, "state")
        folded = sorted(
            r.h for r in sketch_stream.read_kmv_sketch(spark, state).collect()
        )
        direct = sorted(r.h for r in sketches.kmv_sketch(whole, "k").collect())
        assert folded == direct and len(folded) == sketches.KMV_K
        zone = sketch_stream.read_mg_summary(spark, state).collect()
        mg = [r for r in zone if r.key is not None]  # drop the sentinel
        truth = {r.k: r["count"] for r in whole.groupBy("k").count().collect()}
        bound = zone[0].mg_threshold
        for r in mg:
            assert r.mg_count <= truth[r.key] <= r.mg_count + bound
        assert any(r.key == "hot_key" for r in mg)  # 25% hot must survive
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_sketch_and_numeric_streams_foreachbatch_end_to_end(spark):
    """The trio and quantile writeStream wrappers fold to the batch
    sketches over a real availableNow file stream."""
    import os

    whole = spark.range(8_000).select(
        F.concat(F.lit("v"), F.expr("id DIV (id % 5 + 1)")).alias("k"),
        (F.col("id") % 1024 + 1).alias("v"),
    )
    tmp = tempfile.mkdtemp(prefix="ozspark_sketch_e2e_")
    try:
        src = os.path.join(tmp, "src")
        whole.repartition(2).write.parquet(src)
        stream = spark.readStream.schema(whole.schema).parquet(src)
        q1 = sketch_stream.run_sketch_stream(
            stream, os.path.join(tmp, "s1"), os.path.join(tmp, "c1"), "k"
        )
        q1.awaitTermination(120)
        hll = {
            r.bucket: r.register
            for r in sketch_stream.read_hll_registers(
                spark, os.path.join(tmp, "s1")
            ).collect()
        }
        assert hll == {
            r.bucket: r.register
            for r in sketches.hll_registers(whole, "k").collect()
        }
        q2 = sketch_stream.run_numeric_sketch_stream(
            spark.readStream.schema(whole.schema).parquet(src),
            os.path.join(tmp, "s2"),
            os.path.join(tmp, "c2"),
            "v",
        )
        q2.awaitTermination(120)
        qs = {
            r.bin: r.cnt
            for r in sketch_stream.read_qsketch_counts(
                spark, os.path.join(tmp, "s2")
            ).collect()
        }
        assert qs == {
            r.bin: r.cnt for r in sketches.qsketch_counts(whole, "v").collect()
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_zone_fed_corpus_drift_matches_corpus_report(spark):
    """VERDICT r9 #3: drift(zones) ≡ drift(corpus). Each side's vocab
    stays <= MG_K distinct tokens, so NO zone truncates (every zone
    threshold is 0) and the MG fold is exactly the batch summary; the
    KMV fold is exact unconditionally and the quantile fold SUM-merges
    exactly — the zone-fed report must therefore equal the corpus-scan
    report row for row."""
    import os

    from hadoop_ozone_spark.datapipe import text as text_ops
    from hadoop_ozone_spark.plans import datapipe_queries as dq

    rows = []
    for i in range(40):
        side = "a" if i < 22 else "b"
        vocab = (
            [f"w{j}" for j in range(14)]
            if side == "a"
            else [f"w{j}" for j in range(8, 16)] + [f"x{j}" for j in range(5)]
        )
        toks = [vocab[(i * 3 + k * 7) % len(vocab)] for k in range(i % 9 + 2)]
        rows.append((side, i, " ".join(toks)))
    tagged = spark.createDataFrame(rows, "side string, doc_id long, text string")

    corpus = [tuple(r) for r in dq.corpus_drift_report(tagged).collect()]

    tmp = tempfile.mkdtemp(prefix="ozspark_driftzones_")
    try:
        dirs = {s: os.path.join(tmp, s) for s in ("a", "b")}
        for s in ("a", "b"):
            side_docs = tagged.filter(F.col("side") == s)
            for bid in range(2):
                b = side_docs.filter(F.col("doc_id") % 2 == bid)
                tok = b.select(
                    F.explode(text_ops.tokens(F.col("text"))).alias("token")
                )
                sketch_stream.process_set_batch(spark, tok, bid, dirs[s], "token")
                tc = b.select(
                    F.size(text_ops.tokens(F.col("text")))
                    .cast("long")
                    .alias("n_tokens")
                )
                sketch_stream.process_numeric_batch(
                    spark, tc, bid, dirs[s], "n_tokens"
                )
        zoned = [
            tuple(r)
            for r in dq.corpus_drift_from_zones(
                spark, dirs["a"], dirs["b"]
            ).collect()
        ]
        assert zoned == corpus
        # sanity: the report actually saw overlap and per-side exclusives
        m = dict(corpus)
        assert m["hh_shared"] > 0 and m["hh_only_a"] > 0 and m["hh_only_b"] > 0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

def test_reservoir_sample_laws(spark):
    """The bottom-k row sample: exact size min(k, n), a subset of the
    input ids, partition/order-independent (pure function of the row
    set + seed), different seeds draw different samples, and the
    grouped form is bit-identical to the ungrouped sample per slice."""
    docs = spark.range(5_000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("src"), (F.col("id") % 7).cast("string")).alias(
            "source"
        ),
    ).persist()
    sample = sketches.reservoir_sample(docs, "doc_id", k=64).collect()
    assert len(sample) == 64
    ids = {r.doc_id for r in sample}
    assert len(ids) == 64 and all(0 <= d < 5_000 for d in ids)
    # partition-independence: a reshuffled input draws the SAME sample
    re_ids = {
        r.doc_id
        for r in sketches.reservoir_sample(
            docs.repartition(13, "source"), "doc_id", k=64
        ).collect()
    }
    assert re_ids == ids
    # small-n: the sample IS the input
    assert (
        sketches.reservoir_sample(docs.limit(10), "doc_id", k=64).count()
        == 10
    )
    # a fresh seed is an (almost surely) different draw
    other = {
        r.doc_id
        for r in sketches.reservoir_sample(
            docs, "doc_id", k=64, seed="rsv2"
        ).collect()
    }
    assert other != ids
    # grouped == per-slice ungrouped, every group exactly k (n >> k)
    grouped = sketches.reservoir_sample_grouped(
        docs, "source", "doc_id", k=8
    ).collect()
    by_key: dict[str, list] = {}
    for r in grouped:
        by_key.setdefault(r.key, []).append((r.h, r.doc_id))
    assert set(by_key) == {f"src{i}" for i in range(7)}
    for key, rows in by_key.items():
        slice_rows = [
            (r.h, r.doc_id)
            for r in sketches.reservoir_sample(
                docs.filter(F.col("source") == key), "doc_id", k=8
            ).collect()
        ]
        assert sorted(rows) == sorted(slice_rows)
    docs.unpersist()


def test_reservoir_stream_matches_batch_exactly_and_replays(spark):
    """Zones fold by union-then-k-smallest, EXACT by the KMV argument
    applied to row identity: stream == batch, replay idempotent, torn
    zone fails loudly."""
    import os

    import pytest

    whole = spark.range(20_000).select(F.col("id").alias("doc_id")).persist()
    batches = [whole.filter(F.col("doc_id") % 3 == i) for i in range(3)]
    tmp = tempfile.mkdtemp(prefix="ozspark_rsvstream_")
    try:
        for i, b in enumerate(batches):
            sketch_stream.process_sample_batch(b, i, tmp, "doc_id")
        folded = sorted(
            (r.h, r.doc_id)
            for r in sketch_stream.read_reservoir(spark, tmp).collect()
        )
        direct = sorted(
            (r.h, r.doc_id)
            for r in sketches.reservoir_sample(whole, "doc_id").collect()
        )
        assert folded == direct and len(folded) == sketches.RSV_K
        # replay = idempotent overwrite
        sketch_stream.process_sample_batch(batches[1], 1, tmp, "doc_id")
        assert sorted(
            (r.h, r.doc_id)
            for r in sketch_stream.read_reservoir(spark, tmp).collect()
        ) == folded
        # torn zone (writer died before commit) fails the reader loudly
        os.remove(os.path.join(tmp, "rsv", "batch=1", "_SUCCESS"))
        with pytest.raises(Exception, match="batch=1"):
            sketch_stream.read_reservoir(spark, tmp).collect()
    finally:
        whole.unpersist()
        shutil.rmtree(tmp, ignore_errors=True)

def test_reservoir_stream_foreachbatch_end_to_end(spark):
    """Drive run_reservoir_stream's real writeStream/foreachBatch
    wiring (availableNow) over a multi-file stream: the folded rolling
    sample must equal the batch sample of the whole input — the
    union-then-k-smallest fold is exact through the production entry
    point, not just the process function."""
    import os

    whole = spark.range(15_000).select(F.col("id").alias("doc_id"))
    tmp = tempfile.mkdtemp(prefix="ozspark_rsvstream_e2e_")
    try:
        src = os.path.join(tmp, "src")
        whole.repartition(3).write.parquet(src)
        stream = (
            spark.readStream.schema(whole.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = sketch_stream.run_reservoir_stream(
            stream,
            os.path.join(tmp, "state"),
            os.path.join(tmp, "ckpt"),
            "doc_id",
        )
        q.awaitTermination(120)
        folded = sorted(
            (r.h, r.doc_id)
            for r in sketch_stream.read_reservoir(
                spark, os.path.join(tmp, "state")
            ).collect()
        )
        direct = sorted(
            (r.h, r.doc_id)
            for r in sketches.reservoir_sample(whole, "doc_id").collect()
        )
        assert folded == direct and len(folded) == sketches.RSV_K
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_weighted_reservoir_laws(spark):
    """The A-ExpJ weighted sample: exact size min(k, n), a subset of
    the input ids, partition/order-independent (pure function of the
    row set + seed), weight clamped to >= 1 (a zero/NULL-weight row
    still races), and the grouped form is bit-identical to the
    ungrouped weighted sample per slice."""
    docs = spark.range(5_000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("src"), (F.col("id") % 7).cast("string")).alias(
            "source"
        ),
        (F.col("id") % 97 + 1).alias("n_chars"),
    ).persist()
    sample = sketches.weighted_reservoir_sample(docs, k=64).collect()
    assert len(sample) == 64
    ids = {r.doc_id for r in sample}
    assert len(ids) == 64 and all(0 <= d < 5_000 for d in ids)
    assert all(r.weight == r.doc_id % 97 + 1 for r in sample)
    # partition-independence: a reshuffled input draws the SAME sample
    re_ids = {
        r.doc_id
        for r in sketches.weighted_reservoir_sample(
            docs.repartition(13, "source"), k=64
        ).collect()
    }
    assert re_ids == ids
    # small-n: the sample IS the input
    assert (
        sketches.weighted_reservoir_sample(docs.limit(10), k=64).count() == 10
    )
    # the clamp: zero weight races at floor odds, never divides by zero
    clamped = sketches.weighted_reservoir_sample(
        docs.withColumn("n_chars", F.lit(0)), k=16
    ).collect()
    assert len(clamped) == 16 and all(r.weight == 1 for r in clamped)
    # grouped == per-slice ungrouped, every group exactly k (n >> k)
    grouped = sketches.weighted_reservoir_grouped(
        docs, "source", k=8
    ).collect()
    by_key: dict[str, list] = {}
    for r in grouped:
        by_key.setdefault(r.key, []).append((r.doc_id, r.weight))
    assert set(by_key) == {f"src{i}" for i in range(7)}
    for key, rows in by_key.items():
        slice_rows = [
            (r.doc_id, r.weight)
            for r in sketches.weighted_reservoir_sample(
                docs.filter(F.col("source") == key), k=8
            ).collect()
        ]
        assert sorted(rows) == sorted(slice_rows)
    docs.unpersist()


def test_weighted_reservoir_inclusion_probability(spark):
    """The ES law, measured: with k=1 the winner is row i with
    probability EXACTLY w_i / sum(w) (the defining property of the
    exponential race — min of independent Exp(w_i) lands on i with
    rate-proportional odds). 600 independent trials in ONE Spark job
    (trial-scoped row ids make the draws independent); each doc's win
    count must sit within 5 sigma of the multinomial expectation. The
    md5 draws are deterministic, so this never flakes."""
    import math

    weights = {d: d + 1 for d in range(6)}  # 1..6, sum 21
    n_trials, total_w = 600, sum(weights.values())
    trials = spark.range(n_trials).select(F.col("id").alias("trial"))
    docs = spark.createDataFrame(
        list(weights.items()), "doc_id long, w long"
    )
    keyed = trials.crossJoin(docs).select(
        "trial",
        "doc_id",
        sketches.weighted_reservoir_key(
            F.concat_ws("_", "trial", "doc_id"), F.col("w"), "wprop"
        ).alias("_key"),
    )
    win = Window.partitionBy("trial").orderBy("_key", "doc_id")
    winners = (
        keyed.withColumn("_rn", F.row_number().over(win))
        .filter(F.col("_rn") == 1)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("wins"))
        .collect()
    )
    wins = {r.doc_id: r.wins for r in winners}
    assert sum(wins.values()) == n_trials
    for d, w in weights.items():
        p = w / total_w
        mu = n_trials * p
        sigma = math.sqrt(n_trials * p * (1 - p))
        assert abs(wins.get(d, 0) - mu) <= 5 * sigma, (d, wins.get(d, 0), mu)


def test_weighted_reservoir_stream_matches_batch_and_replays(spark):
    """Weighted zones fold by union-then-k-smallest-keys, EXACT by the
    uniform-reservoir argument: stream == batch, replay idempotent,
    torn zone fails loudly, and the production writeStream entry point
    agrees end-to-end."""
    import os

    import pytest

    whole = spark.range(20_000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 211 + 1).alias("n_chars")
    ).persist()
    batches = [whole.filter(F.col("doc_id") % 3 == i) for i in range(3)]
    tmp = tempfile.mkdtemp(prefix="ozspark_wrsvstream_")
    try:
        for i, b in enumerate(batches):
            sketch_stream.process_weighted_sample_batch(
                b, i, tmp, "doc_id", "n_chars"
            )
        folded = sorted(
            (r.doc_id, r.weight)
            for r in sketch_stream.read_weighted_reservoir(spark, tmp).collect()
        )
        direct = sorted(
            (r.doc_id, r.weight)
            for r in sketches.weighted_reservoir_sample(whole).collect()
        )
        assert folded == direct and len(folded) == sketches.RSV_K
        # replay = idempotent overwrite
        sketch_stream.process_weighted_sample_batch(
            batches[1], 1, tmp, "doc_id", "n_chars"
        )
        assert sorted(
            (r.doc_id, r.weight)
            for r in sketch_stream.read_weighted_reservoir(spark, tmp).collect()
        ) == folded
        # torn zone (writer died before commit) fails the reader loudly
        os.remove(os.path.join(tmp, "wrsv", "batch=1", "_SUCCESS"))
        with pytest.raises(Exception, match="batch=1"):
            sketch_stream.read_weighted_reservoir(spark, tmp).collect()
        # production entry point: real writeStream over a 3-file source
        src = os.path.join(tmp, "src")
        whole.repartition(3).write.parquet(src)
        stream = (
            spark.readStream.schema(whole.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = sketch_stream.run_weighted_reservoir_stream(
            stream,
            os.path.join(tmp, "state"),
            os.path.join(tmp, "ckpt"),
            "doc_id",
            "n_chars",
        )
        q.awaitTermination(120)
        e2e = sorted(
            (r.doc_id, r.weight)
            for r in sketch_stream.read_weighted_reservoir(
                spark, os.path.join(tmp, "state")
            ).collect()
        )
        assert e2e == direct
    finally:
        whole.unpersist()
        shutil.rmtree(tmp, ignore_errors=True)
