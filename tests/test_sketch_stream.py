"""Rolling sketch zones fold to EXACTLY the batch sketches (the merge
laws are associative/commutative and batches are disjoint), and a
replayed batch is a no-op."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

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
