"""Streaming dedup: per-batch incremental minhash against a persisted
index must reproduce the batch answer over the full corpus, and a
replayed batch must be a no-op (idempotent landing zones)."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from hadoop_ozone_spark import model
from hadoop_ozone_spark.datapipe import dedup
from hadoop_ozone_spark.streaming import dedup_stream


@pytest.fixture(scope="module")
def corpus(spark, sf_dir):
    return model.dedup_corpus(spark, sf_dir).cache()


def _splits(corpus):
    return [
        corpus.filter(F.col("doc_id") < 1_000_000),
        corpus.filter((F.col("doc_id") >= 1_000_000) & (F.col("doc_id") < 2_000_000)),
        corpus.filter(F.col("doc_id") >= 2_000_000),
    ]


def test_streaming_dedup_matches_batch(spark, corpus):
    tmp = tempfile.mkdtemp(prefix="ozspark_dedupstream_")
    try:
        for i, batch in enumerate(_splits(corpus)):
            dedup_stream.process_batch(spark, batch, i, tmp)
        got = {
            (r["doc_a"], r["doc_b"])
            for r in dedup_stream.read_pairs(spark, tmp).collect()
        }
        want = {
            (r["doc_a"], r["doc_b"])
            for r in dedup.minhash_dedup_pairs(corpus, portable=True).collect()
        }
        assert got == want and want
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_streaming_dedup_replay_idempotent(spark, corpus):
    tmp = tempfile.mkdtemp(prefix="ozspark_dedupstream_")
    try:
        batches = _splits(corpus)
        for i, batch in enumerate(batches):
            dedup_stream.process_batch(spark, batch, i, tmp)
        before = dedup_stream.read_pairs(spark, tmp).count()
        dedup_stream.process_batch(spark, batches[1], 1, tmp)  # replay
        after = dedup_stream.read_pairs(spark, tmp).count()
        assert before == after
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_run_dedup_stream_wiring(spark, corpus):
    """availableNow foreachBatch over a file source lands pairs + index."""
    tmp = tempfile.mkdtemp(prefix="ozspark_dedupstream_")
    try:
        small = corpus.filter(F.col("doc_id") % 2 == 0).select("doc_id", "text")
        small.write.parquet(f"{tmp}/in")
        stream = spark.readStream.schema("doc_id long, text string").parquet(f"{tmp}/in")
        q = dedup_stream.run_dedup_stream(stream, f"{tmp}/state", f"{tmp}/ckpt")
        q.awaitTermination(120)
        got = {
            (r["doc_a"], r["doc_b"])
            for r in dedup_stream.read_pairs(spark, f"{tmp}/state").collect()
        }
        want = {
            (r["doc_a"], r["doc_b"])
            for r in dedup.minhash_dedup_pairs(small, portable=True).collect()
        }
        assert got == want and want
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_streaming_clusters_match_batch_and_replay(spark, corpus):
    """Rolling cluster labels: after the last batch the label state must
    equal batch CC over ALL pairs (the contraction law, inductively),
    and replaying a mid-stream batch's cluster update rewrites its zone
    with identical rows."""
    tmp = tempfile.mkdtemp(prefix="ozspark_clusterstream_")
    try:
        for i, batch in enumerate(_splits(corpus)):
            dedup_stream.process_batch(spark, batch, i, tmp)
            dedup_stream.update_clusters(spark, tmp, i)
        key = lambda r: (r.doc_id, r.cluster_id, r.cluster_size, r.keep)
        got = sorted(map(key, dedup_stream.read_clusters(spark, tmp).collect()))
        want = sorted(
            map(
                key,
                dedup.dedup_clusters(
                    dedup_stream.read_pairs(spark, tmp).select("doc_a", "doc_b")
                ).collect(),
            )
        )
        assert got == want and got
        mid = sorted(
            map(key, spark.read.parquet(f"{tmp}/labels/batch=1").collect())
        )
        dedup_stream.update_clusters(spark, tmp, 1)  # replay
        assert sorted(
            map(key, spark.read.parquet(f"{tmp}/labels/batch=1").collect())
        ) == mid
        # the replay must not disturb the final state either
        assert sorted(
            map(key, dedup_stream.read_clusters(spark, tmp).collect())
        ) == want
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
