"""Stream≡batch pins for the rolling duplicated-span detector
(streaming/span_stream): every batch's landed spans equal the batch
dup_spans over all docs seen so far restricted to that batch's ids,
and replaying a batch is a no-op (landing-zone overwrite + self-zone
exclusion in the index reader)."""

import shutil
import tempfile

from pyspark.sql import functions as F

from hadoop_ozone_spark import model
from hadoop_ozone_spark.datapipe import dedup
from hadoop_ozone_spark.streaming import span_stream


def _collect_spans(df):
    return sorted(
        (r.doc_id, r.span_start, r.span_end, r.span_tokens, r.n_seeds)
        for r in df.collect()
    )


def test_span_stream_matches_batch_and_replays(spark):
    corpus = model.dedup_corpus(spark, "/root/testdata/sf0.001").limit(240)
    bounds = [(0, 40), (40, 120), (120, 10_000_000_000)]
    batches = [
        corpus.filter(
            (F.col("doc_id") % 1_000_000 >= lo)
            & (F.col("doc_id") % 1_000_000 < hi)
        )
        for lo, hi in bounds
    ]
    tmp = tempfile.mkdtemp(prefix="ozspark_spanstream_")
    try:
        seen = None
        expected = []
        for i, b in enumerate(batches):
            span_stream.process_doc_batch(spark, b, i, tmp)
            seen = b if seen is None else seen.unionByName(b)
            ids = {r.doc_id for r in b.select("doc_id").collect()}
            expected += [
                t
                for t in _collect_spans(dedup.dup_spans(seen))
                if t[0] in ids
            ]
        got = _collect_spans(span_stream.read_spans(spark, tmp))
        assert got == sorted(expected) and len(got) > 0

        # replaying batch 1 must not change the union: its zone is
        # overwritten and the index reader excludes its own grams
        span_stream.process_doc_batch(spark, batches[1], 1, tmp)
        replay = _collect_spans(span_stream.read_spans(spark, tmp))
        assert replay == got
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_gram_index_reads_pre_bucketed_state_dirs(spark):
    # ADVICE r7: state dirs written before the round-7 bucketed zone
    # format carry no gram_bucket partition — the reader must derive
    # it (pmod law) instead of failing the select on replay
    tmp = tempfile.mkdtemp(prefix="ozspark_spanstream_legacy_")
    try:
        legacy = spark.createDataFrame(
            [(1, 0, 7), (1, 1, -3), (2, 0, 64)],
            "doc_id long, pos int, gram long",
        )
        legacy.write.parquet(f"{tmp}/grams/batch=0")
        got = {
            (r.doc_id, r.pos, r.gram): r.gram_bucket
            for r in span_stream.read_gram_index(spark, tmp).collect()
        }
        n = span_stream.SPAN_GRAM_BUCKETS
        assert got == {
            (1, 0, 7): 7 % n,
            (1, 1, -3): (-3) % n,  # pmod: non-negative for negative grams
            (2, 0, 64): 64 % n,
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_span_stream_empty_state_reads_empty(spark):
    import tempfile as _t

    tmp = _t.mkdtemp(prefix="ozspark_spanstream_empty_")
    try:
        assert span_stream.read_spans(spark, tmp).count() == 0
        assert span_stream.read_gram_index(spark, tmp).count() == 0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_span_stream_foreachbatch_end_to_end(spark):
    """Drive the real writeStream/foreachBatch wiring (availableNow)
    over a file stream of documents."""
    import os

    corpus = model.dedup_corpus(spark, "/root/testdata/sf0.001").limit(120)
    tmp = tempfile.mkdtemp(prefix="ozspark_spanstream_e2e_")
    try:
        src = os.path.join(tmp, "src")
        corpus.coalesce(1).write.parquet(src)  # one file → one batch
        doc_stream = spark.readStream.schema(corpus.schema).parquet(src)
        q = span_stream.run_span_ingest_stream(
            doc_stream, os.path.join(tmp, "state"), os.path.join(tmp, "ckpt")
        )
        q.awaitTermination(120)
        got = _collect_spans(
            span_stream.read_spans(spark, os.path.join(tmp, "state"))
        )
        expected = _collect_spans(dedup.dup_spans(corpus))
        assert got == expected and len(got) > 0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_gram_index_bucket_pruned_probe(spark):
    """The landed gram index is partitioned by gram_bucket and the
    incremental probe pushes the delta's bucket set into the scan as a
    partition filter (reads only matching bucket dirs)."""
    import tempfile, shutil, os

    from hadoop_ozone_spark.datapipe.dedup import dup_spans_incremental

    tmp = tempfile.mkdtemp(prefix="spanbkt_")
    try:
        base = spark.createDataFrame(
            [(i, "alpha beta gamma delta " * 6 + f"tail{i}") for i in range(8)],
            "doc_id long, text string",
        )
        span_stream.process_doc_batch(spark, base, 0, tmp)
        # physical layout: bucket subdirectories under the zone
        zone = os.path.join(tmp, "grams", "batch=0")
        assert any(d.startswith("gram_bucket=") for d in os.listdir(zone))

        delta = spark.createDataFrame(
            [(100, "alpha beta gamma delta " * 6 + "fresh")],
            "doc_id long, text string",
        )
        index = span_stream.read_gram_index(spark, tmp, before_batch=1)
        assert "gram_bucket" in index.columns
        spans = dup_spans_incremental(None, delta, corpus_grams=index)
        plan = spans._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan and "gram_bucket" in plan
        # and the law still holds: the delta duplicates the corpus text
        got = spans.collect()
        assert len(got) == 1 and got[0].doc_id == 100
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
