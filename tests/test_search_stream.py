"""Rolling BM25 search index: the landed zones must answer queries
with EXACTLY the batch bm25_topk law over all docs seen so far
(stream ≡ batch), queries must prune to the query terms' buckets, and
a replayed batch must be a no-op."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from hadoop_ozone_spark import model
from hadoop_ozone_spark.datapipe import text
from hadoop_ozone_spark.streaming import search_stream

QUERIES = (("qa", "hash join"), ("qb", "fast scan"))


def _key(rows):
    return sorted(
        (r.query_id, r.doc_id, r.score_ppm, r.n_terms, r.rank) for r in rows
    )


def test_search_stream_matches_batch_and_replays(spark, sf_dir):
    docs = model.load(spark, sf_dir, "documents").select("doc_id", "text")
    batches = [
        docs.filter(F.col("doc_id") % 3 == i).persist() for i in range(3)
    ]
    tmp = tempfile.mkdtemp(prefix="ozspark_searchstream_")
    try:
        seen = None
        for i, b in enumerate(batches):
            search_stream.process_doc_batch(spark, b, i, tmp)
            seen = b if seen is None else seen.unionByName(b)
            got = _key(
                search_stream.bm25_query(spark, tmp, QUERIES).collect()
            )
            want = _key(text.bm25_topk(seen, queries=QUERIES).collect())
            assert got == want and got, f"batch {i}"
        # replaying a mid-stream batch rewrites its zones byte-identically
        before = got
        search_stream.process_doc_batch(spark, batches[1], 1, tmp)
        assert _key(
            search_stream.bm25_query(spark, tmp, QUERIES).collect()
        ) == before
    finally:
        for b in batches:
            b.unpersist()
        shutil.rmtree(tmp, ignore_errors=True)


def test_search_query_prunes_to_term_buckets(spark, sf_dir):
    docs = model.load(spark, sf_dir, "documents").select("doc_id", "text")
    tmp = tempfile.mkdtemp(prefix="ozspark_searchprune_")
    try:
        search_stream.process_doc_batch(spark, docs, 0, tmp)
        df = search_stream.bm25_query(spark, tmp, QUERIES)
        plan = df._jdf.queryExecution().executedPlan().toString()
        scans = [
            s for s in plan.split("FileScan parquet") if "/postings" in s[:700]
        ]
        assert scans and all("PartitionFilters: [" in s for s in scans)
        # the partition filter must name term_bucket (static IN-list)
        assert any("term_bucket" in s.split("PartitionFilters")[1][:200] for s in scans)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_run_search_stream_wiring(spark, sf_dir):
    docs = model.load(spark, sf_dir, "documents").select("doc_id", "text")
    tmp = tempfile.mkdtemp(prefix="ozspark_searchwire_")
    try:
        docs.write.parquet(f"{tmp}/in")
        stream = spark.readStream.schema("doc_id long, text string").parquet(
            f"{tmp}/in"
        )
        q = search_stream.run_search_stream(stream, f"{tmp}/state", f"{tmp}/ckpt")
        q.awaitTermination(120)
        got = _key(
            search_stream.bm25_query(spark, f"{tmp}/state", QUERIES).collect()
        )
        want = _key(text.bm25_topk(docs, queries=QUERIES).collect())
        assert got == want and got
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
