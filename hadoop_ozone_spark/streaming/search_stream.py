"""Rolling BM25 search index: the streaming twin of
``text.bm25_topk``.

A search index IS a write-time artifact — postings (doc, term, tf),
per-term document frequencies, and corpus stats. This module maintains
all three incrementally: each micro-batch of documents lands its own
zone (idempotent overwrite, the span_stream/dedup_stream recipe), with
postings and term-df PARTITIONED BY ``term_bucket = pmod(md5 lane, 64)``
so a query's terms prune to ≤ |terms| buckets instead of scanning the
corpus-sized posting table. Queries then compute the EXACT batch BM25
law over the landed state — stream ≡ batch is pinned in
tests/test_search_stream.py.

State layout under ``state_dir``:
  postings/batch=N/term_bucket=B/  (doc_id, term, tf)
  termdf/batch=N/term_bucket=B/    (term, df)   — per-batch partials
  stats/batch=N/                   (n_docs, total_len)  — 1 row
  doclen/batch=N/                  (doc_id, dl)

At 100 TB: postings are append-only bucketed parquet (the om_keys
layout discipline applied to an inverted index); df/stats fold by SUM
across zones (counts are disjoint per batch — doc_ids never repeat);
a query reads |terms| buckets + the tiny stats zones.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_ozone_spark.datapipe.dedup import md5_lane
from hadoop_ozone_spark.datapipe.text import tokens

TERM_BUCKETS = 64


def _term_bucket(term) -> "F.Column":
    return F.pmod(md5_lane(term), F.lit(TERM_BUCKETS)).cast("int")


def process_doc_batch(
    spark: SparkSession,
    batch: DataFrame,
    batch_id: int,
    state_dir: str,
    text_col: str = "text",
) -> None:
    """Land one batch's index zones (idempotent overwrite)."""
    toks = tokens(F.lower(F.coalesce(F.col(text_col), F.lit(""))))
    tok = batch.select("doc_id", F.explode(toks).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    tf = tf.withColumn("term_bucket", _term_bucket(F.col("term"))).persist()
    (
        tf.write.mode("overwrite")
        .partitionBy("term_bucket")
        .parquet(f"{state_dir}/postings/batch={batch_id}")
    )
    (
        tf.groupBy("term", "term_bucket")
        .agg(F.count(F.lit(1)).alias("df"))
        .write.mode("overwrite")
        .partitionBy("term_bucket")
        .parquet(f"{state_dir}/termdf/batch={batch_id}")
    )
    tf.unpersist()
    batch.select("doc_id", F.size(toks).cast("long").alias("dl")).write.mode(
        "overwrite"
    ).parquet(f"{state_dir}/doclen/batch={batch_id}")
    batch.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(toks)).cast("long").alias("total_len"),
    ).write.mode("overwrite").parquet(f"{state_dir}/stats/batch={batch_id}")


def bm25_query(
    spark: SparkSession,
    state_dir: str,
    queries: tuple[tuple[str, str], ...],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 top-k over the landed index — the exact bm25_topk law
    (per-term integer-ppm quantization, long sum, (score, doc_id)
    ordering), but reading ONLY the query terms' buckets of the
    postings/termdf zones plus the tiny stats/doclen zones."""
    from hadoop_ozone_spark.streaming import zones

    zones.assert_zones_clean(
        spark, state_dir, ("postings", "termdf", "doclen", "stats")
    )
    qterms = spark.createDataFrame(
        sorted({(qid, t) for qid, qtext in queries for t in qtext.lower().split()}),
        "query_id string, term string",
    )
    buckets = sorted(
        {
            r[0]
            for r in qterms.select(_term_bucket(F.col("term"))).distinct().collect()
        }
    )
    postings = (
        spark.read.option("basePath", f"{state_dir}/postings")
        .parquet(f"{state_dir}/postings")
        .filter(F.col("term_bucket").isin(buckets))
    )
    termdf = (
        spark.read.option("basePath", f"{state_dir}/termdf")
        .parquet(f"{state_dir}/termdf")
        .filter(F.col("term_bucket").isin(buckets))
    )
    stats = (
        spark.read.parquet(f"{state_dir}/stats")
        .agg(
            F.sum("n_docs").alias("n_docs"),
            F.sum("total_len").alias("total_len"),
        )
    )
    dl = spark.read.parquet(f"{state_dir}/doclen")
    tf = postings.join(F.broadcast(qterms.select("term").distinct()), "term")
    df_t = termdf.groupBy("term").agg(F.sum("df").alias("df"))
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    norm = F.lit(k1) * (
        F.lit(1.0 - b)
        + F.lit(b)
        * F.col("dl").cast("double")
        * F.col("n_docs")
        / F.col("total_len")
    )
    term_score = idf * (F.col("tf") * F.lit(k1 + 1.0)) / (F.col("tf") + norm)
    scored = (
        tf.join(F.broadcast(df_t), "term")
        .join(F.broadcast(qterms), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "query_id",
            "doc_id",
            F.round(term_score * 1_000_000).cast("long").alias("ppm"),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.sum("ppm").alias("score_ppm"), F.count(F.lit(1)).alias("n_terms"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("score_ppm").desc(), F.col("doc_id").asc()
    )
    return (
        scored.select(
            "query_id",
            "doc_id",
            "score_ppm",
            "n_terms",
            F.row_number().over(w).alias("rank"),
        )
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def run_search_stream(
    docs_stream: DataFrame, state_dir: str, checkpoint_dir: str
):
    """availableNow foreachBatch wiring over a documents stream."""

    def handle(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        process_doc_batch(batch.sparkSession, batch, batch_id, state_dir)

    return (
        docs_stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
