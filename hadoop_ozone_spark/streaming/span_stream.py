"""Rolling-ingest duplicated-span detection: the streaming twin of
``dedup.dup_spans_incremental``.

Each micro-batch of documents is span-checked against the positional
gram index accumulated from EARLIER batches plus the batch itself
(delta-vs-corpus and delta-vs-delta sharing), then the batch's own
grams are APPENDED to the index — per-batch cost is
O(|batch grams| + matched grams), never a corpus re-scan, matching
the repo's delta-driven doctrine (minhash delta probe, semantic-dedup
stream, rolling IVFPQ encode).

Stream≡batch (pinned by test_span_stream): for every batch i,

    spans(batch_i) = dup_spans(docs of batches 0..i) ⨝ batch_i ids

— the delta-perspective law of dup_spans_incremental. Later batches
can still duplicate an EARLIER batch's text; re-cleaning old docs is
the periodic full pass's concern, exactly as in minhash incremental.

Crash-safety follows dedup_stream's recipe: per-batch landing zones
keyed by batch subdirectory (replays rewrite, never double-append).
The gram-index reader keeps only STRICTLY EARLIER batches' zones, so
a batch never sees its own grams as corpus (a self-hit would mark
every position shared) and a replayed batch recomputes against
exactly the index it originally saw even when later batches have
landed since — replay is bytewise idempotent (pinned).

At 100 TB the gram index is the heavy state: each batch zone lands
PARTITIONED BY ``gram_bucket = pmod(gram, SPAN_GRAM_BUCKETS)``, so an
incremental probe reads only the buckets the delta's grams hash into
(static partition pruning — the bucket set is bounded by the constant
SPAN_GRAM_BUCKETS, so deriving it is a bounded collect, the
sources/upsert.py precedent). A small delta touches a few buckets; a
corpus-wide delta touches all of them — either way the probe is
index-subset-bounded, never an index re-scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_ozone_spark.datapipe.dedup import (
    DUP_SPAN_K,
    DUP_SPAN_MIN_TOKENS,
    dup_spans_incremental,
    positional_gram_table,
)

GRAMS_SCHEMA = "doc_id long, pos int, gram long, gram_bucket int"

# gram-hash partition fan-out of each landed batch zone; bounds both
# the directory count per zone and the probe's bucket-list collect
SPAN_GRAM_BUCKETS = 64


def read_gram_index(
    spark: SparkSession, state_dir: str, before_batch: int | None = None
) -> DataFrame:
    """The accumulated positional gram index (doc_id, pos, gram).
    ``before_batch`` keeps only zones of STRICTLY EARLIER batches —
    the processing view: a batch never sees its own grams as corpus
    (a self-hit would mark every position shared), and a REPLAYED
    batch recomputes against exactly the index it originally saw even
    if later batches have landed since (replay idempotence pin)."""
    from pyspark.errors import AnalysisException

    from hadoop_ozone_spark.streaming import zones

    # crash atomicity: a half-committed gram zone would silently feed a
    # partial corpus into the span check — fail loudly instead; the
    # replaying batch's own (being-rewritten) zone is excluded via
    # before_batch
    zones.assert_zones_clean(
        spark, state_dir, ("grams",), before_batch=before_batch
    )
    try:
        df = (
            spark.read.option("basePath", f"{state_dir}/grams")
            .parquet(f"{state_dir}/grams")
        )
    except AnalysisException as e:
        if "PATH_NOT_FOUND" in str(e) or "Path does not exist" in str(e):
            return spark.createDataFrame([], GRAMS_SCHEMA)
        raise
    if before_batch is not None:
        df = df.filter(F.col("batch") < before_batch)
    if "gram_bucket" not in df.columns:
        # State dirs written before the bucketed zone format (round 7)
        # carry no gram_bucket column/partition — derive it so replay
        # over an old state dir stays bytewise-idempotent (ADVICE r7).
        df = df.withColumn(
            "gram_bucket",
            F.pmod(F.col("gram"), F.lit(SPAN_GRAM_BUCKETS)).cast("int"),
        )
    return df.select("doc_id", "pos", "gram", "gram_bucket")


def process_doc_batch(
    spark: SparkSession,
    batch: DataFrame,
    batch_id: int,
    state_dir: str,
    text_col: str = "text",
    k: int = DUP_SPAN_K,
    min_tokens: int = DUP_SPAN_MIN_TOKENS,
    portable: bool = False,
) -> None:
    """One micro-batch: span-check the new docs against the
    accumulated index, land the spans, append the batch's grams.

    The batch's gram frame is built ONCE (scratch-barriered — see
    positional_gram_table's O(tokens²·k) note) and shared by the span
    check and the landing write."""
    from hadoop_ozone_spark import scratch

    scratch.fresh("span_stream_batch")
    grams = scratch.keep(
        "span_stream_batch",
        positional_gram_table(
            batch, text_col, k, portable, scratch_tag="span_stream_batch"
        ),
    )
    index = read_gram_index(spark, state_dir, before_batch=batch_id)
    spans = dup_spans_incremental(
        None, batch, text_col, k, min_tokens, portable,
        corpus_grams=index, delta_grams=grams,
    )
    spans.write.mode("overwrite").parquet(f"{state_dir}/spans/batch={batch_id}")
    (
        grams.withColumn(
            "gram_bucket",
            F.pmod(F.col("gram"), F.lit(SPAN_GRAM_BUCKETS)).cast("int"),
        )
        .write.mode("overwrite")
        .partitionBy("gram_bucket")
        .parquet(f"{state_dir}/grams/batch={batch_id}")
    )


def read_spans(spark: SparkSession, state_dir: str) -> DataFrame:
    """Every landed batch's delta-perspective spans."""
    from pyspark.errors import AnalysisException

    from hadoop_ozone_spark.streaming import zones

    zones.assert_zones_clean(spark, state_dir, ("spans",))
    try:
        return (
            spark.read.option("basePath", f"{state_dir}/spans")
            .parquet(f"{state_dir}/spans")
            .select("doc_id", "span_start", "span_end", "span_tokens", "n_seeds")
        )
    except AnalysisException as e:
        if "PATH_NOT_FOUND" in str(e) or "Path does not exist" in str(e):
            return spark.createDataFrame(
                [],
                "doc_id long, span_start int, span_end int, "
                "span_tokens int, n_seeds long",
            )
        raise


def run_span_ingest_stream(
    doc_stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
):
    """foreachBatch driver wiring ``process_doc_batch`` to a document
    stream — the deployment entry point."""

    def handle(batch: DataFrame, batch_id: int) -> None:
        process_doc_batch(
            batch.sparkSession, batch, batch_id, state_dir, text_col
        )

    return (
        doc_stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
