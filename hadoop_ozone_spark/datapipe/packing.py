"""Training-mixture sampling and sequence-packing planning — the two
ops that sit between a curated corpus and a training run.

Both are deliberately deterministic (hash-based sampling, in-order
packing) so runs are reproducible and a DuckDB oracle can replay them
value-for-value.

Scale design:
- mixture_sample is map-only — the keep/drop decision is a pure
  function of (doc_id, source); no shuffle, no state, survives any
  corpus size.
- pack_plan needs a running token total, which is a window cumsum. A
  GLOBAL window is a single-partition bottleneck at 100 TB, so packing
  is computed per SHARD (a deterministic doc_id range); shards pack
  independently in parallel and each shard's bins are addressed
  (shard, bin). The only waste is one partially-filled final bin per
  shard — amortized to nothing when shards hold thousands of docs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# 1e6-grain deterministic uniform in [0, 1): the md5-lane trick the
# dedup family uses (engine-portable; dedup.md5_lane docstring)
_GRAIN = 1_000_000


def _lane(col: Column) -> Column:
    """Engine-portable 60-bit hash lane: first 15 hex chars of md5 as a
    long — the ONE construction every hash-derived draw here shares, so
    the DuckDB-oracle equivalence is maintained in a single place."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast("long")


def _uniform01(col: Column) -> Column:
    return (_lane(col) % _GRAIN) / F.lit(float(_GRAIN))


def _split_of(train: float, val: float, seed: str) -> Column:
    """THE split law — the single definition split_assign assigns with
    and split_leakage audits against (a drifted copy would make the
    contamination report silently audit a different law)."""
    u = _uniform01(F.concat(F.lit(seed), F.lit("#"), F.col("doc_id").cast("string")))
    return (
        F.when(u < train, F.lit("train"))
        .when(u < train + val, F.lit("val"))
        .otherwise(F.lit("test"))
    )


def mixture_sample(
    docs: DataFrame,
    weights: dict[str, float],
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Deterministic mixture sampling: keep each doc with its source's
    sampling rate, decided by a hash of the doc id — the standard way a
    training mixture ('20% of source A, 80% of source B') is drawn
    reproducibly over an arbitrarily large corpus.

    Unknown sources default to rate 0.0 (explicit opt-in only).
    Returns the per-source sample accounting: docs/tokens kept and the
    realized rate, which converges on the target by the law of large
    numbers (exactly reproducible, engine-portable hash).
    """
    rate = F.coalesce(
        F.element_at(
            F.create_map(
                *[F.lit(x) for kv in weights.items() for x in kv]
            ),
            F.col(source_col),
        ),
        F.lit(0.0),
    )
    n_tokens = F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    kept = docs.filter(_uniform01(F.col("doc_id")) < rate)
    return (
        kept.groupBy(F.col(source_col).alias("source"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(n_tokens).alias("n_tokens"),
        )
        .orderBy("source")
    )


def pack_plan(
    docs: DataFrame,
    context_len: int = 2048,
    shard_size: int = 10_000,
    text_col: str = "text",
) -> DataFrame:
    """Sequence-packing plan: assign docs, in doc_id order, to
    fixed-size context windows by running token count — the
    concatenate-and-chunk packing GPT-style pretraining uses. A doc
    starting in bin b at offset o is (cum_before % context_len = o,
    floor(cum_before / context_len) = b); docs spanning a boundary
    continue into the next bin (no padding waste inside a shard).

    Packing is per shard = floor(doc_id / shard_size): shards pack
    independently (parallel window, no global sort), each bin addressed
    (shard, bin). Emits one row per bin with its doc span and fill.
    """
    n_tokens = F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    shard = F.floor(F.col("doc_id") / shard_size)
    w = Window.partitionBy("shard").orderBy("doc_id")
    toks = docs.select(
        "doc_id", shard.alias("shard"), n_tokens.alias("n_tokens")
    ).withColumn(
        "cum_before",
        F.coalesce(F.sum("n_tokens").over(w.rowsBetween(Window.unboundedPreceding, -1)), F.lit(0)),
    )
    binned = toks.withColumn("bin", F.floor(F.col("cum_before") / context_len))
    return (
        binned.groupBy("shard", "bin")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("shard", "bin")
    )


def train_order(
    docs: DataFrame, n_shards: int = 8, seed: str = "42"
) -> DataFrame:
    """Deterministic training-order shuffle: assign each doc a shard
    and a position within it by an engine-portable hash of
    (seed, doc_id) — the reproducible global shuffle a training run
    needs between curation and packing. Re-running with the same seed
    reproduces the exact order; changing the seed is a fresh epoch
    permutation.

    Scale: a global ORDER BY would range-partition the whole corpus;
    sharding first makes the sort a per-shard window (same shape as
    pack_plan), so the order is materialized with ordinary parallel
    writes — shard files are the unit a data loader streams.
    """
    lane = _lane(F.concat(F.lit(seed), F.lit("#"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("shard").orderBy("lane", "doc_id")
    return (
        docs.select("doc_id", lane.alias("lane"))
        .withColumn("shard", F.col("lane") % n_shards)
        .select(
            "doc_id",
            "shard",
            F.row_number().over(w).cast("long").alias("pos"),
        )
        .orderBy("shard", "pos")
    )


def split_assign(
    docs: DataFrame,
    train: float = 0.8,
    val: float = 0.1,
    seed: str = "split42",
    text_col: str = "text",
) -> DataFrame:
    """Deterministic train/val/test assignment: each doc lands in one
    split by the hash lane of (seed, doc_id) — disjoint ranges of the
    same engine-portable uniform used by mixture_sample, so membership
    is reproducible, leakage-free (a doc can never be in two splits),
    and independent of row order or partitioning. Returns the per
    (source, split) accounting a dataset card needs.

    Scale: map-only decision + one combinable groupBy.
    """
    split = _split_of(train, val, seed)
    n_tokens = F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    return (
        docs.select(
            F.col("source"), split.alias("split"), n_tokens.alias("n_tokens")
        )
        .groupBy("source", "split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
        )
        .orderBy("source", "split")
    )


def split_leakage(
    docs: DataFrame,
    train: float = 0.8,
    val: float = 0.1,
    seed: str = "split42",
    text_col: str = "text",
) -> DataFrame:
    """Cross-split exact-duplicate leakage report: fingerprints
    (md5 of whitespace-normalized lowercase text — text.fingerprint's
    key) that land in MORE THAN ONE split under the split_assign law.
    A train/test-straddling duplicate is benchmark contamination the
    split hash cannot prevent (it keys on doc_id, not content) — this
    is the audit a dataset card runs after splitting.

    Output: one row per split combination ('train+val', 'test+train+val',
    ...) with the number of leaked fingerprints and the docs involved.

    Scale: one corpus pass projects (fingerprint, split); the only
    shuffle is the map-side-combinable groupBy on fingerprint (md5 —
    uniform, unskewed); split sets per fingerprint are <= 3 elements;
    the combo rollup is a second tiny aggregate.
    """
    from hadoop_ozone_spark.datapipe.text import fingerprint_col

    split = _split_of(train, val, seed)
    per_fp = (
        docs.select(
            fingerprint_col(text_col).alias("fingerprint"), split.alias("split")
        )
        .groupBy("fingerprint")
        .agg(
            F.array_sort(F.collect_set("split")).alias("split_set"),
            F.count(F.lit(1)).alias("n_docs"),
        )
    )
    return (
        per_fp.filter(F.size("split_set") >= 2)
        .select(
            F.array_join("split_set", "+").alias("splits"),
            "n_docs",
        )
        .groupBy("splits")
        .agg(
            F.count(F.lit(1)).alias("n_fingerprints"),
            F.sum("n_docs").alias("n_docs"),
        )
        .orderBy("splits")
    )


def budget_sample(
    docs: DataFrame,
    token_budgets: dict[str, int],
    source_col: str = "source",
    text_col: str = "text",
    seed: str = "budget42",
) -> DataFrame:
    """Token-budget-aware mixture sampling: where mixture_sample takes
    RATES, real mixture specs are usually token BUDGETS ('30M tokens of
    source A'). The sampling rate per source is derived from the
    corpus itself — rate = min(1, budget / total_tokens(source)) — and
    the draw is the same reproducible hash lane, so the realized token
    count converges on the budget without a shuffle of the corpus.

    Two passes: a combinable per-source token-total aggregate (tiny
    result, broadcast back), then the map-only draw + accounting.
    Sources without a budget get 0. Every source PRESENT IN THE CORPUS
    reports a row — n_docs 0 when the draw kept nothing (budget 0 or a
    rate that floors to 0 ppm) — so the output reconciles against the
    spec; sources absent from the corpus have no totals to report.
    rate_ppm is exact-integer: floor(1e6·budget/total), capped at 1e6.
    """
    n_tokens = F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    toks = docs.select(
        F.col(source_col).alias("source"),
        n_tokens.alias("n_tokens"),
        F.col("doc_id"),
    )
    budget = F.coalesce(
        F.element_at(
            F.create_map(
                *[
                    x
                    for k, v in token_budgets.items()
                    for x in (F.lit(k), F.lit(int(v)))
                ]
            ),
            F.col("source"),
        ),
        F.lit(0),
    ).cast("long")
    totals = toks.groupBy("source").agg(
        F.sum("n_tokens").alias("total_tokens")
    )
    # rate in ppm grains: floor(GRAIN·budget/total), capped at GRAIN
    rate_ppm = F.least(
        F.lit(_GRAIN).cast("long"),
        F.expr(f"({_GRAIN} * budget_tokens) div total_tokens"),
    )
    per_source = totals.withColumn("budget_tokens", budget).withColumn(
        "rate_ppm", rate_ppm
    )
    staged = toks.join(F.broadcast(per_source), "source")
    kept = staged.filter(
        (_lane(F.concat(F.lit(seed), F.lit("#"), F.col("doc_id").cast("string")))
         % _GRAIN) < F.col("rate_ppm")
    )
    drawn = kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
    )
    return (
        per_source.join(F.broadcast(drawn), "source", "left")
        .select(
            "source",
            F.coalesce(F.col("n_docs"), F.lit(0)).alias("n_docs"),
            F.coalesce(F.col("n_tokens"), F.lit(0)).alias("n_tokens"),
            "rate_ppm",
            "budget_tokens",
        )
        .orderBy("source")
    )


def stratified_quality_sample(
    docs: DataFrame,
    rates: dict[int, float] | None = None,
    n_strata: int = 10,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Quality-stratified sampling: rank each source's documents into
    ``n_strata`` quality deciles (token count as the quality proxy —
    swap any score column in) and draw each stratum at its own rate —
    the standard curriculum/cleanup shape "keep the best decile whole,
    thin the middle, drop most of the tail" applied per source so one
    domain's length distribution doesn't starve another's.

    Deciles are ntile(n) over (score, doc_id) WITHIN each source — a
    partitioned window (no global sort, no single-partition shuffle;
    the 100 TB partition key is the source/domain, the natural lane a
    web corpus is already laid out on). The draw is the md5-lane
    uniform every sampler here shares, so replays and the DuckDB
    oracle agree bit-for-bit.

    Returns per (source, stratum) accounting: docs/tokens in and kept
    plus the realized rate against the target.
    """
    if rates is None:
        # default curriculum: drop most of the worst, keep the best
        rates = {1: 0.1, 2: 0.1, 3: 0.1, 4: 0.5, 5: 0.5, 6: 0.5, 7: 0.5,
                 8: 1.0, 9: 1.0, 10: 1.0}
    score = F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    rate = F.coalesce(
        F.element_at(
            F.create_map(*[F.lit(x) for kv in rates.items() for x in kv]),
            F.col("stratum"),
        ),
        F.lit(0.0),
    )
    ranked = docs.select(
        F.col(source_col).alias("source"),
        "doc_id",
        score.alias("score"),
        F.ntile(n_strata)
        .over(Window.partitionBy(source_col).orderBy(F.asc(score), F.asc("doc_id")))
        .alias("stratum"),
    ).withColumn("rate", rate).withColumn(
        "kept", _uniform01(F.col("doc_id")) < F.col("rate")
    )
    return (
        ranked.groupBy("source", "stratum")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("kept"), 1).otherwise(0)).alias("n_kept"),
            F.sum(F.when(F.col("kept"), F.col("score")).otherwise(0)).alias(
                "kept_tokens"
            ),
            F.max("rate").alias("target_rate"),
        )
        .withColumn(
            "realized_rate", F.round(F.col("n_kept") / F.col("n_docs"), 6)
        )
        .orderBy("source", "stratum")
    )
