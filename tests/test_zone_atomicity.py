"""Crash-atomicity pins for the four rolling-state stream twins
(VERDICT r8 #6). Replay idempotence is pinned by each twin's own
stream test; here we pin what happens when a writer DIES mid-commit:

- a zone missing its ``_SUCCESS`` marker (the torn-write signature —
  a partial-but-well-formed file set would otherwise read silently
  with missing rows) must FAIL LOUDLY at read time, naming the zone;
- replaying the owning batch must repair the zone (idempotent
  overwrite) and restore the exact pre-crash read;
- a replaying processor must be able to run while its OWN zone is
  torn (the before_batch exclusion — otherwise the repair deadlocks);
- post-commit corruption (truncated part file under an intact
  ``_SUCCESS``) fails loudly through parquet footer validation.
"""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F  # noqa: F401  (fixture parity)

from hadoop_ozone_spark.streaming import (
    dedup_stream,
    search_stream,
    sketch_stream,
    span_stream,
    zones,
)

SENT = "the quick brown fox jumps over the lazy dog again and again "


def _docs(spark, ids):
    rows = [(i, SENT * 3 + f"tail token {i}") for i in ids]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _sketch_land(spark, sd, bid, ids):
    sketch_stream.process_batch(spark, _docs(spark, ids), bid, sd, "text")


def _sketch_read(spark, sd):
    return sorted(
        map(tuple, sketch_stream.read_hll_registers(spark, sd).collect())
    )


def _span_land(spark, sd, bid, ids):
    span_stream.process_doc_batch(spark, _docs(spark, ids), bid, sd)


def _span_read(spark, sd):
    return sorted(map(tuple, span_stream.read_spans(spark, sd).collect()))


def _search_land(spark, sd, bid, ids):
    search_stream.process_doc_batch(spark, _docs(spark, ids), bid, sd)


def _search_read(spark, sd):
    return sorted(
        map(
            tuple,
            search_stream.bm25_query(
                spark, sd, (("q1", "quick fox"),)
            ).collect(),
        )
    )


def _dedup_land(spark, sd, bid, ids):
    dedup_stream.process_batch(spark, _docs(spark, ids), bid, sd)
    dedup_stream.update_clusters(spark, sd, bid)


def _dedup_read(spark, sd):
    return sorted(
        map(tuple, dedup_stream.read_clusters(spark, sd).collect())
    )


def _kmv_land(spark, sd, bid, ids):
    sketch_stream.process_set_batch(spark, _docs(spark, ids), bid, sd, "text")


def _kmv_read(spark, sd):
    return sorted(
        r.h for r in sketch_stream.read_kmv_sketch(spark, sd).collect()
    )


def _mg_read(spark, sd):
    # zone-form fold: the NULL-key sentinel row participates in the
    # determinism check too (str key: None is not orderable vs str)
    return sorted(
        map(tuple, sketch_stream.read_mg_summary(spark, sd).collect()),
        key=str,
    )


FAMILIES = {
    "sketch": (_sketch_land, _sketch_read, "hll"),
    "span": (_span_land, _span_read, "spans"),
    "search": (_search_land, _search_read, "postings"),
    "dedup": (_dedup_land, _dedup_read, "labels"),
    "kmv": (_kmv_land, _kmv_read, "kmv"),
    "mg": (_kmv_land, _mg_read, "mg"),
}


@pytest.mark.parametrize("family", sorted(FAMILIES))
def test_torn_zone_fails_loudly_and_replay_repairs(spark, tmp_path, family):
    land, read, plane = FAMILIES[family]
    sd = str(tmp_path / family)
    land(spark, sd, 0, [1, 2, 3])
    land(spark, sd, 1, [4, 5, 6])
    baseline = read(spark, sd)

    zone = f"{sd}/{plane}/batch=1"
    marker = f"{zone}/_SUCCESS"
    assert os.path.exists(marker)

    # 1. torn write (no _SUCCESS): read fails loudly, naming the zone
    os.remove(marker)
    assert zones.torn_zones(spark, sd, plane) == [zone]
    with pytest.raises(ValueError, match="batch=1"):
        read(spark, sd)

    # 2. replay of the owning batch repairs (idempotent overwrite) —
    # and must be runnable WHILE the zone is torn (before_batch
    # excludes the replayer's own zone from the clean check)
    land(spark, sd, 1, [4, 5, 6])
    assert zones.torn_zones(spark, sd, plane) == []
    assert read(spark, sd) == baseline

    # 3. post-commit corruption (intact _SUCCESS, truncated part
    # files): parquet footer validation fails the read loudly. Every
    # part is truncated — a partition-pruned read (search's bucketed
    # postings) may legitimately never touch a single corrupt file
    parts = glob.glob(f"{zone}/**/part-*.parquet", recursive=True)
    assert parts
    for part in parts:
        with open(part, "wb") as fh:
            fh.write(b"PAR1broken")
    with pytest.raises(Exception):
        read(spark, sd)

    # 4. replay repairs that too
    land(spark, sd, 1, [4, 5, 6])
    assert read(spark, sd) == baseline


def test_update_clusters_refuses_torn_pairs_input(spark, tmp_path):
    # the label roll's INPUT is the pairs zone its process_batch
    # landed — a torn pairs zone means that writer died mid-commit;
    # update_clusters must refuse rather than label a partial graph
    sd = str(tmp_path / "dedup_in")
    _dedup_land(spark, sd, 0, [1, 2, 3])
    dedup_stream.process_batch(spark, _docs(spark, [4, 5, 6]), 1, sd)
    os.remove(f"{sd}/pairs/batch=1/_SUCCESS")
    with pytest.raises(ValueError, match="pairs/batch=1"):
        dedup_stream.update_clusters(spark, sd, 1)
    # replaying the batch repairs, then the roll proceeds
    dedup_stream.process_batch(spark, _docs(spark, [4, 5, 6]), 1, sd)
    dedup_stream.update_clusters(spark, sd, 1)
    assert _dedup_read(spark, sd)


def _vecs(spark, ids):
    rows = [
        (i, [float((i * 7 + d * 3) % 11) / 10.0 + 0.1 for d in range(64)])
        for i in ids
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_ann_stream_torn_code_zone(spark, tmp_path):
    # same contract for the rolling IVFPQ index: a torn code zone fails
    # the index read loudly; replaying the batch repairs it
    from hadoop_ozone_spark.datapipe import similarity
    from hadoop_ozone_spark.streaming import ann_stream

    sd = str(tmp_path / "ann")
    base = _vecs(spark, range(40))
    c = similarity.ivf_centroids(base)
    cb = similarity.ivfpq_codebooks(base, c)
    ann_stream.process_vec_batch(spark, _vecs(spark, range(40, 50)), 0, sd, c, cb)
    ann_stream.process_vec_batch(spark, _vecs(spark, range(50, 60)), 1, sd, c, cb)
    baseline = sorted(
        (r.list_id, r.vec_id, tuple(r.codes))
        for r in ann_stream.read_index(spark, sd).collect()
    )
    os.remove(f"{sd}/codes/batch=1/_SUCCESS")
    with pytest.raises(ValueError, match="codes/batch=1"):
        ann_stream.read_index(spark, sd)
    ann_stream.process_vec_batch(spark, _vecs(spark, range(50, 60)), 1, sd, c, cb)
    got = sorted(
        (r.list_id, r.vec_id, tuple(r.codes))
        for r in ann_stream.read_index(spark, sd).collect()
    )
    assert got == baseline


def test_semantic_stream_refuses_torn_index_input(spark, tmp_path):
    # the semantic-dedup processor's INPUT is the earlier batches'
    # cluster index — refuse a torn zone rather than dedup against a
    # silently partial corpus; replaying the owner repairs
    from hadoop_ozone_spark.datapipe import similarity
    from hadoop_ozone_spark.streaming import semantic_stream

    sd = str(tmp_path / "sem")
    base = _vecs(spark, range(40))
    c = similarity.ivf_centroids(base)
    semantic_stream.process_vec_batch(spark, _vecs(spark, range(40, 50)), 0, sd, c)
    os.remove(f"{sd}/index/batch=0/_SUCCESS")
    with pytest.raises(ValueError, match="index/batch=0"):
        semantic_stream.process_vec_batch(
            spark, _vecs(spark, range(50, 60)), 1, sd, c
        )
    semantic_stream.process_vec_batch(spark, _vecs(spark, range(40, 50)), 0, sd, c)
    semantic_stream.process_vec_batch(spark, _vecs(spark, range(50, 60)), 1, sd, c)
    assert spark.read.parquet(f"{sd}/index").count() > 0


# --- real crash injection through the writeStream entry points --------------
# (VERDICT r9 #8): the torn-zone pins above simulate the crash by
# removing _SUCCESS by hand; these drive run_set_sketch_stream /
# run_sketch_stream with a REAL trigger and kill the writer
# mid-foreachBatch — a poisoned row fails the victim plane's parquet
# job after the first plane committed, which is exactly the
# torn-write signature (directory present, no _SUCCESS). Repair is
# the REAL recovery path too: restart the stream on the same
# checkpoint and let Structured Streaming re-run the failed batch.

from hadoop_ozone_spark.datapipe import sketches  # noqa: E402


def _poison(df, col):
    # evaluating any row raises, so the parquet job dies after task
    # setup — mid-zone, the way a real writer crash lands
    return df.withColumn(
        col,
        F.col(col) + F.raise_error(F.lit("injected mid-batch crash")).cast("long"),
    )


CRASH_STORES = {
    "set_kmv_mg": {
        "runner": lambda st, sd, ck: sketch_stream.run_set_sketch_stream(
            st, sd, ck, "k"
        ),
        "fname": "process_set_batch",
        "victim": "mg",
        "survivor": "kmv",
        "faulty_body": lambda spark, b, bid, sd: (
            sketches.kmv_sketch(b, "k")
            .write.mode("overwrite")
            .parquet(f"{sd}/kmv/batch={bid}"),
            _poison(sketches.mg_zone(b, "k"), "mg_count")
            .write.mode("overwrite")
            .parquet(f"{sd}/mg/batch={bid}"),
        ),
        "read_victim": lambda spark, sd: sketch_stream.read_mg_summary(
            spark, sd
        ).collect(),
        "read_survivor": lambda spark, sd: sketch_stream.read_kmv_sketch(
            spark, sd
        ).collect(),
    },
    "trio_hll_cm": {
        "runner": lambda st, sd, ck: sketch_stream.run_sketch_stream(
            st, sd, ck, "k"
        ),
        "fname": "process_batch",
        "victim": "cm",
        "survivor": "hll",
        "faulty_body": lambda spark, b, bid, sd: (
            sketches.hll_registers(b, "k")
            .write.mode("overwrite")
            .parquet(f"{sd}/hll/batch={bid}"),
            _poison(sketches.cm_counters(b, "k"), "cnt")
            .write.mode("overwrite")
            .parquet(f"{sd}/cm/batch={bid}"),
        ),
        "read_victim": lambda spark, sd: sketch_stream.read_cm_counters(
            spark, sd
        ).collect(),
        "read_survivor": lambda spark, sd: sketch_stream.read_hll_registers(
            spark, sd
        ).collect(),
    },
}


@pytest.mark.parametrize("store", sorted(CRASH_STORES))
def test_writestream_crash_mid_foreachbatch_and_checkpoint_repair(
    spark, tmp_path, store, monkeypatch
):
    cfg = CRASH_STORES[store]
    whole = spark.createDataFrame(
        [(f"k{i % 40}",) for i in range(2000)], "k string"
    )
    src = str(tmp_path / "src")
    whole.repartition(2).write.parquet(src)
    sd, ck = str(tmp_path / "state"), str(tmp_path / "ckpt")

    real = getattr(sketch_stream, cfg["fname"])
    armed = {"on": True}

    def faulty(spark_, batch, bid, state_dir, col):
        if not armed["on"]:
            return real(spark_, batch, bid, state_dir, col)
        armed["on"] = False
        cfg["faulty_body"](spark_, batch, bid, state_dir)

    monkeypatch.setattr(sketch_stream, cfg["fname"], faulty)

    stream = spark.readStream.schema(whole.schema).parquet(src)
    q = cfg["runner"](stream, sd, ck)
    with pytest.raises(Exception, match="injected mid-batch crash"):
        q.awaitTermination(180)

    # the victim zone is genuinely torn by the dying write job —
    # directory present, no _SUCCESS — and its reader fails loudly,
    # naming the zone, while the already-committed plane still reads
    torn = zones.torn_zones(spark, sd, cfg["victim"])
    assert torn and torn[0].endswith(f"{cfg['victim']}/batch=0")
    with pytest.raises(ValueError, match=f"{cfg['victim']}/batch=0"):
        cfg["read_victim"](spark, sd)
    assert cfg["read_survivor"](spark, sd)

    # REAL repair path: restart the stream on the same checkpoint;
    # Structured Streaming re-runs the failed batch, the idempotent
    # overwrite rewrites the torn zone wholesale
    stream2 = spark.readStream.schema(whole.schema).parquet(src)
    q2 = cfg["runner"](stream2, sd, ck)
    q2.awaitTermination(180)
    assert zones.torn_zones(spark, sd, cfg["victim"]) == []

    if store == "set_kmv_mg":
        folded = sorted(
            r.h for r in sketch_stream.read_kmv_sketch(spark, sd).collect()
        )
        direct = sorted(r.h for r in sketches.kmv_sketch(whole, "k").collect())
        assert folded == direct
        zone = sketch_stream.read_mg_summary(spark, sd).collect()
        truth = {r.k: r["count"] for r in whole.groupBy("k").count().collect()}
        bound = zone[0].mg_threshold
        for r in zone:
            if r.key is not None:
                assert r.mg_count <= truth[r.key] <= r.mg_count + bound
    else:
        folded = {
            (r.row, r.bucket): r.cnt
            for r in sketch_stream.read_cm_counters(spark, sd).collect()
        }
        direct = {
            (r.row, r.bucket): r.cnt
            for r in sketches.cm_counters(whole, "k").collect()
        }
        assert folded == direct
