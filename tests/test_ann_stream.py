"""Stream≡batch pins for the rolling IVFPQ index (streaming/ann_stream).

Under one fixed codebook pair the incremental union of per-batch
encodes must equal the full-corpus build, searches over the persisted
incremental index must equal the inline search, and replaying a batch
must be a no-op (landing-zone overwrite)."""

import shutil
import tempfile

from pyspark.sql import functions as F

from hadoop_ozone_spark import model
from hadoop_ozone_spark.datapipe import similarity as sim
from hadoop_ozone_spark.streaming import ann_stream


def test_incremental_index_matches_batch_and_search(spark):
    emb = model.embedding_corpus(spark, "/root/testdata/sf0.001")
    cents = sim.ivf_centroids(emb, 16).localCheckpoint(eager=True)
    cbs = sim.ivfpq_codebooks(emb, cents, seed_start=16).localCheckpoint(
        eager=True
    )
    full = {
        (r.list_id, r.vec_id, tuple(r.codes))
        for r in sim.ivfpq_index(
            emb, centroids=cents, codebooks=cbs
        ).collect()
    }
    tmp = tempfile.mkdtemp(prefix="ozspark_annstream_")
    try:
        bounds = [(0, 20), (20, 45), (45, 10_000_000_000)]
        for i, (lo, hi) in enumerate(bounds):
            b = emb.filter(
                (F.col("vec_id") % 1_000_000 >= lo)
                & (F.col("vec_id") % 1_000_000 < hi)
            )
            ann_stream.process_vec_batch(
                spark, b, i, tmp, cents, cbs
            )
        idx = ann_stream.read_index(spark, tmp)
        got = {
            (r.list_id, r.vec_id, tuple(r.codes)) for r in idx.collect()
        }
        assert got == full and len(got) > 0
        # search over the incremental persisted index ≡ inline search
        inline = [
            (r.vec_id, r.l2_dist)
            for r in sim.ivfpq_topk(
                emb, probe_vec_id=10, k=5, nprobe=4, rerank=200,
                centroids=cents, codebooks=cbs,
            ).collect()
        ]
        over_state = [
            (r.vec_id, r.l2_dist)
            for r in sim.ivfpq_topk(
                emb, probe_vec_id=10, k=5, nprobe=4, rerank=200,
                centroids=cents, codebooks=cbs, index=idx,
            ).collect()
        ]
        assert over_state == inline
        # replaying batch 1 rewrites its zone — union unchanged
        ann_stream.process_vec_batch(
            spark,
            emb.filter(
                (F.col("vec_id") % 1_000_000 >= 20)
                & (F.col("vec_id") % 1_000_000 < 45)
            ),
            1, tmp, cents, cbs,
        )
        replay = {
            (r.list_id, r.vec_id, tuple(r.codes))
            for r in ann_stream.read_index(spark, tmp).collect()
        }
        assert replay == full
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_empty_state_dir_reads_empty_index(spark):
    tmp = tempfile.mkdtemp(prefix="ozspark_annstream_empty_")
    try:
        idx = ann_stream.read_index(spark, f"{tmp}/nothing_here")
        assert idx.count() == 0
        assert set(idx.columns) == {"list_id", "vec_id", "codes"}
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
