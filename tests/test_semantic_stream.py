"""Stream≡batch pin for the semantic dedup stream."""
import shutil, tempfile

from pyspark.sql import functions as F

from hadoop_ozone_spark import model
from hadoop_ozone_spark.datapipe import similarity as sim
from hadoop_ozone_spark.streaming import semantic_stream


def test_semantic_stream_matches_batch(spark):
    emb = model.embedding_corpus(spark, "/root/testdata/sf0.001")
    cents = sim.ivf_centroids(emb, 16).localCheckpoint(eager=True)
    batch_ref = {
        (r.vec_id, r.dup_of, r.cosine_sim)
        for r in sim.semantic_dedup_pairs(
            emb, n_lists=16, threshold=0.9, centroids=cents
        ).collect()
    }
    tmp = tempfile.mkdtemp(prefix="ozspark_semstream_")
    try:
        # three vec_id-ordered micro-batches covering the corpus
        bounds = [(0, 20), (20, 45), (45, 10_000_000_000)]
        for i, (lo, hi) in enumerate(bounds):
            b = emb.filter((F.col("vec_id") % 1_000_000 >= lo)
                           & (F.col("vec_id") % 1_000_000 < hi))
            # copies (vec_id+1e6) must ride with their base batch so
            # arrival stays vec_id-ordered per identity lane
            semantic_stream.process_vec_batch(
                spark, b, i, tmp, cents, threshold=0.9
            )
        got = {
            (r.vec_id, r.dup_of, r.cosine_sim)
            for r in spark.read.parquet(f"{tmp}/pairs").drop("batch").collect()
        }
        assert got == batch_ref and len(got) > 0
        # replaying a batch is a no-op for the union of outputs
        semantic_stream.process_vec_batch(spark, emb.filter(
            (F.col("vec_id") % 1_000_000 >= 20) & (F.col("vec_id") % 1_000_000 < 45)
        ), 1, tmp, cents, threshold=0.9)
        replay = {
            (r.vec_id, r.dup_of, r.cosine_sim)
            for r in spark.read.parquet(f"{tmp}/pairs").drop("batch").collect()
        }
        assert replay == batch_ref
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
