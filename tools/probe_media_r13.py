"""Phase decomposition of the media near-dup / dup-clusters plane at
sf0.1 (guide §1: isolate the expensive query; time computation, not
sink). Prints per-phase seconds + whether the scratch cache hits."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from hadoop_ozone_spark import model, scratch  # noqa: E402
from hadoop_ozone_spark.datapipe import dedup as dedup_ops  # noqa: E402
from hadoop_ozone_spark.datapipe import multimodal as mm  # noqa: E402
from hadoop_ozone_spark.session import get_spark  # noqa: E402
from hadoop_ozone_spark.sources import deployment  # noqa: E402


def timed(label, thunk):
    t0 = time.time()
    v = thunk()
    print(f"## {label}: {time.time()-t0:.2f}s -> {v}", flush=True)
    return v


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("probe-media")
    sc = spark.sparkContext
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    base = os.path.join(repo, ".snapshot", os.path.basename(sf_dir.rstrip("/")))
    deployment.ensure_snapshot(spark, sf_dir, base)
    model.clear_derived_cache()

    docs = model.load(spark, sf_dir, "documents")
    thumbs = mm.synthesize_thumbnails(docs)
    sc.setJobDescription("thumbs count")
    timed("thumbs count", thumbs.count)

    # raw hash pass, no persist: the pure codegen cost, twice
    hf = mm.media_dhash_frame(thumbs)
    for i in range(3):
        sc.setJobDescription(f"hash pass noop {i}")
        timed(f"hash pass (uncached) run{i}", lambda: hf.write.format("noop").mode("overwrite").save())

    # routed frame (what the queries call): builds + null-count
    for i in range(3):
        sc.setJobDescription(f"routed build {i}")
        routed = timed(f"media_dhash_frame_routed call {i}", lambda: mm.media_dhash_frame_routed(thumbs, "media_near_dup"))
        sc.setJobDescription(f"routed count {i}")
        timed(f"routed count {i}", routed.count)

    hashes = mm.media_dhash_frame_routed(thumbs, "media_near_dup")
    for i in range(2):
        sc.setJobDescription(f"band pairs {i}")
        bp = mm._hash_band_pairs(hashes, 3)
        timed(f"band pairs count {i}", bp.count)

    # clusters decomposition
    scratch.fresh("media_dup_clusters")
    hashes2 = timed("clusters: routed frame", lambda: mm.media_dhash_frame_routed(thumbs, "media_dup_clusters"))
    classes = scratch.keep(
        "media_dup_clusters",
        hashes2.groupBy("dhash").agg(F.min("doc_id").alias("rep")),
    )
    sc.setJobDescription("classes count")
    timed("classes count", classes.count)
    rep_edges = mm._hash_band_pairs(
        classes.select(F.col("rep").alias("doc_id"), "dhash"), 3
    )
    sc.setJobDescription("rep_edges count")
    timed("rep_edges count", rep_edges.count)

    # CC with per-round timing (inline copy of dedup_clusters loop)
    sc.setJobDescription("cc loop")
    t0 = time.time()
    sym = rep_edges.select(
        F.col("doc_a").alias("node"), F.col("doc_b").alias("nbr")
    ).unionByName(
        rep_edges.select(F.col("doc_b").alias("node"), F.col("doc_a").alias("nbr"))
    )
    scratch.fresh("probe_cc")
    edges = scratch.keep("probe_cc", sym)
    labels = scratch.keep(
        "probe_cc",
        edges.groupBy("node").agg(
            F.least(F.col("node"), F.min("nbr")).alias("label")
        ),
    )
    timed("cc init (edges+labels)", labels.count)
    prev = None
    for r in range(20):
        tr = time.time()
        prop = (
            edges.join(
                labels.select(F.col("node").alias("nbr"), F.col("label").alias("nbr_label")),
                "nbr",
            )
            .groupBy("node")
            .agg(F.min("nbr_label").alias("nbr_label"))
        )
        folded = labels.join(prop, "node", "left").select(
            "node",
            "label",
            F.least(F.col("label"), F.coalesce("nbr_label", F.col("label"))).alias("mid_label"),
        )
        lmap = folded.select(
            F.col("mid_label").alias("jump"), F.col("node").alias("mid_label")
        )
        stepped = folded.join(lmap, "mid_label", "left").select(
            "node",
            "label",
            F.least(F.col("mid_label"), F.coalesce("jump", F.col("mid_label"))).alias("new_label"),
        ).localCheckpoint()
        changed = stepped.filter(F.col("new_label") < F.col("label")).count()
        print(f"## cc round {r}: {time.time()-tr:.2f}s changed={changed}", flush=True)
        if prev is not None:
            prev.unpersist()
        prev = stepped
        labels = stepped.select("node", F.col("new_label").alias("label"))
        if changed == 0:
            break
    print(f"## cc total: {time.time()-t0:.2f}s", flush=True)

    # label/size tail
    tr = time.time()
    cc_lab = labels.select(F.col("node").alias("rep"), F.col("label").alias("cluster_id"))
    rep_label = classes.join(cc_lab, "rep", "left").select(
        "dhash", F.coalesce("cluster_id", F.col("rep")).alias("cluster_id")
    )
    labeled = hashes2.join(rep_label, "dhash").select("doc_id", "cluster_id")
    sizes = labeled.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("cluster_size"))
    out = labeled.join(sizes, "cluster_id").select(
        "doc_id", "cluster_id", "cluster_size",
        (F.col("doc_id") == F.col("cluster_id")).alias("keep"),
    )
    sc.setJobDescription("label tail")
    timed("label/size tail count", out.count)

    # full query twice for reference
    from hadoop_ozone_spark.plans import datapipe_queries as dq
    for i in range(2):
        sc.setJobDescription(f"full clusters {i}")
        timed(f"dp_media_dup_clusters full {i}", lambda: dq.QUERIES["dp_media_dup_clusters"](spark, sf_dir).count())
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
