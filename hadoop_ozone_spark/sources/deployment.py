"""Deployment read path: the materialized namespace snapshot.

The reference's serving architecture is materialize-then-serve: Recon
bootstraps a local copy of the OM DB from a checkpoint tarball, then
answers every query from that copy, applying deltas as they stream in
(OzoneManagerServiceProviderImpl.java:291-430). The TPC-H shim in
``model`` stands in for the checkpoint; THIS module is the bootstrap —
it materializes every derived plane ONCE into the physical layout that
ARCHITECTURE.md specifies and ``tools/scale_probe.py`` measures, and
the query layer (``model``) reads the materialized tables whenever the
``SPARK_GRAFT_SNAPSHOT_DIR`` flag points at a built snapshot:

- ``om_keys``: ``partitionBy(volume, bucket)`` + key-sorted files →
  partition pruning + row-group prefix skipping (the RocksDB seek
  analogues, SURVEY §4);
- ``om_keys_by_container`` + ``containers`` + ``container_replicas``:
  ``bucketBy(32, container_id)`` catalog tables → the J1/J2/J4
  container joins and aggregations run with ZERO shuffle Exchanges
  (co-located, the ContainerKeyMapper inverted-index layout);
- every other plane as plain parquet.

At 100 TB the same two layouts are the design: the namespace sorted
within (volume, bucket) partitions, and the container index bucketed
on container_id so replica/health/key-listing joins co-locate. Bucket
count scales with the cluster (32 here ≈ local cores; ~4096 at 1000
executors) — the invariant is both join sides share it.

Parquet planes persist across sessions (guarded by _SUCCESS + a
source-marker). Bucketed tables are session-catalog entries over
external parquet paths; registration re-runs the cheap DDL per
session, rewriting the files only when absent.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SNAPSHOT_ENV = "SPARK_GRAFT_SNAPSHOT_DIR"
BUCKETS = 32

# Bump when any plane's schema/derivation changes: the marker embeds it,
# so a snapshot written by an older layout reads as not-built and is
# rebuilt instead of serving stale columns (e.g. datanodes.op_state and
# audit_log resource paths, round 4; rm/close/delete-plane detail views
# incl. the DELETING lane, pipeline_details, and the bucketed
# deleted_block_txns + rm planes, round 5).
# v8 (optimization r14, guide §6): bucketed planes are repartitioned by
# the bucket key before the write so each bucket lands in ONE file —
# the previous layout wrote (writer partitions × buckets) files (1025
# for an 8.3 MB rm_replicas plane at sf0.1), and every scan of the
# plane paid ~0.45s of per-file open overhead PER ACTION across the
# whole scm query family.
LAYOUT_VERSION = 8

# plane name → model builder attribute; every derived table the query
# layer can route to the snapshot
PLANES = (
    "om_keys",
    "om_buckets",
    "om_events",
    "containers",
    "container_replicas",
    "rm_replicas",
    "rm_container_details",
    "rm_replica_details",
    "replica_observations",
    "deleted_block_txns",
    "datanodes",
    "pipelines",
    "pipeline_details",
    "pipeline_members",
    "audit_log",
    "dedup_corpus",
    "embedding_corpus",
    "fso_dirs",
    "fso_files",
)

BUCKETED = {
    "om_keys_by_container": "om_keys",
    "containers_bucketed": "containers",
    "container_replicas_bucketed": "container_replicas",
    # the deleted-block log joins replicas/containers on container_id
    # in every d2 scan — same bucketing co-locates that join too
    "deleted_block_txns_bucketed": "deleted_block_txns",
    # the ReplicationManager planes: every rm1/rm3/rm4 stage is a
    # container-keyed window or rollup, so bucketing removes the one
    # remaining fact Exchange from the action planners
    "rm_replicas_bucketed": "rm_replicas",
    "rm_replica_details_bucketed": "rm_replica_details",
}


def snapshot_dir() -> str | None:
    return os.environ.get(SNAPSHOT_ENV) or None


def _marker_path(base: str) -> str:
    return os.path.join(base, "_SOURCE_SF_DIR")


def is_built(base: str, sf_dir: str) -> bool:
    """A snapshot is usable iff its source marker matches the sf_dir
    being queried — a snapshot of sf0.1 must never serve sf0.01."""
    try:
        with open(_marker_path(base)) as fh:
            return fh.read().strip() == f"{os.path.normpath(sf_dir)}@v{LAYOUT_VERSION}"
    except OSError:
        return False


def plane_path(base: str, name: str) -> str:
    return os.path.join(base, name)


def read_plane(spark: SparkSession, sf_dir: str, name: str) -> DataFrame | None:
    """The query layer's routing hook: the materialized plane when the
    snapshot flag is on and built for this sf_dir, else None (caller
    derives from the shim). Bucketed planes resolve via the session
    catalog so Spark keeps their co-location metadata."""
    base = snapshot_dir()
    if base is None or not is_built(base, sf_dir):
        return None
    if name in BUCKETED:
        if spark.catalog.tableExists(name):
            return spark.table(name)
        return None
    path = plane_path(base, name)
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        return None
    return spark.read.parquet(path)


def build_snapshot(spark: SparkSession, sf_dir: str, base: str) -> dict[str, float]:
    """Materialize every plane from the shim derivation. Idempotent:
    skips planes whose _SUCCESS exists when the marker matches.
    Returns per-plane build seconds."""
    from hadoop_ozone_spark import model
    from hadoop_ozone_spark.sources.snapshot import write_snapshot

    os.makedirs(base, exist_ok=True)
    fresh = not is_built(base, sf_dir)
    timings: dict[str, float] = {}
    for name in PLANES:
        path = plane_path(base, name)
        if not fresh and os.path.exists(os.path.join(path, "_SUCCESS")):
            continue
        t0 = time.time()
        df = getattr(model, f"_build_{name}", None)
        df = df(spark, sf_dir) if df is not None else getattr(model, name)(spark, sf_dir)
        if name == "om_keys":
            write_snapshot(df, path)  # partitionBy(volume,bucket), key-sorted
        else:
            df.write.mode("overwrite").option("compression", "zstd").parquet(path)
        timings[name] = round(time.time() - t0, 3)
    with open(_marker_path(base), "w") as fh:
        fh.write(f"{os.path.normpath(sf_dir)}@v{LAYOUT_VERSION}")
    return timings


def register_bucketed(
    spark: SparkSession, sf_dir: str, base: str, force: bool = False
) -> dict[str, float]:
    """Create the container-co-located bucketed tables in the session
    catalog (external parquet under the snapshot dir). Files are
    rewritten only when absent (or when ``force`` says the snapshot was
    rebuilt for a new layout version); registration itself is cheap DDL
    that must run once per session (the in-memory catalog does not
    persist)."""
    from hadoop_ozone_spark import model

    timings: dict[str, float] = {}
    for table, source in BUCKETED.items():
        path = plane_path(base, table)
        t0 = time.time()
        if force:
            spark.sql(f"DROP TABLE IF EXISTS {table}")
        elif spark.catalog.tableExists(table):
            continue
        if not force and os.path.exists(os.path.join(path, "_SUCCESS")):
            # register the existing bucketed files without rewriting
            src_df = getattr(model, source)(spark, sf_dir)
            cols = ", ".join(
                f"`{f.name}` {f.dataType.simpleString()}" for f in src_df.schema.fields
            )
            spark.sql(
                f"CREATE TABLE {table} ({cols}) USING parquet "
                f"OPTIONS (path '{path}') "
                f"CLUSTERED BY (container_id) SORTED BY (container_id) "
                f"INTO {BUCKETS} BUCKETS"
            )
        else:
            (
                getattr(model, source)(spark, sf_dir)
                # ONE file per bucket (guide §6): repartition by the
                # bucket key with numPartitions == numBuckets — the
                # repartition hash (pmod(murmur3, n)) IS the bucket-id
                # function, so each writer task holds exactly one
                # bucket. Without this the write fans out to (writer
                # partitions × buckets) tiny files and every scan pays
                # the per-file open cost per action.
                .repartition(BUCKETS, F.col("container_id"))
                .write.mode("overwrite")
                .option("path", path)
                .option("compression", "zstd")
                .bucketBy(BUCKETS, "container_id")
                .sortBy("container_id")
                .saveAsTable(table)
            )
        timings[table] = round(time.time() - t0, 3)
    return timings


def ensure_snapshot(spark: SparkSession, sf_dir: str, base: str) -> dict[str, float]:
    """Build-if-missing + register: the bench/deployment warmup step.
    Sets the routing flag so subsequent ``model`` loads read the
    snapshot. Returns build timings (empty when everything existed)."""
    fresh = not is_built(base, sf_dir)
    timings = build_snapshot(spark, sf_dir, base)
    timings.update(register_bucketed(spark, sf_dir, base, force=fresh))
    os.environ[SNAPSHOT_ENV] = base
    return timings
