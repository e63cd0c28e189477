"""Torn-zone detection for the per-batch landing-zone state stores.

The four rolling-state twins (span / search / sketch / dedup streams)
share one crash-safety recipe: each micro-batch lands its state as an
idempotent-overwrite parquet zone ``<state_dir>/<plane>/batch=<id>``.
Replay idempotence is pinned by their stream tests; THIS module pins
crash atomicity (VERDICT r8 #6): a zone whose writer died mid-commit
(directory present, ``_SUCCESS`` marker absent) must never be read as
if complete — a partial-but-well-formed file set would silently drop
rows, the one failure mode Spark's own reader cannot see.

Contract: writers rely on Spark's committer writing ``_SUCCESS`` last;
every reader calls :func:`assert_zones_clean` first and FAILS LOUDLY,
naming the torn zone(s); the repair is to replay the owning batch
(``process_*`` with the same batch_id — mode("overwrite") rewrites the
zone wholesale). A replay must therefore be able to run while its OWN
zone is torn: pass ``before_batch`` so the processing view only
asserts the strictly-earlier zones it actually reads. A torn part
file UNDER an intact ``_SUCCESS`` (post-commit corruption) is outside
this check — the parquet footer validation fails that read loudly on
its own (also pinned).

Uses the Hadoop FileSystem API, so the check works on whatever
filesystem the state dir lives on (local in tests, HDFS/object store
at scale); cost is one directory listing per plane — zones are
per-batch, so the listing is tiny next to the read it guards.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _batch_of(name: str) -> int | None:
    if not name.startswith("batch="):
        return None
    try:
        return int(name.split("=", 1)[1])
    except ValueError:
        return None


def torn_zones(
    spark: SparkSession,
    state_dir: str,
    plane: str,
    before_batch: int | None = None,
    only_batch: int | None = None,
) -> list[str]:
    """Paths of ``batch=*`` zone dirs under ``<state_dir>/<plane>``
    missing their ``_SUCCESS`` marker. ``before_batch`` restricts the
    check to strictly-earlier zones (the replaying processor's view);
    ``only_batch`` checks exactly one zone (an explicit input)."""
    jvm = spark._jvm
    base = jvm.org.apache.hadoop.fs.Path(f"{state_dir}/{plane}")
    fs = base.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(base):
        return []
    torn = []
    for st in fs.listStatus(base):
        if not st.isDirectory():
            continue
        b = _batch_of(st.getPath().getName())
        if b is None:
            continue
        if before_batch is not None and b >= before_batch:
            continue
        if only_batch is not None and b != only_batch:
            continue
        marker = jvm.org.apache.hadoop.fs.Path(st.getPath(), "_SUCCESS")
        if not fs.exists(marker):
            torn.append(st.getPath().toUri().getPath())
    return sorted(torn)


def assert_zones_clean(
    spark: SparkSession,
    state_dir: str,
    planes: tuple[str, ...],
    before_batch: int | None = None,
    only_batch: int | None = None,
) -> None:
    """Raise ``ValueError`` naming every torn zone across ``planes``."""
    bad: list[str] = []
    for plane in planes:
        bad.extend(
            torn_zones(spark, state_dir, plane, before_batch, only_batch)
        )
    if bad:
        raise ValueError(
            "torn state zone(s) (missing _SUCCESS — writer died "
            f"mid-commit): {bad}; replay the owning batch "
            "(process with the same batch_id) to repair before reading"
        )
