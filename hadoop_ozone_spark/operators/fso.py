"""J3 — FSO directory-tree path resolution.

Reference: FSO buckets key rows by ``parentObjectID/name``; resolving a
path walks components one at a time (OMFileRequest.java:901-930), and
listing walks the tree with a DFS stack (KeyManagerImpl.java:2450-2700).

Spark-first inversion: instead of per-lookup walks, MATERIALIZE the
full path for every directory once — an iterative self-join to fixpoint
(depth-bounded loop, one broadcast join per level since the frontier is
the parent level). Every later query is then an ordinary equi-join on
the materialized path. At 100 TB the dir table is ~1e6× smaller than
the file table, so each iteration broadcasts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hadoop_ozone_spark import scratch

ROOT_PARENT = 0  # bucket root sentinel


def materialize_paths(dirs: DataFrame, max_depth: int = 64) -> DataFrame:
    """dirs(object_id, parent_object_id, name) → (object_id, path, depth).

    Iterative fixpoint: level 0 = children of the bucket root; level
    d+1 = dirs whose parent resolved at level d. Terminates when a level
    is empty (or max_depth, guarding cyclic corruption).
    """
    scratch.fresh("materialize_paths")
    # scanned once per level of the fixpoint loop; registered as scratch
    # so the next invocation releases every level's cache (ADVICE-r5
    # pattern — bench runs each FSO query 3x in one session)
    dirs = scratch.keep("materialize_paths", dirs)
    resolved = (
        dirs.filter(F.col("parent_object_id") == ROOT_PARENT)
        .select(
            "object_id",
            F.col("name").alias("path"),
            F.lit(0).alias("depth"),
        )
    )
    frontier = scratch.keep("materialize_paths", resolved)
    for depth in range(1, max_depth):
        parents = frontier.select(
            F.col("object_id").alias("parent_object_id"),
            F.col("path").alias("parent_path"),
        )
        # each frontier is persisted so level d+1's join (and the final
        # union) read the cached level instead of replaying the whole
        # lineage — O(depth) joins, not O(depth²)
        nxt = (
            dirs.join(F.broadcast(parents), "parent_object_id")
            .select(
                "object_id",
                F.concat(F.col("parent_path"), F.lit("/"), F.col("name")).alias("path"),
                F.lit(depth).alias("depth"),
            )
        )
        nxt = scratch.keep("materialize_paths", nxt)
        if nxt.isEmpty():
            break
        resolved = resolved.unionByName(nxt)
        frontier = nxt
    return resolved


def resolve_files(files: DataFrame, dir_paths: DataFrame) -> DataFrame:
    """fileTable rows (parent_object_id, name, ...) → full paths via one
    equi-join against the materialized dir paths.

    Deliberately un-hinted: the dir-path frame grows with the namespace
    (unlike the one-level frontier in materialize_paths), so the
    planner/AQE must stay free to pick a shuffle join once it outgrows
    the broadcast threshold — same discipline as the unigram vocab join
    (datapipe/text.py). At scale, co-partitioning both planes on
    parent_object_id in the snapshot layout removes the Exchange
    entirely; on moderate namespaces AQE still chooses broadcast on its
    own.
    """
    return (
        files.join(
            dir_paths.select(
                F.col("object_id").alias("parent_object_id"),
                F.col("path").alias("dir_path"),
            ),
            "parent_object_id",
        )
        .withColumn("path", F.concat(F.col("dir_path"), F.lit("/"), F.col("name")))
    )


def list_children(
    dirs: DataFrame,
    files: DataFrame,
    parent_object_id: int,
    start_name: str = "",
    limit: int = 1000,
) -> DataFrame:
    """FSO-native listStatus: immediate children of one directory by
    parentObjectID seek — the layout's point: children live under the
    ``parentId/name`` key prefix, so listing is a single bounded range
    scan of dirTable + fileTable (OzoneListStatusHelper; DFS walk
    KeyManagerImpl.java:2450-2700 only for recursive listing), no fake-
    dir synthesis needed (contrast W3 on the flat layout).

    Resume after ``start_name`` (exclusive), name-ordered, capped at
    ``limit`` — a TakeOrdered cut over the parent-pruned scan; the
    parent_object_id filter is a pushed parquet predicate on the
    (bucketed-by-parent at scale) tables.
    """
    child_dirs = dirs.filter(
        F.col("parent_object_id") == parent_object_id
    ).select(
        "name",
        F.lit(True).alias("is_dir"),
        F.lit(0).cast("long").alias("data_size"),
        "object_id",
    )
    child_files = files.filter(
        F.col("parent_object_id") == parent_object_id
    ).select(
        "name",
        F.lit(False).alias("is_dir"),
        F.col("data_size").cast("long").alias("data_size"),
        "object_id",
    )
    return (
        child_dirs.unionByName(child_files)
        .filter(F.col("name") > start_name)
        .orderBy("name")
        .limit(limit)
    )


def rename_dir(
    dirs: DataFrame,
    object_id: int,
    new_parent_object_id: int,
    new_name: str,
    validate: bool = True,
    files: DataFrame | None = None,
    max_depth: int = 64,
) -> DataFrame:
    """FSO directory rename: the layout's headline property — moving a
    whole subtree is ONE dirTable row update (parent pointer + name
    swap, OMKeyRenameRequestWithFSO / OMDirectoryCreateRequestWithFSO
    key shape ``parentId/name``), while the flat layout must rewrite
    every descendant key (operators/mutations.rename_prefix). Every
    descendant's new path then falls out of the next
    ``materialize_paths`` read — no per-key writes.

    ``validate`` enforces the OM's request checks (the reference
    rejects both at request time):

    - the destination parent must not lie inside the moved subtree (a
      cycle would silently orphan the whole subtree from path
      materialization). The check is an O(depth) ANCESTOR WALK of
      ``new_parent_object_id`` — ≤ max_depth parent-pointer point
      lookups, each a pushed predicate on the dir plane — never a
      driver-side materialization of the whole tree: at scale the dir
      plane holds tens of millions of rows, and the cycle test only
      ever needs one root-ward chain of it.
    - ``(parent, name)`` must stay unique across the SHARED
      dir+file keyspace (FSO keys both tables by ``parentId/name`` —
      OMDBDefinition.java:147-172): pass ``files`` to also probe the
      file plane, exactly as OMKeyRenameRequestWithFSO's key-exists
      check does.

    Relationally: a single-row conditional projection over the dir
    plane (map-only, no shuffle); validation adds O(depth) point
    lookups + two point counts.
    """
    if validate and new_parent_object_id != ROOT_PARENT:
        cur = new_parent_object_id
        for _ in range(max_depth):
            if cur == object_id:
                raise ValueError(
                    "rename_dir: destination parent is inside the moved subtree"
                )
            row = (
                dirs.filter(F.col("object_id") == cur)
                .select("parent_object_id")
                .first()
            )
            if row is None:
                if cur == new_parent_object_id:
                    raise ValueError(
                        f"rename_dir: unknown parent {new_parent_object_id}"
                    )
                break  # chain left the dir plane (corrupt edge) — no cycle
            cur = row["parent_object_id"]
            if cur == ROOT_PARENT:
                break
        else:
            raise ValueError(
                f"rename_dir: parent chain exceeds max depth {max_depth} "
                "(cyclic directory table?)"
            )
    if validate:
        clash = dirs.filter(
            (F.col("parent_object_id") == new_parent_object_id)
            & (F.col("name") == new_name)
            & (F.col("object_id") != object_id)
        ).count()
        if not clash and files is not None:
            clash = files.filter(
                (F.col("parent_object_id") == new_parent_object_id)
                & (F.col("name") == new_name)
            ).count()
        if clash:
            raise ValueError(
                f"rename_dir: child named {new_name!r} already exists under "
                f"{new_parent_object_id}"
            )
    hit = F.col("object_id") == object_id
    return dirs.select(
        "object_id",
        F.when(hit, F.lit(new_parent_object_id))
        .otherwise(F.col("parent_object_id"))
        .cast("long")
        .alias("parent_object_id"),
        F.when(hit, F.lit(new_name)).otherwise(F.col("name")).alias("name"),
    )


def prefix_parse(
    dirs: DataFrame,
    files: DataFrame,
    path: str,
    root_parent: int = ROOT_PARENT,
) -> DataFrame:
    """FSO prefix diagnostics — ``ozone debug prefix``
    (tools/.../debug/PrefixParser.java:112-190): walk the path's
    components down the directory table ((parentObjectID, name) links),
    then report the parserStats rollup:

    - VOLUME / BUCKET: 1 each (the tool validates both up front; the
      planes passed in are already bucket-scoped, so both exist);
    - INTERMEDIATE_DIRECTORY: one per RESOLVED component (dumpInfo per
      walk step, :155-158);
    - NON_EXISTENT_DIRECTORY: 1 when a component is missing — the walk
      breaks at the first gap (:139-146);
    - DIRECTORY / FILE: child entries of the LAST RESOLVED directory in
      dirTable / fileTable (dumpTableInfo :195-208), capped at 1000
      (getRangeKVs page size :201).

    Spark shape: the components are driver-known literals, so each walk
    level is a (parent ⋈ name) filter over the broadcast previous level
    (≤1 row); emptiness cascades through the joins, so the whole walk +
    stats is ONE lazy plan — no driver-side stepping. Child counts are
    map-side aggregates behind a 1-row broadcast semi-probe.
    """
    comps = [c for c in path.strip("/").split("/") if c]
    spark = dirs.sparkSession
    levels: list[DataFrame] = []
    cur = dirs.filter(
        (F.col("parent_object_id") == root_parent) & (F.col("name") == comps[0])
    ).select("object_id")
    levels.append(cur)
    for comp in comps[1:]:
        prev = levels[-1].select(F.col("object_id").alias("parent_object_id"))
        cur = (
            dirs.filter(F.col("name") == comp)
            .join(F.broadcast(prev), "parent_object_id")
            .select("object_id")
        )
        levels.append(cur)
    walk = spark.range(1).select(
        F.lit(root_parent).cast("long").alias("object_id"),
        F.lit(0).alias("depth"),
    )
    for i, lvl in enumerate(levels):
        walk = walk.unionByName(
            lvl.select(
                F.col("object_id").cast("long"), F.lit(i + 1).alias("depth")
            )
        )
    resolved = walk.filter(F.col("depth") > 0).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    last = walk.agg(F.max(F.struct("depth", "object_id")).alias("m")).select(
        F.col("m.object_id").alias("last_id")
    )

    def child_count(table: DataFrame) -> DataFrame:
        return (
            table.join(
                F.broadcast(last),
                F.col("parent_object_id") == F.col("last_id"),
                "left_semi",
            )
            .agg(F.least(F.count(F.lit(1)), F.lit(1000)).alias("cnt"))
        )

    one = spark.range(1).agg(F.count(F.lit(1)).alias("cnt"))
    stats = [
        ("VOLUME", one),
        ("BUCKET", one),
        ("INTERMEDIATE_DIRECTORY", resolved),
        (
            "NON_EXISTENT_DIRECTORY",
            resolved.select(
                F.least(F.lit(len(comps)) - F.col("cnt"), F.lit(1)).alias("cnt")
            ),
        ),
        ("DIRECTORY", child_count(dirs)),
        ("FILE", child_count(files)),
    ]
    out = None
    for label, frame in stats:
        row = frame.select(
            F.lit(path).alias("path"),
            F.lit(label).alias("parse_type"),
            F.col("cnt").cast("bigint").alias("cnt"),
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("path", "parse_type")


def namespace_du_fso(dirs: DataFrame, files: DataFrame) -> DataFrame:
    """FSO-native du rollup — NSSummaryTask.java:82-230 walks
    parentObjectID chains to maintain per-directory (numOfFiles,
    sizeOfFiles) including subtrees. Relationally: per-dir DIRECT file
    stats (one combinable groupBy over the file plane), then each dir's
    stats explode onto its ancestor prefixes (O(depth) rows per DIR,
    not per file — the same |dirs|-scaled explode as the flat A3) and
    re-aggregate.
    """
    paths = materialize_paths(dirs)
    direct = files.groupBy(
        F.col("parent_object_id").alias("object_id")
    ).agg(
        F.count(F.lit(1)).alias("num_files"),
        F.sum("data_size").alias("size_of_files"),
    )
    withpath = paths.join(direct, "object_id")
    parts = F.split(F.col("path"), "/")
    ancestors = F.transform(
        F.sequence(F.lit(1), F.size(parts)),
        lambda i: F.array_join(F.slice(parts, 1, i), "/"),
    )
    return (
        withpath.select(
            F.explode(ancestors).alias("path"), "num_files", "size_of_files"
        )
        .groupBy("path")
        .agg(
            F.sum("num_files").alias("num_files"),
            F.sum("size_of_files").alias("size_of_files"),
        )
        .orderBy("path")
    )
