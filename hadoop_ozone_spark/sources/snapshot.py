"""S5/S9 — snapshot source & sink: the physical layout contract.

The reference bootstraps Recon from an OM RocksDB checkpoint tarball and
then applies deltas (OzoneManagerServiceProviderImpl.java:291-430). Our
snapshot is a parquet table whose layout IS the performance model at
100 TB:

- ``partitionBy(volume, bucket)`` → partition pruning replaces the
  RocksDB prefix seek for any volume/bucket-scoped operator;
- ``sortWithinPartitions(key)`` → parquet min/max row-group statistics
  give in-partition prefix/range skipping (the ``seek(prefix)``
  analogue, SURVEY §4 row 1);
- key-sorted files also make the W1 top-k cut read only leading row
  groups.

``write_snapshot`` is the reference's double-buffer flush (S9,
OzoneManagerDoubleBuffer.java:187-300) re-expressed as an atomic
partition overwrite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_snapshot(
    keys: DataFrame, path: str, mode: str = "overwrite", compression: str = "zstd"
) -> None:
    (
        keys.repartition("volume", "bucket")
        .sortWithinPartitions("key")
        .write.mode(mode)
        .option("compression", compression)  # zstd: ~2× snappy ratio at
        # similar scan speed — at 100 TB the scan is IO-bound, so ratio wins
        .partitionBy("volume", "bucket")
        .parquet(path)
    )


def read_snapshot(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def debug_scan(table: DataFrame, length: int = 100, with_keys: bool = True) -> DataFrame:
    """S6 — ``ozone debug ldb scan`` analogue (DBScanner.java:52-115):
    dump the first ``length`` rows of a column family in key order."""
    cols = table.columns if with_keys else [c for c in table.columns if c != "row_key"]
    order = "row_key" if "row_key" in table.columns else table.columns[0]
    return table.select(*cols).orderBy(order).limit(length)
