"""hadoop_ozone_spark — a PySpark-native analytics engine with the query
surface of Apache Ozone (reference: apache/hadoop-ozone @ /root/reference).

Not a port: the reference is a Java object store whose "queries" are
RocksDB prefix scans, hand-rolled aggregations (Recon), and an internal
CDC feed. Here every operator is re-expressed as a declarative
DataFrame/SQL program so Catalyst + Tungsten pick the physical plan, and
the design assumes a 1000-executor cluster over ~100 TB:

- namespace tables partitioned by ``(volume, bucket)`` and sorted by
  ``key`` at write time → partition pruning + parquet min/max row-group
  skipping replace RocksDB ``seek(prefix)``;
- small dimension tables (volumes, buckets, containers) broadcast;
- every aggregate is a map-side-combinable ``groupBy``; no Python UDFs
  in any reference-parity path (SURVEY.md §2.10);
- the CDC feed is a Structured Streaming source with idempotent
  ``foreachBatch`` MERGE maintenance of the Recon marts.
"""

__version__ = "0.1.0"
