from hadoop_ozone_spark.functions import binning, paths  # noqa: F401
