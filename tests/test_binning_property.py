"""Property test (hypothesis): the Spark pow2-bin ladder agrees with the
Python reference law on arbitrary long sizes — the FIXTURES §10.4
boundary contract, generalized."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from hadoop_ozone_spark.functions.binning import (
    LONG_MAX,
    file_size_upper_bound,
    file_size_upper_bound_py,
)

sizes = st.one_of(
    st.integers(min_value=0, max_value=LONG_MAX),
    st.sampled_from(
        [0, 1023, 1024, 1025, 2**20, 2**20 + 1, 2**50 - 1, 2**50, 2**50 + 1, LONG_MAX]
    ),
)


@settings(max_examples=20, deadline=None)
@given(st.lists(sizes, min_size=1, max_size=50))
def test_spark_bins_match_python_law(spark, batch):
    df = spark.createDataFrame([(int(s),) for s in batch], "size long")
    got = [
        r["ub"]
        for r in df.select(file_size_upper_bound(F.col("size")).alias("ub")).collect()
    ]
    assert got == [file_size_upper_bound_py(s) for s in batch]
