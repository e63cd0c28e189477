"""Property test (hypothesis): the Spark packing plan equals the
sequential Python reference law on arbitrary corpora — every doc lands
in the bin where its running token count starts (concatenate-and-chunk;
a doc longer than the context spans windows, so bins with no STARTING
doc are legal and carry no row), totals are conserved."""

from __future__ import annotations

from collections import defaultdict

from hypothesis import given, settings
from hypothesis import strategies as st

from hadoop_ozone_spark.datapipe import packing

# (doc_id, n_tokens>=1) with unique ids; small context/shard sizes so
# boundaries and window-spanning docs are actually exercised
corpora = st.lists(
    st.integers(min_value=1, max_value=40), min_size=1, max_size=60
).map(lambda counts: [(i, n) for i, n in enumerate(counts)])


def reference_pack(corpus, context_len, shard_size):
    """Sequential statement of the law pack_plan must distribute."""
    bins = defaultdict(lambda: [0, 0, None, None])  # n_docs, n_tokens, first, last
    cum = defaultdict(int)
    for doc_id, n in corpus:  # corpus is already in doc_id order
        shard = doc_id // shard_size
        b = cum[shard] // context_len
        cum[shard] += n
        agg = bins[(shard, b)]
        agg[0] += 1
        agg[1] += n
        agg[2] = doc_id if agg[2] is None else agg[2]
        agg[3] = doc_id
    return {k: tuple(v) for k, v in bins.items()}


@settings(max_examples=15, deadline=None)
@given(corpora, st.integers(min_value=5, max_value=64), st.integers(min_value=3, max_value=25))
def test_pack_plan_matches_sequential_law(spark, corpus, context_len, shard_size):
    docs = spark.createDataFrame(
        [(i, "t " * n) for i, n in corpus], "doc_id long, text string"
    )
    # "t " * n has n tokens under the \s+ split-of-trimmed law
    rows = packing.pack_plan(docs, context_len=context_len, shard_size=shard_size).collect()
    got = {
        (r["shard"], r["bin"]): (r["n_docs"], r["n_tokens"], r["first_doc"], r["last_doc"])
        for r in rows
    }
    assert got == reference_pack(corpus, context_len, shard_size)
