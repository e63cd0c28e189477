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


mixtures = st.dictionaries(
    st.sampled_from(["a", "b", "c"]),
    st.sampled_from([0.0, 0.1, 0.5, 0.9, 1.0]),
    min_size=1,
    max_size=3,
)


def reference_mixture(corpus, weights):
    """Sequential statement of the hash-draw law (md5-lane uniform)."""
    import hashlib

    out = defaultdict(lambda: [0, 0])
    for doc_id, n_tokens, source in corpus:
        lane = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:15], 16)
        if (lane % 1_000_000) / 1_000_000.0 < weights.get(source, 0.0):
            out[source][0] += 1
            out[source][1] += n_tokens
    return {k: tuple(v) for k, v in out.items()}


@settings(max_examples=10, deadline=None)
@given(
    st.lists(st.integers(min_value=1, max_value=20), min_size=1, max_size=60),
    mixtures,
)
def test_mixture_sample_matches_md5_law(spark, counts, weights):
    corpus = [(i, n, ["a", "b", "c"][i % 3]) for i, n in enumerate(counts)]
    docs = spark.createDataFrame(
        [(i, "t " * n, s) for i, n, s in corpus],
        "doc_id long, text string, source string",
    )
    got = {
        r["source"]: (r["n_docs"], r["n_tokens"])
        for r in packing.mixture_sample(docs, weights).collect()
    }
    assert got == reference_mixture(corpus, weights)
