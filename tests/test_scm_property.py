"""Property tests (hypothesis): the SCM service-plane operators equal
sequential Python statements of their reference laws on arbitrary
clusters — sufficiency with maintenance credit
(ContainerReplicaCount.java:206-241), balancer classification against
the cluster average (ContainerBalancer.java:169-233), and the trash
emptier's lexicographic-stamp age test (TrashPolicyOzone parses dates;
we rely on yyMMddHHmmss ordering being chronological)."""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings
from hypothesis import strategies as st

from hadoop_ozone_spark.operators import scm

OP_STATES = [
    "IN_SERVICE", "DECOMMISSIONING", "DECOMMISSIONED",
    "IN_MAINTENANCE", "ENTERING_MAINTENANCE",
]

# a cluster: up to 8 nodes with op states, up to 10 containers with
# rf∈{1,3} and up to 5 replicas each on (possibly unregistered) nodes
clusters = st.builds(
    lambda states, containers: (
        [(i + 1, s) for i, s in enumerate(states)],
        [
            (cid + 1, rf, [d for d in dns])
            for cid, (rf, dns) in enumerate(containers)
        ],
    ),
    st.lists(st.sampled_from(OP_STATES), min_size=1, max_size=8),
    st.lists(
        st.tuples(
            st.sampled_from([1, 3]),
            st.lists(st.integers(min_value=1, max_value=10), max_size=5, unique=True),
        ),
        min_size=1,
        max_size=10,
    ),
)


def reference_missing(rf, op_states, min_healthy=2):
    """Sequential ContainerReplicaCount.missingReplicas()."""
    healthy = sum(
        1
        for s in op_states
        if s not in (
            "DECOMMISSIONING", "DECOMMISSIONED",
            "IN_MAINTENANCE", "ENTERING_MAINTENANCE",
        )
    )
    maint = sum(1 for s in op_states if s in ("IN_MAINTENANCE", "ENTERING_MAINTENANCE"))
    delta = rf - healthy
    if delta < 0:
        return delta
    if delta > 0:
        needed = max(0, min(rf, min_healthy) - healthy)
        return max(needed, max(0, delta - maint))
    return 0


@settings(max_examples=12, deadline=None)
@given(clusters)
def test_sufficiency_matches_reference_law(spark, cluster):
    nodes, containers = cluster
    node_state = dict(nodes)
    dns = spark.createDataFrame(
        [(i, f"n{i}", "r0", "HEALTHY", s, 100) for i, s in nodes],
        "datanode_id long, hostname string, rack string, node_state string, "
        "op_state string, capacity_bytes long",
    )
    cts = spark.createDataFrame(
        [(cid, "CLOSED", rf, 1, 0) for cid, rf, _ in containers],
        "container_id long, state string, replication_factor int, "
        "used_bytes long, pipeline_id long",
    )
    rep_rows = [(cid, d) for cid, _, ds in containers for d in ds]
    if not rep_rows:
        rep_rows = [(-1, -1)]  # keep the frame non-empty; joins drop it
    reps = spark.createDataFrame(rep_rows, "container_id long, datanode_id long")
    out = {
        r.container_id: r
        for r in scm.container_sufficiency(cts, reps, dns).collect()
    }
    for cid, rf, ds in containers:
        # unregistered datanodes count healthy (the left-join stance)
        states = [node_state.get(d, "IN_SERVICE") for d in ds]
        want = reference_missing(rf, states)
        assert out[cid].missing_replicas == want, (cid, rf, states)
        assert out[cid].sufficiently_replicated == (want <= 0)


@settings(max_examples=12, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=100, max_value=1000),  # capacity
            st.integers(min_value=0, max_value=1000),    # used
        ),
        min_size=1,
        max_size=8,
    )
)
def test_balancer_matches_reference_law(spark, usages):
    usages = [(cap, min(used, cap)) for cap, used in usages]
    dns = spark.createDataFrame(
        [
            (i + 1, f"n{i}", "r0", "HEALTHY", "IN_SERVICE", cap)
            for i, (cap, _) in enumerate(usages)
        ],
        "datanode_id long, hostname string, rack string, node_state string, "
        "op_state string, capacity_bytes long",
    )
    cts = spark.createDataFrame(
        [(i + 1, "CLOSED", 3, used, 0) for i, (_, used) in enumerate(usages)],
        "container_id long, state string, replication_factor int, "
        "used_bytes long, pipeline_id long",
    )
    reps = spark.createDataFrame(
        [(i + 1, i + 1) for i in range(len(usages))],
        "container_id long, datanode_id long",
    )
    out = {r.datanode_id: r for r in scm.balancer_utilization(dns, reps, cts).collect()}
    avg = sum(u for _, u in usages) / sum(c for c, _ in usages)
    for i, (cap, used) in enumerate(usages):
        util = used / cap
        r = out[i + 1]
        if util > avg + 0.1:
            want = "OVER_UTILIZED"
        elif util < avg - 0.1:
            want = "UNDER_UTILIZED"
        else:
            want = "WITHIN_THRESHOLD"
        assert r.classification == want, (i, util, avg)
        if want == "OVER_UTILIZED":
            assert abs(r.bytes_over_upper - (cap * util - cap * (avg + 0.1))) < 1e-6
        if want == "UNDER_UTILIZED":
            assert abs(r.bytes_under_lower - (cap * (avg - 0.1) - cap * util)) < 1e-6


@settings(max_examples=50, deadline=None)
@given(
    st.tuples(
        st.dates(min_value=dt.date(2000, 1, 1), max_value=dt.date(2068, 12, 31)),
        st.dates(min_value=dt.date(2000, 1, 1), max_value=dt.date(2068, 12, 31)),
    )
)
def test_trash_stamp_lexicographic_order_equals_date_order(pair):
    # the t1 law replaces TrashPolicyOzone's date parse with a string
    # compare on yyMMddHHmmss stamps — chronologically monotonic WITHIN
    # a century (the caveat trash_checkpoint_status documents)
    a, b = pair
    fa = a.strftime("%y%m%d") + "000000"
    fb = b.strftime("%y%m%d") + "000000"
    assert (fa < fb) == (a < b)
    # and the documented boundary: the trick breaks across centuries
    assert "991231000000" > "000101000000"  # 1999 vs 2000 would misorder
