"""PP1 pipeline-placement proposer laws on synthetic clusters —
PipelinePlacementPolicy.java: filterViableNodes (:134-199, health /
space / engagement-limit / load sort), getResultSet (:274-365, anchor →
different-rack second → same-rack third), fallback picks (:252-264)."""

from __future__ import annotations

from hadoop_ozone_spark.operators import scm


def _datanodes(spark, rows):
    return spark.createDataFrame(
        rows,
        "datanode_id long, hostname string, rack string, node_state string, "
        "op_state string, capacity_bytes long",
    )


def _members(spark, rows):
    return spark.createDataFrame(rows, "pipeline_id long, datanode_id long")


def _details(spark, rows):
    return spark.createDataFrame(
        rows,
        "pipeline_id long, state string, replication_factor int, "
        "created_ms long",
    )


def _empty_replicas(spark):
    return spark.createDataFrame([], "container_id long, datanode_id long")


def _empty_containers(spark):
    return spark.createDataFrame(
        [], "container_id long, state string, replication_factor int, "
        "used_bytes long",
    )


def _targets(spark, dns, members=(), details=(), **kw):
    return scm.pipeline_targets(
        _datanodes(spark, dns),
        _members(spark, list(members)),
        _details(spark, list(details)),
        _empty_replicas(spark),
        _empty_containers(spark),
        min_free_bytes=0,
        **kw,
    ).collect()


GB = 1_000_000_000
DN = [
    # rack r0: 1,2 — rack r1: 3,4 — rack r2: 5
    (1, "n1", "r0", "HEALTHY", "IN_SERVICE", 10 * GB),
    (2, "n2", "r0", "HEALTHY", "IN_SERVICE", 10 * GB),
    (3, "n3", "r1", "HEALTHY", "IN_SERVICE", 10 * GB),
    (4, "n4", "r1", "HEALTHY", "IN_SERVICE", 10 * GB),
    (5, "n5", "r2", "HEALTHY", "IN_SERVICE", 10 * GB),
]


def test_anchor_spread_same_rack_shape(spark):
    # no load anywhere: anchor = lowest id (1, r0); second = first node
    # on a DIFFERENT rack (3, r1); third = anchor's rack partner (2, r0)
    rows = _targets(spark, DN)
    got = [(r.member_no, r.datanode_id, r.role) for r in rows]
    assert got == [
        (1, 1, "ANCHOR"), (2, 3, "RACK_SPREAD"), (3, 2, "SAME_RACK")
    ]


def test_load_sort_shifts_anchor(spark):
    # nodes 1,2 carry one open RATIS-3 pipeline each → least-loaded
    # order starts at node 3 (r1); second from another rack = 1 only if
    # load-sorted AFTER zero-load nodes: expect anchor 3, spread 5 (r2
    # beats r0's loaded nodes? no — order is load then id: node 4 (r1)
    # is same-rack as anchor, node 5 (r2) id 5 < loaded 1,2) → second =
    # first diff-rack in load order = 5; third = same-rack partner 4
    members = [(100, 1), (100, 2)]
    details = [(100, "OPEN", 3, 0)]
    rows = _targets(spark, DN, members, details)
    got = [(r.member_no, r.datanode_id, r.role) for r in rows]
    assert got == [
        (1, 3, "ANCHOR"), (2, 5, "RACK_SPREAD"), (3, 4, "SAME_RACK")
    ]


def test_engagement_limit_excludes_heavy_nodes(spark):
    # node 1 sits in 2 open RATIS-3 pipelines = the default limit → not
    # viable at all; anchor moves to node 2
    members = [(100, 1), (101, 1)]
    details = [(100, "OPEN", 3, 0), (101, "ALLOCATED", 3, 0)]
    rows = _targets(spark, DN, members, details)
    assert rows[0].datanode_id == 2 and rows[0].role == "ANCHOR"
    assert all(r.datanode_id != 1 for r in rows)


def test_closed_and_factor_one_pipelines_deduct(spark):
    # CLOSED factor-3 and factor-1 memberships don't count against the
    # limit (currentPipelineCount deductions) → node 1 stays viable
    members = [(100, 1), (101, 1)]
    details = [(100, "CLOSED", 3, 0), (101, "OPEN", 1, 0)]
    rows = _targets(spark, DN, members, details)
    assert rows[0].datanode_id == 1 and rows[0].pipeline_count == 0


def test_single_rack_cluster_falls_back(spark):
    # all viable nodes on one rack: rack awareness off — members are
    # simply the three least-loaded nodes, roles FALLBACK
    dns = [(i, f"n{i}", "r0", "HEALTHY", "IN_SERVICE", 10 * GB)
           for i in range(1, 5)]
    rows = _targets(spark, dns)
    got = [(r.member_no, r.datanode_id, r.role) for r in rows]
    assert got == [
        (1, 1, "ANCHOR"), (2, 2, "FALLBACK"), (3, 3, "FALLBACK")
    ]


def test_two_racks_no_anchor_partner_falls_back(spark):
    # anchor's rack has no second viable node → third pick falls back
    # to list order on the other rack
    dns = [
        (1, "n1", "r0", "HEALTHY", "IN_SERVICE", 10 * GB),
        (2, "n2", "r1", "HEALTHY", "IN_SERVICE", 10 * GB),
        (3, "n3", "r1", "HEALTHY", "IN_SERVICE", 10 * GB),
    ]
    rows = _targets(spark, dns)
    got = [(r.member_no, r.datanode_id, r.role) for r in rows]
    assert got == [
        (1, 1, "ANCHOR"), (2, 2, "RACK_SPREAD"), (3, 3, "FALLBACK")
    ]


def test_unhealthy_and_small_cluster_markers(spark):
    # non-viable nodes (DEAD / DECOMMISSIONING) never appear; a cluster
    # with <3 viable nodes yields <3 rows — the reference's
    # FAILED_TO_FIND_SUITABLE_NODE marker
    dns = [
        (1, "n1", "r0", "HEALTHY", "IN_SERVICE", 10 * GB),
        (2, "n2", "r0", "DEAD", "IN_SERVICE", 10 * GB),
        (3, "n3", "r1", "HEALTHY", "DECOMMISSIONING", 10 * GB),
        (4, "n4", "r1", "HEALTHY", "IN_SERVICE", 10 * GB),
    ]
    rows = _targets(spark, dns)
    assert [(r.member_no, r.datanode_id) for r in rows] == [(1, 1), (2, 4)]


def test_space_filter(spark):
    # free space below the requirement excludes a node (reference
    # filterNodesWithSpace)
    dns = [
        (1, "n1", "r0", "HEALTHY", "IN_SERVICE", 1 * GB),
        (2, "n2", "r0", "HEALTHY", "IN_SERVICE", 10 * GB),
        (3, "n3", "r1", "HEALTHY", "IN_SERVICE", 10 * GB),
        (4, "n4", "r1", "HEALTHY", "IN_SERVICE", 10 * GB),
    ]
    rows = scm.pipeline_targets(
        _datanodes(spark, dns),
        _members(spark, []),
        _details(spark, []),
        _empty_replicas(spark),
        _empty_containers(spark),
        min_free_bytes=2 * GB,
    ).collect()
    assert all(r.datanode_id != 1 for r in rows)
    assert [r.datanode_id for r in rows] == [2, 3, 4]


def test_pp1_matches_reference_walk_random_sweep(spark):
    """Randomized clusters vs a direct Python replay of the determinized
    chooser (filter → load-sort → anchor → diff-rack → same-rack →
    fallback): member sets and roles must match exactly."""
    import random

    rng = random.Random(23)
    for trial in range(20):
        n_nodes = rng.randint(3, 14)
        n_racks = rng.randint(1, 4)
        dns, loads = [], {}
        for d in range(1, n_nodes + 1):
            healthy = rng.random() < 0.85
            dns.append((
                d, f"n{d}", f"r{d % n_racks}",
                "HEALTHY" if healthy else "DEAD",
                "IN_SERVICE" if rng.random() < 0.9 else "DECOMMISSIONING",
                10 * GB,
            ))
            loads[d] = rng.randint(0, 2)
        members, details = [], []
        pid = 100
        for d, n in loads.items():
            for _ in range(n):
                members.append((pid, d))
                details.append((pid, "OPEN", 3, 0))
                pid += 1
        rows = _targets(spark, dns, members, details)

        # reference walk
        viable = sorted(
            (
                (loads[d[0]], d[0], d[2])
                for d in dns
                if d[3] == "HEALTHY" and d[4] == "IN_SERVICE"
                and loads[d[0]] < 2
            ),
        )
        expect = []
        if viable:
            anchor = viable[0]
            expect.append((anchor[1], "ANCHOR"))
            rest = viable[1:]
            diff = [v for v in rest if v[2] != anchor[2]]
            if rest:
                second = diff[0] if diff else rest[0]
                expect.append(
                    (second[1], "RACK_SPREAD" if diff else "FALLBACK")
                )
                rest2 = [v for v in rest if v[1] != second[1]]
                same = [v for v in rest2 if v[2] == anchor[2]]
                if rest2:
                    if diff and same:
                        expect.append((same[0][1], "SAME_RACK"))
                    else:
                        expect.append((rest2[0][1], "FALLBACK"))
        got = [(r.datanode_id, r.role) for r in rows]
        assert got == expect[:3], (trial, got, expect, viable)
