"""ReplicationManager action-planner laws on synthetic frames
(ReplicationManager.java:692-805 under-replication with rack-aware
targets, :807-860 placement-preserving over-replication deletes), plus
the rack-aware chooser (SCMContainerPlacementRackAware)."""

from __future__ import annotations

from hadoop_ozone_spark.operators import scm


def _datanodes(spark, rows):
    return spark.createDataFrame(
        rows,
        "datanode_id long, hostname string, rack string, node_state string, "
        "op_state string, capacity_bytes long",
    )


def _containers(spark, rows):
    return spark.createDataFrame(
        rows,
        "container_id long, state string, replication_factor int, "
        "used_bytes long, pipeline_id long",
    )


def _replicas(spark, rows):
    return spark.createDataFrame(rows, "container_id long, datanode_id long")


def _actions(spark, containers, replicas, datanodes):
    return scm.replication_actions(
        _containers(spark, containers),
        _replicas(spark, replicas),
        _datanodes(spark, datanodes),
    ).collect()


DN_3RACKS = [
    # rack r0: nodes 1,2 — rack r1: 3,4 — rack r2: 5,6; node 6 bigger
    (1, "n1", "r0", "HEALTHY", "IN_SERVICE", 100),
    (2, "n2", "r0", "HEALTHY", "IN_SERVICE", 100),
    (3, "n3", "r1", "HEALTHY", "IN_SERVICE", 100),
    (4, "n4", "r1", "HEALTHY", "IN_SERVICE", 100),
    (5, "n5", "r2", "HEALTHY", "IN_SERVICE", 100),
    (6, "n6", "r2", "HEALTHY", "IN_SERVICE", 200),
]


def test_under_replicated_prefers_uncovered_rack(spark):
    # rf=3, replicas on racks r0,r1 → 1 ADD; r2 is uncovered, so an r2
    # node must win even though covered-rack nodes have equal free space
    rows = _actions(
        spark,
        [(10, "CLOSED", 3, 10, 0)],
        [(10, 1), (10, 3)],
        DN_3RACKS,
    )
    assert len(rows) == 1
    a = rows[0]
    assert a.action == "ADD_REPLICA"
    assert a.rack == "r2"
    # free-space ordering inside the uncovered rack: node 6 (free 200)
    # beats node 5 (free 100)
    assert a.datanode_id == 6


def test_under_replicated_free_space_then_id_tiebreak(spark):
    # both candidate racks uncovered and equal free space → lowest id
    dns = [
        (1, "n1", "r0", "HEALTHY", "IN_SERVICE", 100),
        (5, "n5", "r2", "HEALTHY", "IN_SERVICE", 100),
        (6, "n6", "r1", "HEALTHY", "IN_SERVICE", 100),
    ]
    rows = _actions(spark, [(10, "CLOSED", 2, 10, 0)], [(10, 1)], dns)
    assert [r.datanode_id for r in rows] == [5]


def test_under_replicated_excludes_holders_and_non_in_service(spark):
    # candidates must skip nodes already holding a replica and nodes
    # that are not HEALTHY+IN_SERVICE (ReplicationManager.java:757-763)
    dns = [
        (1, "n1", "r0", "HEALTHY", "IN_SERVICE", 100),
        (2, "n2", "r1", "HEALTHY", "DECOMMISSIONING", 100),
        (3, "n3", "r1", "STALE", "IN_SERVICE", 100),
        (4, "n4", "r1", "HEALTHY", "IN_SERVICE", 100),
    ]
    rows = _actions(spark, [(10, "CLOSED", 2, 10, 0)], [(10, 1)], dns)
    assert [r.datanode_id for r in rows] == [4]


def test_no_healthy_source_marker(spark):
    # all replicas on STALE/DEAD nodes → cannot re-replicate (:790)
    dns = [
        (1, "n1", "r0", "STALE", "IN_SERVICE", 100),
        (2, "n2", "r1", "DEAD", "IN_SERVICE", 100),
        (3, "n3", "r2", "HEALTHY", "IN_SERVICE", 100),
    ]
    rows = _actions(spark, [(10, "CLOSED", 3, 10, 0)], [(10, 1), (10, 2)], dns)
    assert len(rows) == 1
    assert rows[0].action == "NO_HEALTHY_SOURCE"
    assert rows[0].datanode_id is None


def test_missing_marker(spark):
    rows = _actions(spark, [(10, "CLOSED", 3, 10, 0)], [], DN_3RACKS)
    assert [(r.action, r.datanode_id) for r in rows] == [("MISSING", None)]


def test_deleted_containers_ignored(spark):
    rows = _actions(spark, [(10, "DELETED", 3, 10, 0)], [], DN_3RACKS)
    assert rows == []


def test_over_replicated_deletes_rack_duplicates_first(spark):
    # rf=3, 5 replicas: r0 {1,2}, r1 {3,4}, r2 {5} → excess 2; the
    # rack-duplicate replicas (2 on r0, 4 on r1) go first, highest
    # datanode first — rack coverage never drops
    rows = _actions(
        spark,
        [(10, "CLOSED", 3, 10, 0)],
        [(10, 1), (10, 2), (10, 3), (10, 4), (10, 5)],
        DN_3RACKS,
    )
    assert all(r.action == "DELETE_REPLICA" for r in rows)
    assert sorted(r.datanode_id for r in rows) == [2, 4]


def test_over_replicated_singletons_deletable_down_to_expected(spark):
    # rf=1 on 3 racks (singletons only): expected = min(1, 3) = 1, so 2
    # singletons may go, highest datanode_id first
    rows = _actions(
        spark,
        [(10, "CLOSED", 1, 10, 0)],
        [(10, 1), (10, 3), (10, 5)],
        DN_3RACKS,
    )
    assert sorted(r.datanode_id for r in rows) == [3, 5]


def test_over_replicated_blocked_when_placement_would_break(spark):
    # rf=3, 4 eligible singletons on 3 racks is impossible — instead:
    # 4 replicas but one on a DECOMMISSIONING node (ineligible, :843-847)
    # leaves 3 eligible singletons on 3 racks; expected = min(3,3) = 3 →
    # no deletion can keep placement satisfied → zero actions (the
    # reference logs "cannot be removed without violating placement")
    dns = [
        (1, "n1", "r0", "HEALTHY", "IN_SERVICE", 100),
        (3, "n3", "r1", "HEALTHY", "IN_SERVICE", 100),
        (5, "n5", "r2", "HEALTHY", "IN_SERVICE", 100),
        (7, "n7", "r2", "HEALTHY", "DECOMMISSIONING", 100),
    ]
    rows = _actions(
        spark,
        [(10, "CLOSED", 3, 10, 0)],
        [(10, 1), (10, 3), (10, 5), (10, 7)],
        dns,
    )
    assert rows == []


def test_add_count_matches_deficit(spark):
    # rf=3 with a single replica → exactly 2 ADDs on 2 distinct racks
    rows = _actions(spark, [(10, "CLOSED", 3, 10, 0)], [(10, 1)], DN_3RACKS)
    assert len(rows) == 2
    assert {r.rack for r in rows} == {"r1", "r2"}


def test_placement_probe_ranks_uncovered_racks_first(spark):
    probe = scm.placement_probe(
        _containers(spark, [(10, "CLOSED", 3, 10, 0)]),
        _replicas(spark, [(10, 1)]),
        _datanodes(spark, DN_3RACKS),
        limit=10,
    ).collect()
    assert [r.rank for r in probe] == list(range(1, len(probe) + 1))
    # covered-rack candidates (r0: node 2) rank after all uncovered
    covered_ranks = [r.rank for r in probe if r.rack_covered]
    uncovered_ranks = [r.rank for r in probe if not r.rack_covered]
    assert max(uncovered_ranks) < min(covered_ranks)
    # first pick: uncovered rack with most free space → node 6
    assert probe[0].datanode_id == 6


def test_datanode_usage_topk_ordering(spark):
    dns = _datanodes(
        spark,
        [
            (1, "n1", "r0", "HEALTHY", "IN_SERVICE", 100),
            (2, "n2", "r0", "HEALTHY", "IN_SERVICE", 100),
            (3, "n3", "r0", "STALE", "IN_SERVICE", 100),
        ],
    )
    cts = _containers(spark, [(10, "CLOSED", 3, 60, 0), (20, "CLOSED", 3, 30, 0)])
    reps = _replicas(spark, [(10, 1), (20, 2)])
    rows = scm.datanode_usage(reps, cts, dns, count=10, most_used=True).collect()
    # STALE node excluded from the usage scope
    assert [r.datanode_id for r in rows] == [1, 2]
    assert rows[0].used_bytes == 60 and rows[0].remaining_bytes == 40
    assert rows[0].percent_used == 0.6


# --- close-command plane (close_actions) ----------------------------------

def _cdetails(spark, rows):
    return spark.createDataFrame(
        rows,
        "container_id long, state string, replication_factor int, "
        "sequence_id long",
    )


def _rdetails(spark, rows):
    return spark.createDataFrame(
        rows,
        "container_id long, datanode_id long, replica_state string, "
        "sequence_id long",
    )


def _close(spark, containers, replicas):
    return scm.close_actions(
        _cdetails(spark, containers), _rdetails(spark, replicas)
    ).collect()


def test_closing_container_resends_close_to_all_replicas(spark):
    rows = _close(
        spark,
        [(10, "CLOSING", 3, 7)],
        [(10, 1, "OPEN", 7), (10, 2, "CLOSING", 7)],
    )
    assert [(r.action, r.datanode_id) for r in rows] == [
        ("CLOSE", 1), ("CLOSE", 2)
    ]


def test_quasi_closed_force_close_targets_max_bcsid_under_quorum(spark):
    # 3 quasi-closed replicas (quorum: 3 > 3/2) at BCSIDs 5,7,7 →
    # force-close exactly the two at the max BCSID 7
    rows = _close(
        spark,
        [(10, "QUASI_CLOSED", 3, 7)],
        [
            (10, 1, "QUASI_CLOSED", 5),
            (10, 2, "QUASI_CLOSED", 7),
            (10, 3, "QUASI_CLOSED", 7),
        ],
    )
    assert [(r.action, r.datanode_id) for r in rows] == [
        ("FORCE_CLOSE", 2), ("FORCE_CLOSE", 3)
    ]


def test_quasi_closed_without_quorum_goes_unstable(spark):
    # only 1 quasi-closed replica (1 > 1.5 false) → no force-close;
    # exactly-replicated container falls to the unstable branch:
    # the OPEN replica gets CLOSE, the UNHEALTHY one is the single
    # per-iteration delete
    rows = _close(
        spark,
        [(10, "QUASI_CLOSED", 3, 7)],
        [
            (10, 1, "QUASI_CLOSED", 7),
            (10, 2, "OPEN", 7),
            (10, 3, "UNHEALTHY", 7),
        ],
    )
    assert [(r.action, r.datanode_id) for r in rows] == [
        ("CLOSE", 2), ("DELETE_UNHEALTHY", 3)
    ]


def test_unstable_closed_container_mixed_replicas(spark):
    # container CLOSED BCSID 9: OPEN replica → CLOSE; QUASI_CLOSED at
    # the container BCSID → FORCE_CLOSE; two UNHEALTHY → only the
    # lowest-datanode one deleted this iteration (:973-975 findFirst,
    # determinized)
    rows = _close(
        spark,
        [(10, "CLOSED", 4, 9)],
        [
            (10, 1, "OPEN", 9),
            (10, 2, "QUASI_CLOSED", 9),
            (10, 3, "UNHEALTHY", 9),
            (10, 4, "UNHEALTHY", 9),
        ],
    )
    assert [(r.action, r.datanode_id) for r in rows] == [
        ("CLOSE", 1), ("DELETE_UNHEALTHY", 3), ("FORCE_CLOSE", 2)
    ]


def test_unstable_skips_under_and_over_replicated(spark):
    # under-replicated CLOSED container (2 of 3): the replication
    # branch owns it — the unstable branch must not emit
    rows = _close(
        spark,
        [(10, "CLOSED", 3, 9)],
        [(10, 1, "OPEN", 9), (10, 2, "UNHEALTHY", 9)],
    )
    assert rows == []


def test_healthy_stable_container_no_actions(spark):
    rows = _close(
        spark,
        [(10, "CLOSED", 2, 9)],
        [(10, 1, "CLOSED", 9), (10, 2, "CLOSED", 9)],
    )
    assert rows == []


def test_delete_law_invariants_random_sweep(spark):
    """The over-replication closed form is a DETERMINIZATION of the
    reference's greedy walk (whose own victim order is hashCode-
    arbitrary, ReplicationManager.java:828-831). What must hold for
    EVERY configuration is the walk's contract, checked here over 200
    seeded-random clusters in one planner pass:

      (a) never delete more than the excess;
      (b) rack coverage of surviving eligible replicas never drops
          below min(rf, eligible racks before, total racks...) — i.e.
          deleting preserves the placement the validator would accept;
      (c) maximality: if fewer than excess were deleted, deleting ANY
          additional eligible replica would reduce rack coverage below
          the expected min(rf, total_racks) — the reference's 'cannot
          be removed without violating placement' terminal state.
    """
    import random

    rng = random.Random(42)
    racks = [f"r{i}" for i in range(4)]
    datanode_rows = [
        (d, f"n{d}", racks[d % 4], "HEALTHY", "IN_SERVICE", 100)
        for d in range(1, 41)
    ]
    rack_of = {d: racks[d % 4] for d in range(1, 41)}
    total_racks = len({r for r in rack_of.values()})

    containers, replicas, spec = [], [], {}
    for cid in range(1, 201):
        rf = rng.choice([1, 2, 3, 3, 4])
        n_rep = rng.randint(rf + 1, min(rf + 4, 12))  # always over
        nodes = rng.sample(range(1, 41), n_rep)
        containers.append((cid, "CLOSED", rf, 10, 0))
        replicas.extend((cid, d) for d in nodes)
        spec[cid] = (rf, nodes)

    rows = _actions(spark, containers, replicas, datanode_rows)
    deleted = {}
    for r in rows:
        if r.action == "DELETE_REPLICA":
            deleted.setdefault(r.container_id, set()).add(r.datanode_id)
        else:
            # a strictly-over-replicated healthy cluster emits only deletes
            assert r.action == "DELETE_REPLICA", r

    for cid, (rf, nodes) in spec.items():
        excess = len(nodes) - rf
        got = deleted.get(cid, set())
        assert got <= set(nodes)
        assert len(got) <= excess  # (a)
        survivors = [d for d in nodes if d not in got]
        cov_before = len({rack_of[d] for d in nodes})
        cov_after = len({rack_of[d] for d in survivors})
        expected = min(rf, total_racks)
        assert cov_after >= min(expected, cov_before)  # (b)
        if len(got) < excess:  # (c) maximality
            for d in survivors:
                rest = [x for x in survivors if x != d]
                assert len({rack_of[x] for x in rest}) < expected, (
                    f"container {cid}: {d} was deletable but not deleted"
                )


# --- delete plane + pipeline scrubber --------------------------------------

def test_delete_actions_branches(spark):
    containers = _cdetails(
        spark,
        [
            (10, "DELETING", 3, 0),   # no replicas → CLEANUP
            (20, "DELETING", 3, 0),   # replicas left → resend deletes
            (30, "CLOSED", 3, 0),     # empty (no keys, all CLOSED) → delete
            (40, "CLOSED", 3, 0),     # NOT empty (live key) → untouched
            (50, "CLOSED", 3, 0),     # non-CLOSED replica → not empty
        ],
    )
    replicas = _rdetails(
        spark,
        [
            (20, 1, "CLOSED", 0), (20, 2, "CLOSED", 0),
            (30, 3, "CLOSED", 0), (30, 4, "CLOSED", 0),
            (40, 5, "CLOSED", 0),
            (50, 6, "UNHEALTHY", 0),
        ],
    )
    keys = spark.createDataFrame([(40,)], "container_id long")
    rows = scm.delete_actions(containers, replicas, keys).collect()
    got = [(r.container_id, r.action, r.datanode_id) for r in rows]
    assert got == [
        (10, "CLEANUP", None),
        (20, "DELETE_REPLICA", 1), (20, "DELETE_REPLICA", 2),
        (30, "CLEANUP", None),
        (30, "DELETE_EMPTY", 3), (30, "DELETE_EMPTY", 4),
    ]


def test_pipeline_scrub_laws(spark):
    details = spark.createDataFrame(
        [
            (1, "ALLOCATED", 3, 1000),   # stale → CLOSE
            (2, "ALLOCATED", 3, 9000),   # fresh → untouched
            (3, "CLOSED", 3, 1000),      # → REMOVE
            (4, "OPEN", 3, 1000),        # untouched
            (5, "CLOSED", 1, 1000),      # factor 1 → out of scope
        ],
        "pipeline_id long, state string, replication_factor int, created_ms long",
    )
    rows = scm.pipeline_scrub(details, now_ms=10_000, allocated_timeout_ms=5_000)
    got = {(r.pipeline_id, r.action) for r in rows.collect()}
    assert got == {(1, "CLOSE"), (3, "REMOVE")}


def test_datanode_usage_orders_by_remaining_ratio_not_bytes(spark):
    # node 1: 100 GB capacity, 50 used → remaining ratio 0.5
    # node 2: 10 GB capacity, 9 used → remaining ratio 0.1 (most used
    # by the reference's compareByRemainingRatio law, despite fewer
    # absolute bytes used)
    dns = _datanodes(
        spark,
        [
            (1, "n1", "r0", "HEALTHY", "IN_SERVICE", 100),
            (2, "n2", "r0", "HEALTHY", "IN_SERVICE", 10),
        ],
    )
    cts = _containers(spark, [(10, "CLOSED", 3, 50, 0), (20, "CLOSED", 3, 9, 0)])
    reps = _replicas(spark, [(10, 1), (20, 2)])
    most = scm.datanode_usage(reps, cts, dns, count=2, most_used=True).collect()
    assert [r.datanode_id for r in most] == [2, 1]
    least = scm.datanode_usage(reps, cts, dns, count=2, most_used=False).collect()
    assert [r.datanode_id for r in least] == [1, 2]


def test_add_law_invariants_random_sweep(spark):
    """Target-choice contract over 200 seeded-random under-replicated
    clusters, one planner pass:

      (a) exactly min(deficit, |eligible candidates|) ADDs;
      (b) never onto a current holder or a non-HEALTHY/IN_SERVICE node;
      (c) rack-aware greedy: the chosen set covers
          min(deficit, |uncovered racks with candidates|) NEW racks —
          an uncovered rack is never passed over for a covered one;
      (d) within the uncovered-rack picks, each choice has the maximal
          free space among that rack-class's remaining candidates
          (verified via global free-space ordering of the pick list).
    """
    import random

    rng = random.Random(7)
    racks = [f"r{i}" for i in range(4)]
    # mixed health/op states so exclusion rules (b) have work
    dn_rows, eligible_nodes = [], {}
    for d in range(1, 41):
        node_state = "STALE" if d % 11 == 0 else "HEALTHY"
        op_state = "DECOMMISSIONING" if d % 13 == 0 else "IN_SERVICE"
        dn_rows.append((d, f"n{d}", racks[d % 4], node_state, op_state, 50 + d))
        if node_state == "HEALTHY" and op_state == "IN_SERVICE":
            eligible_nodes[d] = racks[d % 4]

    containers, replicas, spec = [], [], {}
    for cid in range(1, 201):
        rf = rng.choice([2, 3, 3, 4])
        n_rep = rng.randint(1, rf - 1)  # always under, never missing
        holders = rng.sample(range(1, 41), n_rep)
        containers.append((cid, "CLOSED", rf, 10, 0))
        replicas.extend((cid, d) for d in holders)
        spec[cid] = (rf, holders)

    rows = _actions(spark, containers, replicas, dn_rows)
    rack_of = {d: racks[d % 4] for d in range(1, 41)}
    adds, markers = {}, {}
    for r in rows:
        if r.action == "ADD_REPLICA":
            adds.setdefault(r.container_id, []).append(r.datanode_id)
        else:
            markers.setdefault(r.container_id, r.action)

    for cid, (rf, holders) in spec.items():
        healthy_sources = [
            d for d in holders
            if d % 11 != 0  # node_state HEALTHY (source law ignores op)
        ]
        if not healthy_sources:
            assert markers.get(cid) == "NO_HEALTHY_SOURCE"
            assert cid not in adds
            continue
        cands = {d: rk for d, rk in eligible_nodes.items() if d not in holders}
        deficit = rf - len(holders)
        got = adds.get(cid, [])
        assert len(got) == min(deficit, len(cands))  # (a)
        for d in got:  # (b)
            assert d in cands
        covered = {rack_of[d] for d in holders}
        uncovered_with_cands = {rk for rk in cands.values() if rk not in covered}
        new_racks = {cands[d] for d in got} - covered
        assert len(new_racks) == min(len(got), len(uncovered_with_cands))  # (c)
