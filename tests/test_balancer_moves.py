"""BM1 balancer move-planner invariants over randomized clusters.

The pick law is repo-defined (v1.2.0's ContainerBalancer classifies
only); what the sweep pins is the SAFETY contract: moves pair B1's
over/under sets, never land on a current holder, never break the
placement law, and respect every byte budget."""

from __future__ import annotations

import random

from hadoop_ozone_spark.operators import scm


def _frames(spark, rng, n_nodes=24, n_containers=120, n_racks=4):
    dn_rows = []
    for d in range(1, n_nodes + 1):
        cap = rng.choice([50, 100, 200]) * 1_000_000
        dn_rows.append(
            (d, f"n{d}", f"r{d % n_racks}", "HEALTHY", "IN_SERVICE", cap)
        )
    cont_rows, rep_rows = [], []
    for cid in range(1, n_containers + 1):
        rf = 3
        used = rng.randint(1, 40) * 100_000
        state = "CLOSED" if cid % 7 else "OPEN"
        cont_rows.append((cid, state, rf, used))
        holders = rng.sample(range(1, n_nodes + 1), rf)
        # skew: low-id nodes hold far more data
        if rng.random() < 0.6:
            holders = sorted(set(holders) | {rng.randint(1, 4)})[:rf]
        rep_rows.extend((cid, d) for d in holders)
    datanodes = spark.createDataFrame(
        dn_rows,
        "datanode_id long, hostname string, rack string, node_state string, "
        "op_state string, capacity_bytes long",
    )
    containers = spark.createDataFrame(
        cont_rows,
        "container_id long, state string, replication_factor int, "
        "used_bytes long",
    )
    replicas = spark.createDataFrame(
        rep_rows, "container_id long, datanode_id long"
    )
    return datanodes, containers, replicas


def test_move_invariants_random_sweep(spark):
    rng = random.Random(11)
    total_moves = 0
    for trial in range(3):
        datanodes, containers, replicas = _frames(spark, rng)
        threshold = 0.05
        util = {
            r.datanode_id: r
            for r in scm.balancer_utilization(
                datanodes, replicas, containers, threshold
            ).collect()
        }
        moves = scm.balancer_moves(
            datanodes, replicas, containers, threshold
        ).collect()
        total_moves += len(moves)

        holders = {}
        for r in replicas.collect():
            holders.setdefault(r.container_id, set()).add(r.datanode_id)
        cont = {r.container_id: r for r in containers.collect()}
        rack_of = {r.datanode_id: r.rack for r in datanodes.collect()}
        total_racks = len(set(rack_of.values()))

        seen_containers = set()
        src_bytes, tgt_bytes = {}, {}
        for m in moves:
            # pairs exactly B1's sets
            assert util[m.source_datanode_id].classification == "OVER_UTILIZED"
            assert util[m.target_datanode_id].classification == "UNDER_UTILIZED"
            # moved container is movable and moved once
            assert cont[m.container_id].state == "CLOSED"
            assert m.container_id not in seen_containers
            seen_containers.add(m.container_id)
            # source holds it, target doesn't (no under/over-replication)
            assert m.source_datanode_id in holders[m.container_id]
            assert m.target_datanode_id not in holders[m.container_id]
            # rack coverage never drops below the placement minimum
            before = {rack_of[d] for d in holders[m.container_id]}
            after = {
                rack_of[d]
                for d in (holders[m.container_id] - {m.source_datanode_id})
                | {m.target_datanode_id}
            }
            floor = min(cont[m.container_id].replication_factor, total_racks)
            assert len(after) >= min(floor, len(before))
            src_bytes[m.source_datanode_id] = (
                src_bytes.get(m.source_datanode_id, 0) + m.used_bytes
            )
            tgt_bytes[m.target_datanode_id] = (
                tgt_bytes.get(m.target_datanode_id, 0) + m.used_bytes
            )
        # byte budgets: per-source within bytes_over_upper, per-target
        # within bytes_under_lower
        for d, b in src_bytes.items():
            assert b <= util[d].bytes_over_upper
        for d, b in tgt_bytes.items():
            assert b <= util[d].bytes_under_lower
    assert total_moves > 0  # the sweep exercised real moves


def test_same_rack_move_keeps_coverage(spark):
    """A same-rack move leaves rack coverage unchanged — the source-rack
    decrement must not fire when the source is its rack's only holder
    and the target sits on the same rack (regression: the old law
    computed cov_before-1 and spuriously rejected the move)."""
    cap = 100_000_000
    used = 10_000_000
    datanodes = spark.createDataFrame(
        [
            (1, "a", "r0", "HEALTHY", "IN_SERVICE", cap),
            (2, "b", "r1", "HEALTHY", "IN_SERVICE", cap),
            (3, "c", "r0", "HEALTHY", "IN_SERVICE", cap),
            (4, "d", "r1", "HEALTHY", "IN_SERVICE", cap),
        ],
        "datanode_id long, hostname string, rack string, node_state string, "
        "op_state string, capacity_bytes long",
    )
    containers = spark.createDataFrame(
        [(cid, "CLOSED", 2, used) for cid in (1, 2, 3, 4, 5)],
        "container_id long, state string, replication_factor int, "
        "used_bytes long",
    )
    # node 1 (rack r0) holds every container and is the only r0 holder;
    # the sole under-utilized target (node 3) is also in r0.
    replicas = spark.createDataFrame(
        [(1, 1), (1, 2), (2, 1), (2, 2), (3, 1), (3, 4), (4, 1), (4, 4),
         (5, 1), (5, 4)],
        "container_id long, datanode_id long",
    )
    moves = scm.balancer_moves(datanodes, replicas, containers, 0.1).collect()
    # avg=0.25, upper=0.35 → node 1 OVER (15M budget → 1 container),
    # node 3 UNDER (15M budget → 1 container) → exactly one same-rack
    # move survives
    assert len(moves) == 1
    (m,) = moves
    assert m.source_datanode_id == 1 and m.target_datanode_id == 3
    assert m.source_rack == m.target_rack == "r0"


def test_global_budget_caps_total_bytes(spark):
    rng = random.Random(13)
    datanodes, containers, replicas = _frames(spark, rng)
    uncapped = scm.balancer_moves(
        datanodes, replicas, containers, 0.05
    ).collect()
    assert uncapped
    cap = sum(m.used_bytes for m in uncapped) // 2
    capped = scm.balancer_moves(
        datanodes, replicas, containers, 0.05, max_size_to_move=cap
    ).collect()
    assert sum(m.used_bytes for m in capped) <= cap
    assert len(capped) < len(uncapped)
