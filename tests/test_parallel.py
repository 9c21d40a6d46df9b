"""Distributed pose-graph correctness oracle (SURVEY §4 item 8).

The sharded submap solver (partition -> per-device interior elimination ->
separator Schur psum) must reproduce the single-device dense damped-GN step
exactly: delta_sharded == solve(H + lam*I, g) on the full graph.  Reference
analog: gtsam_unstable/partition NestedDissection — which the reference never
tests end-to-end; we do.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

import gtsam_tpu as gt
from gtsam_tpu.geometry import se3 as se3_mod
from gtsam_tpu.geometry.se3 import SE3
from gtsam_tpu.parallel import sharded_posegraph


def _make_pose_graph(n_poses, seed=0, closure_stride=8):
    rng = np.random.default_rng(seed)
    th = np.linspace(0, 2 * np.pi, n_poses, endpoint=False)
    t_true = np.stack([np.cos(th) * 10, np.sin(th) * 10, 0.1 * th], axis=1)
    R_true = np.stack([np.eye(3)] * n_poses)
    ki = list(range(n_poses - 1)) + list(range(0, n_poses - closure_stride,
                                               closure_stride))
    kj = list(range(1, n_poses)) + [i + closure_stride
                                    for i in range(0, n_poses - closure_stride,
                                                   closure_stride)]
    ki, kj = np.asarray(ki), np.asarray(kj)
    Ti = SE3(jnp.asarray(R_true[ki]), jnp.asarray(t_true[ki]))
    Tj = SE3(jnp.asarray(R_true[kj]), jnp.asarray(t_true[kj]))
    meas = se3_mod.between(Ti, Tj)
    graph = gt.FactorGraph()
    graph.add(gt.prior_factors(
        "SE3", [0], SE3(jnp.asarray(R_true[:1]), jnp.asarray(t_true[:1])),
        gt.noise.isotropic(6, 1e-3)))
    graph.add(gt.between_factors("SE3", ki, kj, meas,
                                 gt.noise.isotropic(6, 0.05)))
    noisy_t = t_true + rng.normal(scale=0.15, size=t_true.shape)
    values = gt.Values.from_entries(
        [(i, "SE3", SE3(jnp.asarray(R_true[i]), jnp.asarray(noisy_t[i])))
         for i in range(n_poses)])
    return graph, values, ki, kj


@pytest.mark.parametrize("ndev", [
    pytest.param(2, marks=pytest.mark.slow),   # 8-dev case covers the mesh
    8,
])
def test_sharded_posegraph_matches_single(ndev):
    n_poses = 48
    graph, values, ki, kj = _make_pose_graph(n_poses)
    lam = 1e-3

    # single-device dense damped-GN oracle
    H, g = graph.bind(values).gn_system(values.arrays)
    H = np.asarray(H, dtype=np.float64)
    g = np.asarray(g, dtype=np.float64)
    delta_ref = np.linalg.solve(H + lam * np.eye(H.shape[0]), g)

    mesh = Mesh(np.array(jax.devices()[:ndev]).reshape(ndev), ("blocks",))
    st = sharded_posegraph.ShardedPoseGraphStructure.build(
        ki, kj, n_poses, ndev)
    solver = sharded_posegraph.make_sharded_pose_solver(
        mesh, st, graph, values, axis="blocks")
    delta = np.asarray(solver(values.arrays, jnp.asarray(lam)))

    scale = max(1.0, np.abs(delta_ref).max())
    np.testing.assert_allclose(delta, delta_ref, atol=1e-8 * scale,
                               rtol=1e-7)


def test_partition_covers_all_keys():
    n_poses = 40
    _, _, ki, kj = _make_pose_graph(n_poses)
    st = sharded_posegraph.ShardedPoseGraphStructure.build(ki, kj, n_poses, 4)
    seen = set(st.separator.tolist())
    for block in st.interior:
        assert not (seen & set(block.tolist()))   # interiors disjoint from sep
        seen |= set(block.tolist())
    assert seen == set(range(n_poses))
    # every factor is owned by exactly one device
    owned = np.concatenate(st.factor_shard)
    assert sorted(owned.tolist()) == list(range(len(ki) + 1 - 1 + 1))[:len(ki)]


@pytest.mark.parametrize("ndev", [
    pytest.param(2, marks=pytest.mark.slow),
    8,
])
def test_sharded_supernodal_matches_single(ndev):
    """Sparse-interior sharded solver (round 5: supernodal partial
    elimination per shard, separator Schur psum — NestedDissection-inl.h
    analog) must match the single-device dense damped-GN delta exactly."""
    from gtsam_tpu.parallel import sharded_supernodal
    n_poses = 48
    graph, values, ki, kj = _make_pose_graph(n_poses)
    lam = 1e-3
    H, g = graph.bind(values).gn_system(values.arrays)
    H = np.asarray(H, dtype=np.float64)
    g = np.asarray(g, dtype=np.float64)
    delta_ref = np.linalg.solve(H + lam * np.eye(H.shape[0]), g)

    mesh = Mesh(np.array(jax.devices()[:ndev]).reshape(ndev), ("blocks",))
    st = sharded_posegraph.ShardedPoseGraphStructure.build(
        ki, kj, n_poses, ndev)
    solver = sharded_supernodal.make_sharded_supernodal_solver(
        mesh, st, graph, values)
    delta = np.asarray(solver(values.arrays, jnp.asarray(lam)))
    scale = max(1.0, np.abs(delta_ref).max())
    np.testing.assert_allclose(delta, delta_ref, atol=1e-8 * scale,
                               rtol=1e-7)
