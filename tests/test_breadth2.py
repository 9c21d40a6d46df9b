"""Tests for round-2 breadth components: Sim2, Cyclic, kruskal, Scenario/
ScenarioRunner, NonlinearISAM (reference: testSimilarity2.cpp, testCyclic.cpp,
ScenarioRunner-based navigation tests, testNonlinearISAM.cpp)."""

import numpy as np
import pytest
import jax.numpy as jnp

import gtsam_tpu as gt
from gtsam_tpu.geometry import sim2
from gtsam_tpu.geometry.cyclic import Cyclic
from gtsam_tpu.base.kruskal import kruskal
from gtsam_tpu.navigation import scenario as sc
from gtsam_tpu.navigation.navstate import local as nav_local
from gtsam_tpu.nonlinear.nonlinear_isam import NonlinearISAM

rng = np.random.default_rng(7)


class TestSim2:
    def test_exp_log_roundtrip(self):
        for _ in range(5):
            xi = jnp.asarray(rng.normal(scale=0.8, size=4))
            T = sim2.expmap(xi)
            np.testing.assert_allclose(np.asarray(sim2.logmap(T)),
                                       np.asarray(xi), atol=1e-9)

    def test_group_ops(self):
        a = sim2.expmap(jnp.asarray(rng.normal(size=4) * 0.5))
        b = sim2.expmap(jnp.asarray(rng.normal(size=4) * 0.5))
        ab = sim2.compose(a, b)
        # between(a, ab) == b
        d = sim2.between(a, ab)
        np.testing.assert_allclose(np.asarray(d.R), np.asarray(b.R),
                                   atol=1e-10)
        np.testing.assert_allclose(np.asarray(d.t), np.asarray(b.t),
                                   atol=1e-10)
        # inverse roundtrip
        ai = sim2.inverse(a)
        ident = sim2.compose(a, ai)
        np.testing.assert_allclose(np.asarray(ident.R), np.eye(2), atol=1e-12)
        np.testing.assert_allclose(np.asarray(ident.t), 0, atol=1e-12)
        np.testing.assert_allclose(float(ident.s), 1.0, atol=1e-12)

    def test_action_and_align(self):
        T = sim2.Sim2(sim2._rot2(jnp.asarray(0.7)), jnp.asarray([1.0, -2.0]),
                      jnp.asarray(1.7))
        p = jnp.asarray(rng.normal(size=(6, 2)))
        q = sim2.transform_from(T, p)
        pairs = jnp.stack([q, p], axis=1)
        T2 = sim2.align_pairs(pairs)
        np.testing.assert_allclose(np.asarray(T2.R), np.asarray(T.R),
                                   atol=1e-9)
        np.testing.assert_allclose(np.asarray(T2.t), np.asarray(T.t),
                                   atol=1e-9)
        np.testing.assert_allclose(float(T2.s), float(T.s), atol=1e-9)

    def test_values_retract(self):
        from gtsam_tpu.graph import manifolds
        m = manifolds.get("Sim2")
        T = m.identity()
        xi = jnp.asarray([0.1, -0.2, 0.3, 0.05])
        T2 = m.retract(T, xi)
        np.testing.assert_allclose(np.asarray(m.local(T, T2)),
                                   np.asarray(xi), atol=1e-9)


class TestCyclic:
    def test_group(self):
        g = Cyclic(6)
        assert int(g.compose(2, 5)) == 1
        assert int(g.inverse(2)) == 4
        assert int(g.between(5, 2)) == 3
        assert int(g.compose(g.inverse(3), 3)) == int(g.identity())


class TestKruskal:
    def test_chain_vs_loop(self):
        # 4 vertices, edges: chain 0-1,1-2,2-3 cheap, loop closure 0-3 costly
        edges = np.array([[0, 1], [1, 2], [2, 3], [0, 3]])
        w = [1.0, 1.0, 1.0, 10.0]
        mst = kruskal(4, edges, w)
        assert list(mst) == [0, 1, 2]

    def test_prefers_light_edges(self):
        edges = np.array([[0, 1], [0, 1], [1, 2]])
        w = [5.0, 1.0, 2.0]
        mst = kruskal(3, edges, w)
        assert list(mst) == [1, 2]


class TestScenario:
    def test_accelerating_exact(self):
        s = sc.accelerating(np.eye(3), [0, 0, 0], [1, 0, 0], [0.3, 0, 0],
                            [0, 0, 0.05])
        r = sc.ScenarioRunner(s, imu_dt=0.01)
        pim = r.integrate(2.0)
        pred = r.predict(pim)
        err = np.abs(np.asarray(nav_local(s.nav_state(2.0), pred)))
        assert err.max() < 1e-8

    def test_constant_twist_circle(self):
        s = sc.constant_twist([0, 0, 0.3], [2, 0, 0])
        r = sc.ScenarioRunner(s, imu_dt=0.005)
        pim = r.integrate(3.0)
        pred = r.predict(pim)
        err = np.abs(np.asarray(nav_local(s.nav_state(3.0), pred)))
        assert err.max() < 5e-3  # first-order integrator discretization

    def test_specific_force_hovering(self):
        # hovering (no motion): accelerometer measures -gravity
        s = sc.constant_twist([0, 0, 0], [0, 0, 0])
        r = sc.ScenarioRunner(s)
        f = np.asarray(r.actual_specific_force(0.0))
        np.testing.assert_allclose(f, [0, 0, 9.81], atol=1e-12)


class TestNonlinearISAM:
    @pytest.mark.slow
    def test_matches_batch_at_reorder(self):
        isam = NonlinearISAM(reorder_interval=1)
        graph_all = gt.FactorGraph()
        prior = gt.prior_factors("SE2", [0], np.zeros((1, 3)),
                                 gt.noise.sigmas([[0.01, 0.01, 0.01]]))
        isam.update([prior], [(0, "SE2", np.zeros(3))])
        graph_all.add(prior)
        from gtsam_tpu.geometry import se2
        est_prev = np.zeros(3)
        entries = [(0, "SE2", np.zeros(3))]
        for i in range(1, 6):
            meas = np.array([1.0, 0.0, 0.2]) + rng.normal(scale=0.03, size=3)
            b = gt.between_factors("SE2", [i - 1], [i], meas[None],
                                   gt.noise.sigmas([[0.05, 0.05, 0.02]]))
            guess = np.asarray(se2.compose(jnp.asarray(est_prev),
                                           jnp.asarray(meas)))
            isam.update([b], [(i, "SE2", guess)])
            graph_all.add(b)
            entries.append((i, "SE2", guess))
            est_prev = np.asarray(isam.estimate().at(i))
        batch = gt.gauss_newton(graph_all,
                                gt.Values.from_entries(entries))
        for i in range(6):
            np.testing.assert_allclose(np.asarray(isam.estimate().at(i)),
                                       np.asarray(batch.values.at(i)),
                                       atol=1e-5)
