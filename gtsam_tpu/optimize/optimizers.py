"""Batch nonlinear optimizers: Gauss-Newton, Levenberg-Marquardt, Dogleg.

Semantics mirror the reference drivers:
  - NonlinearOptimizer::defaultOptimize / checkConvergence
    (gtsam/nonlinear/NonlinearOptimizer.cpp:62-120, :182)
  - LevenbergMarquardtOptimizer::iterate / tryLambda
    (gtsam/nonlinear/LevenbergMarquardtOptimizer.cpp:121-273)
  - DoglegOptimizerImpl (gtsam/nonlinear/DoglegOptimizerImpl.h:95,138)

The outer loop runs on host (few iterations, each a single jitted device
computation: linearize + assemble + factorize + retract).  Solvers are
pluggable; the default dense Cholesky path is correct for small/medium graphs,
with the sparse supernodal path (linear/) used for large ones.
"""

import dataclasses
import math
from typing import Optional
import jax
import jax.numpy as jnp
from ..config import default_dtype as _default_dtype
import numpy as np

from ..graph.graph import FactorGraph
from ..graph.values import Values, retract_arrays


@dataclasses.dataclass
class OptimizerParams:
    max_iterations: int = 100
    relative_error_tol: float = 1e-5
    absolute_error_tol: float = 1e-5
    error_tol: float = 0.0
    verbose: bool = False


@dataclasses.dataclass
class LMParams(OptimizerParams):
    lambda_initial: float = 1e-5
    lambda_factor: float = 10.0
    lambda_upper_bound: float = 1e5
    lambda_lower_bound: float = 0.0
    diagonal_damping: bool = False
    min_diagonal: float = 1e-6   # LevenbergMarquardtOptimizer.cpp damping clamps
    max_diagonal: float = 1e32
    # lambda schedule policy:
    #   "gtsam"        — always decrease on accept (LevenbergMarquardt
    #                    Optimizer.cpp semantics); re-probes a failed lambda
    #                    every iteration (one wasted solve each).
    #   "conservative" — decrease only on a clean first-try accept and never
    #                    probe a lambda that already failed.  Cheapest tries,
    #                    but can lock lambda high and crawl near convergence.
    #   "gain"         — Nielsen/Ceres gain-ratio: lambda *= max(1/3,
    #                    1-(2*rho-1)^3) on accept (rho = actual/predicted
    #                    decrease), *= nu doubling on reject.  Smooth decay,
    #                    no probe retries; the policy the reference's BAL
    #                    baseline driver (Ceres defaults) runs.
    lambda_policy: str = "gtsam"


@dataclasses.dataclass
class DoglegParams(OptimizerParams):
    initial_delta: float = 1.0


@dataclasses.dataclass
class OptimizeResult:
    values: Values
    error: float
    iterations: int
    converged: bool
    history: list


def check_convergence(current: float, new: float, p: OptimizerParams) -> bool:
    """Reference NonlinearOptimizer.cpp:182 checkConvergence."""
    if new <= p.error_tol:
        return True
    delta = abs(current - new)
    return (delta <= p.absolute_error_tol
            or delta <= p.relative_error_tol * max(current, 1e-300))


def _dense_solve(H, g, lam, diagonal_damping, min_diag=1e-6, max_diag=1e32):
    """Solve (H + damping) dx = g by dense Cholesky."""
    if diagonal_damping:
        d = jnp.clip(jnp.diagonal(H), min_diag, max_diag)
        Hd = H + jnp.diag(lam * d)
    else:
        Hd = H + lam * jnp.eye(H.shape[0], dtype=H.dtype)
    L = jnp.linalg.cholesky(Hd)
    dx = jax.scipy.linalg.cho_solve((L, True), g)
    return dx


def _kkt_solve(H, g, C, c, lam, diagonal_damping,
               min_diag=1e-6, max_diag=1e32):
    """Equality-constrained GN step: min 0.5 dx'H dx - g'dx  s.t.  C dx = c.

    Solves the KKT system [[H+damping, C'], [C, -eps I]] [dx; nu] = [g; c]
    (the TPU-native replacement for the reference's constraint-aware QR,
    NoiseModel.h:260 — LM damping applies to H only, constraints stay exact;
    the -eps regularizer keeps LU nonsingular under redundant constraints)."""
    D = H.shape[0]
    m = C.shape[0]
    if diagonal_damping:
        d = jnp.clip(jnp.diagonal(H), min_diag, max_diag)
        Hd = H + jnp.diag(lam * d)
    else:
        Hd = H + lam * jnp.eye(D, dtype=H.dtype)
    eps = jnp.asarray(1e-12 if H.dtype == jnp.float64 else 1e-6, H.dtype)
    K = jnp.block([[Hd, C.T], [C, -eps * jnp.eye(m, dtype=H.dtype)]])
    rhs = jnp.concatenate([g, c])
    sol = jnp.linalg.solve(K, rhs)
    return sol[:D]


class DenseSolver:
    """Dense normal-equations + Cholesky (default for small/medium graphs);
    graphs with 'constrained' noise rows get an exact KKT solve."""

    def bind(self, bound):
        self._bound = bound
        return self

    def system(self, arrays):
        if getattr(self._bound, "num_constraints", 0):
            H, g = self._bound.gn_system(arrays)
            C, c = self._bound.constraint_system(arrays)
            return H, g, C, c
        return self._bound.gn_system(arrays)

    def solve(self, system, lam, diagonal_damping):
        if len(system) == 4:
            H, g, C, c = system
            return _kkt_solve(H, g, C, c, lam, diagonal_damping)
        H, g = system
        return _dense_solve(H, g, lam, diagonal_damping)

    def predicted_decrease(self, system, dx, lam, diagonal_damping):
        """Linear-model decrease L(0)-L(dx) = 0.5*(dx'g + lam*dx'D dx) of
        the damped GN model (the gain-ratio denominator;
        LevenbergMarquardtOptimizer.cpp:168 linearizedCostChange analog)."""
        H, g = system[0], system[1]
        if diagonal_damping:
            d = jnp.clip(jnp.diagonal(H), 1e-6, 1e32)
        else:
            d = 1.0
        return 0.5 * (jnp.dot(dx, g) + lam * jnp.sum(d * dx * dx))


class DenseQRSolver:
    """Dense QR elimination (EliminatePreferQR analog, gtsam/linear/
    GaussianFactorGraph.cpp + JacobianFactor::eliminate): stack the whitened
    Jacobian rows, factor [A; sqrt(damping)] = QR, solve R dx = Q'b.

    Rank-revealing: a (near-)zero diagonal of R marks an unconstrained
    tangent direction; solve() raises IndeterminantLinearSystemError naming
    the offending column — the splitConditional throw
    (gtsam/linear/JacobianFactor.cpp:838).  More numerically robust than
    normal equations (condition kappa vs kappa^2) at ~2x the flops; on TPU
    the QR itself rides the MXU via jnp.linalg.qr."""

    def bind(self, bound):
        # sigma == 0 rows: QR of the WEIGHTED rows + augmented-Lagrangian
        # refinement to the exact KKT point (see _soften_constraints /
        # SparseSolver._solve_constrained; the reference pivots constrained
        # rows inside QR, NoiseModel.h:514)
        self._orig_bound = bound
        self._w = None
        if getattr(bound, "num_constraints", 0):
            self._w = 1e3 if _default_dtype() == jnp.float64 else 1e2
            bound = _soften_constraints(bound, self._w)
        self._bound = bound
        return self

    def system(self, arrays):
        if self._w is not None:
            A, b = self._assemble(arrays)
            C, c = self._orig_bound.constraint_system(arrays)
            return A, b, C, c
        return self._assemble(arrays)

    def _assemble(self, arrays):
        A_rows, b_rows = [], []
        D = self._bound.layout.total_dim
        from ..graph import factors as factors_mod
        for b, st in zip(self._bound.graph.batches, self._bound.structures):
            xs = tuple(
                jax.tree.map(lambda a: a[st.rows[s]], arrays[t])
                for s, t in enumerate(b.var_types))
            wJ, wb = factors_mod.linearize(b, xs)
            n, r = b.num_factors, b.rdim
            A = jnp.zeros((n, r, D), dtype=wb.dtype)
            dims = b.dims()
            for s in range(b.arity):
                shp = (n, r, dims[s])
                cols = np.broadcast_to(
                    np.asarray(st.col_offsets[s])[:, None, None]
                    + np.arange(dims[s])[None, None, :], shp)
                rows_idx = np.broadcast_to(
                    np.arange(n)[:, None, None], shp)
                rr = np.broadcast_to(np.arange(r)[None, :, None], shp)
                A = A.at[rows_idx, rr, cols].add(wJ[s])
            A_rows.append(A.reshape(n * r, D))
            b_rows.append(wb.reshape(n * r))
        return jnp.concatenate(A_rows), jnp.concatenate(b_rows)

    def solve(self, system, lam, diagonal_damping):
        if len(system) == 4:
            A, b, C, c = system
        else:
            A, b = system
            C = None
        D = A.shape[1]
        damp = jnp.sqrt(jnp.asarray(lam, dtype=A.dtype))
        Aaug = jnp.concatenate([A, damp * jnp.eye(D, dtype=A.dtype)])
        baug = jnp.concatenate([b, jnp.zeros(D, dtype=b.dtype)])
        Q, R = jnp.linalg.qr(Aaug)
        rdiag = jnp.abs(jnp.diagonal(R))
        dx = jax.scipy.linalg.solve_triangular(R, Q.T @ baug, lower=False)
        if C is not None:
            # AL refinement over R (corrected-seminormal re-solves): reach
            # the exact KKT point of the sigma=0 rows
            w2 = jnp.asarray(self._w, dtype=b.dtype) ** 2
            nu = jnp.zeros_like(c)
            gb = A.T @ b
            for _ in range(3):
                nu = nu + w2 * (c - C @ dx)
                rhs = gb + C.T @ nu
                dx = jax.scipy.linalg.solve_triangular(
                    R, jax.scipy.linalg.solve_triangular(
                        R.T, rhs, lower=True), lower=False)
        # rank-revealing: tiny pivots (undamped) mean an unconstrained gauge
        # direction — poison the step so the driver's finite-check trips and
        # check_system() raises with the offending column (f64 roundoff makes
        # the pivot ~1e-17, not exactly 0, so the solve alone stays finite)
        bad = jnp.any(rdiag <= 1e-10 * jnp.max(rdiag))
        return jnp.where(bad, jnp.full_like(dx, jnp.nan), dx)

    def check_system(self, arrays, lam=0.0):
        """Raise IndeterminantLinearSystemError on rank deficiency."""
        from ..linear.exceptions import IndeterminantLinearSystemError
        A, b = self.system(arrays)[:2]
        D = A.shape[1]
        if A.shape[0] < D:   # wide system: pad so R is square and trailing
            A = jnp.concatenate(    # pivots expose the missing rank
                [A, jnp.zeros((D - A.shape[0], D), dtype=A.dtype)])
        _, R = jnp.linalg.qr(A)
        rdiag = np.abs(np.asarray(jnp.diagonal(R)))
        scale = float(rdiag.max()) if rdiag.size else 1.0
        bad = np.where(rdiag <= 1e-9 * max(scale, 1e-30))[0]
        if len(bad):
            raise IndeterminantLinearSystemError(int(bad[0]))


def _soften_constraints(bound, weight: float):
    """Bound graph with sigma==0 rows replaced by weight-`weight` soft rows.

    The TPU-native sparse path for Constrained noise is the METHOD OF
    WEIGHTING (the reference pivots constrained rows in QR, NoiseModel.h:514 —
    dynamic pivoting is hostile to static-shape level-scheduled kernels):
    hard rows enter the normal equations with precision weight^2, giving
    constraint violation O(weight^-2) — ~1e-10 relative at the f64 default
    (the weight balances constraint bias against Cholesky cancellation of the
    soft information, which grows as weight^2 * eps).
    Exactness vs the dense KKT path is covered by tests/test_constrained.py.
    Structures/layout are shared with the original bound graph (noise does not
    affect symbolic structure)."""
    import copy

    from ..base.noise import NoiseModel

    batches = []
    for b in bound.graph.batches:
        nz = b.noise
        if nz.kind == "constrained":
            data = jnp.where(jnp.asarray(nz.data) == 0, weight,
                             jnp.asarray(nz.data))
            b = dataclasses.replace(
                b, noise=NoiseModel("diagonal", data, nz.loss, nz.mu))
        batches.append(b)
    soft = copy.copy(bound)
    soft.graph = type(bound.graph)(batches)
    soft._constraints = []
    soft.num_constraints = 0
    return soft


class SparseSolver:
    """Sparse block Cholesky.

    method='supernodal' (default): amalgamated-clique level-scheduled
    factorization (linear/supernodal.py) — batched dense fronts per assembly
    tree level, full diagonal-damping support, pivot failure detection.
    method='levels': the per-variable level schedule (linear/sparse.py).

    Constrained (sigma == 0) rows are handled by the method of weighting
    (see _soften_constraints); constraint_weight defaults per dtype.
    """

    def __init__(self, order: str = "auto", method: str = "supernodal",
                 constraint_weight: Optional[float] = None,
                 refine_iters: Optional[int] = None,
                 supernodal_kwargs: Optional[dict] = None):
        # method="qr": multifrontal QR on the whitened Jacobian rows — the
        # reference's default EliminateQR (JacobianFactor.cpp:778) — using
        # the same supernodal structure; kappa(A) conditioning instead of
        # kappa(A)^2 and rank-revealing pivots.  No diagonal_damping.
        self._order = order
        self._method = method
        self._cweight = constraint_weight
        self._sn_kwargs = supernodal_kwargs or {}
        # f64-refined steps are available (solve_refined) but default OFF:
        # with the hi-precision residual policy the f32 factorization's step
        # quality already sustains LM accepts (measured on sphere2500), and
        # each refinement pass costs two extra back-substitutions plus a
        # block matvec whose segment-sums scatter (slow in emulated f64)
        self._refine = refine_iters or 0

    def bind(self, bound):
        self._orig_bound = bound
        self._w = None
        if getattr(bound, "num_constraints", 0):
            w = self._cweight
            if w is None:
                # modest weight: the augmented-Lagrangian refinement supplies
                # exactness (contraction ~1/w^2 per pass), so w only needs to
                # keep M=H+w^2C'C well-separated — large w would instead
                # poison the factorization with cond(M) ~ w^2
                w = 1e3 if _default_dtype() == jnp.float64 else 1e2
            self._w = w
            bound = _soften_constraints(bound, w)
        if self._method in ("supernodal", "qr"):
            from ..linear.supernodal import SupernodalCholeskySolver
            self._s = SupernodalCholeskySolver(bound, order=self._order,
                                               **self._sn_kwargs)
        else:
            from ..linear.sparse import SparseCholeskySolver
            self._s = SparseCholeskySolver(bound, order=self._order)
        return self

    def system(self, arrays):
        if self._w is not None and self._method in ("supernodal", "qr"):
            blocks, g = self._s.system(arrays)
            C, c = self._orig_bound.constraint_system(arrays)
            if self._method == "qr":
                return blocks, g, C, c, arrays
            return blocks, g, C, c
        if self._method == "qr":
            blocks, g = self._s.system(arrays)
            return blocks, g, arrays
        return self._s.system(arrays)

    def solve(self, system, lam, diagonal_damping):
        if self._method == "qr":
            if diagonal_damping:
                raise NotImplementedError(
                    "sparse QR supports plain lambda damping only")
            if len(system) == 5:
                return self._solve_constrained(system[:4], lam, False,
                                               arrays=system[4])
            blocks, g, arrays = system
            factored = self._s.factorize_qr(arrays, lam)
            if self._refine:
                x = self._s._solve_padded(factored, g)
                from ..base import twofloat as _tf
                xp = (x, jnp.zeros_like(x))
                for _ in range(self._refine):
                    mv = self._s.matvec_df(blocks, xp, lam)
                    rh, rl = _tf.sub(g, jnp.zeros_like(g), mv[0], mv[1])
                    corr = self._s._solve_padded(factored, rh + rl)
                    xp = _tf.add(*xp, corr, jnp.zeros_like(corr))
                return self._s._flatten(_tf.to_f32(*xp))
            return self._s.solve_factored(factored, g)
        if len(system) == 4:
            return self._solve_constrained(system, lam, diagonal_damping)
        blocks, g = system
        if self._method == "supernodal":
            if self._refine:
                # two-float refinement (native f32 VPU EFTs) — the emulated
                # f64 variant (solve_refined) survives for cross-checks
                return self._s.solve_refined_df(blocks, g, lam,
                                                diagonal_damping,
                                                self._refine)
            factored = self._s.factorize(blocks, lam, diagonal_damping)
        else:
            # per-variable path: lam*I damping only
            factored = self._s.factorize(blocks, lam)
        return self._s.solve_factored(factored, g)

    def _solve_constrained(self, system, lam, diagonal_damping,
                           al_iters: int = 3, arrays=None):
        """EXACT sigma=0 constraints on the sparse path: method of weighting
        + augmented-Lagrangian refinement.

        The factorized system is the weighted one, M = H + w^2 C'C (damped);
        iterating  dx_k = M^-1 (g_w + C' nu_k),  nu_{k+1} = nu_k + w^2 (c -
        C dx_k)  contracts the constraint violation by ~O(1/w^2) per pass, so
        three passes reach the exact KKT solution to machine precision —
        replacing the O(w^-2) bias of plain weighting (reference handles this
        with constraint-aware QR pivoting, NoiseModel.h:260,514; pivoting is
        hostile to static-shape batched fronts, refinement is not)."""
        blocks, g, C, c = system
        if self._method == "qr":
            # QR of the WEIGHTED rows (bind() softened the bound), then the
            # same AL fixed-point over re-solves
            factored = self._s.factorize_qr(arrays, lam)
        else:
            factored = self._s.factorize(blocks, lam, diagonal_damping)
        w2 = jnp.asarray(self._w, dtype=g.dtype) ** 2
        nu = jnp.zeros_like(c)
        dx = None
        for _ in range(al_iters):
            rhs = g + self._s.pack_rhs(C.T @ nu)
            dx = self._s.solve_factored(factored, rhs)
            nu = nu + w2 * (c - C @ dx)
        return dx

    def predicted_decrease(self, system, dx, lam, diagonal_damping):
        """Linear-model decrease 0.5*(dx'g + lam*dx'D dx) (gain-ratio
        denominator) on the block-sparse store."""
        if self._method != "supernodal":
            raise NotImplementedError(
                "gain-ratio lambda policy needs the supernodal solver")
        blocks, g = system[0], system[1]
        xp = self._s.pack_rhs(dx)
        damp = self._s._damp_vec(blocks, lam, diagonal_damping)
        return 0.5 * (jnp.sum(xp * g) + jnp.sum(damp * xp * xp))

    def check_system(self, arrays, lam=0.0):
        """Raise IndeterminantLinearSystemError on bad pivots (supernodal)."""
        if self._method == "supernodal":
            self._s.check_system(arrays, lam)


def _auto_solver(bound):
    """Pick DenseSolver for small systems / constrained graphs, the
    supernodal sparse solver for large ones (reference default is
    MULTIFRONTAL_CHOLESKY, NonlinearOptimizerParams)."""
    if getattr(bound, "num_constraints", 0):
        return DenseSolver()
    if bound.layout.total_dim <= 1024:
        return DenseSolver()
    return SparseSolver()


def _make_step_fns(graph: FactorGraph, values: Values, solver=None):
    bound = graph.bind(values)
    layout = values.layout()
    solver = (solver or _auto_solver(bound)).bind(bound)

    @jax.jit
    def error_fn(arrays):
        return bound.error(arrays)

    @jax.jit
    def system_fn(arrays):
        return solver.system(arrays)

    from functools import partial

    @partial(jax.jit, static_argnums=(3,))
    def try_step(arrays, system, lam, diagonal_damping):
        dx = solver.solve(system, lam, diagonal_damping)
        new_arrays = retract_arrays(arrays, dx, layout)
        new_error = bound.error(new_arrays)
        return dx, new_arrays, new_error

    return bound, error_fn, system_fn, try_step, solver


def gauss_newton(graph: FactorGraph, initial: Values,
                 params: OptimizerParams = None, solver=None) -> OptimizeResult:
    params = params or OptimizerParams()
    bound, error_fn, system_fn, try_step, solver_obj = _make_step_fns(
        graph, initial, solver)
    arrays = initial.arrays
    error = float(error_fn(arrays))
    history = [error]
    converged = False
    it = 0
    for it in range(1, params.max_iterations + 1):
        system = system_fn(arrays)
        _, new_arrays, new_error = try_step(arrays, system, 0.0, False)
        new_error = float(new_error)
        if params.verbose:
            print(f"GN iter {it}: error {error:.6g} -> {new_error:.6g}")
        if not math.isfinite(new_error):
            # localize the failure (IndeterminantLinearSystemException analog)
            if hasattr(solver_obj, "check_system"):
                solver_obj.check_system(arrays, lam=0.0)
            break
        arrays, prev, error = new_arrays, error, new_error
        history.append(error)
        if check_convergence(prev, error, params):
            converged = True
            break
    return OptimizeResult(initial.replace_arrays(arrays), error, it, converged, history)


def levenberg_marquardt(graph: FactorGraph, initial: Values,
                        params: LMParams = None, solver=None) -> OptimizeResult:
    params = params or LMParams()
    bound, error_fn, system_fn, try_step, _solver_obj = _make_step_fns(
        graph, initial, solver)
    arrays = initial.arrays
    error = float(error_fn(arrays))
    history = [error]
    lam = params.lambda_initial
    converged = False
    it = 0
    for it in range(1, params.max_iterations + 1):
        system = system_fn(arrays)
        accepted = False
        prev = error
        while True:
            dx, new_arrays, new_error = try_step(arrays, system, lam, params.diagonal_damping)
            new_error = float(new_error)
            if math.isfinite(new_error) and new_error < error:
                # accept, decrease lambda (tryLambda: lambda /= factor on success)
                arrays, error = new_arrays, new_error
                lam = max(lam / params.lambda_factor, params.lambda_lower_bound)
                accepted = True
                break
            lam *= params.lambda_factor
            if lam > params.lambda_upper_bound:
                break
        if params.verbose:
            print(f"LM iter {it}: error {prev:.6g} -> {error:.6g} lambda {lam:.3g}")
        history.append(error)
        if not accepted:
            break
        if check_convergence(prev, error, params):
            converged = True
            break
    return OptimizeResult(initial.replace_arrays(arrays), error, it, converged, history)


def make_fused_lm(graph: FactorGraph, initial: Values,
                  params: LMParams = None, solver=None):
    """Build the fused on-device LM program (see levenberg_marquardt_fused).

    Returns a jitted `fn(arrays) -> (it, arrays, error, converged, hist)` so
    callers (benchmarks, serving loops) can separate compile from run."""
    import jax.lax as lax

    params = params or LMParams()
    bound = graph.bind(initial)
    layout = initial.layout()
    solver = (solver or _auto_solver(bound)).bind(bound)
    maxit = params.max_iterations
    dt = _default_dtype()

    def lm_outer(arrays0):
        error0 = bound.error(arrays0)
        # `tries` counts every solve+error probe (accepted or rejected) —
        # the unit of real cost; observability for lambda-policy tuning

        use_gain = params.lambda_policy == "gain"
        conservative = params.lambda_policy == "conservative"

        def outer_cond(st):
            it, _, _, _, _, _, done, _, _, _ = st
            return (it < maxit) & ~done

        def outer_body(st):
            it, arrays, error, lam, ceil, nu, _, _, hist, tries = st
            system = solver.system(arrays)

            def try_cond(ts):
                lam_t, accepted = ts[0], ts[1]
                return ~accepted & (lam_t <= params.lambda_upper_bound)

            def try_body(ts):
                lam_t, _, _, _, ceil_t, nu_t, _, nt = ts
                dx = solver.solve(system, lam_t, params.diagonal_damping)
                new_arrays = retract_arrays(arrays, dx, layout)
                ne = bound.error(new_arrays)
                ok = jnp.isfinite(ne) & (ne < error)
                if use_gain:
                    pred = solver.predicted_decrease(
                        system, dx, lam_t, params.diagonal_damping)
                    rho = ((error - ne).astype(dt)
                           / jnp.maximum(pred.astype(dt), 1e-30))
                else:
                    rho = jnp.asarray(0.0, dtype=dt)
                # gain mode climbs by lambda_factor on the iteration's first
                # reject (fast escape from a too-low lambda), then Nielsen
                # nu-doubling takes over
                fac = (jnp.maximum(nu_t, params.lambda_factor)
                       if use_gain else params.lambda_factor)
                lam_next = jnp.where(ok, lam_t, lam_t * fac)
                nu_next = jnp.where(ok, nu_t, 2.0 * nu_t)
                ceil_next = jnp.where(ok, ceil_t, jnp.maximum(ceil_t, lam_t))
                keep = lambda a, b: jax.tree.map(
                    lambda x, y: jnp.where(ok, x, y), a, b)
                return (lam_next, ok, keep(new_arrays, arrays),
                        jnp.where(ok, ne, error), ceil_next, nu_next,
                        jnp.where(ok, rho, 0.0), nt + 1)

            (lam_f, accepted, new_arrays, new_error, ceil, nu,
             rho, tries) = lax.while_loop(
                try_cond, try_body,
                (lam, jnp.asarray(False), arrays, error, ceil, nu,
                 jnp.asarray(0.0, dtype=dt), tries))
            if use_gain:
                # Nielsen update: lam *= max(1/3, 1-(2*rho-1)^3) on accept.
                # (A deeper floor was tried and measured WORSE on sphere2500:
                # very-low-lambda steps expose the f32 assembly noise in the
                # gradient and the tail decrements crawl.)
                t = 2.0 * rho - 1.0
                dec = jnp.maximum(jnp.asarray(1.0 / 3.0, dt), 1.0 - t * t * t)
                lam_out = jnp.where(
                    accepted,
                    jnp.maximum(lam_f * dec, params.lambda_lower_bound),
                    lam_f)
                nu_out = jnp.where(accepted, jnp.asarray(2.0, dt), nu)
            else:
                nxt = jnp.maximum(lam_f / params.lambda_factor,
                                  params.lambda_lower_bound)
                # conservative: decrease only on a clean first-try accept and
                # never probe a lambda that already failed (the ceiling) —
                # each failed probe costs a full factorize+solve
                dec_ok = (accepted & (lam_f == lam) & (nxt > ceil)) if \
                    conservative else accepted
                lam_out = jnp.where(dec_ok, nxt, lam_f)
                nu_out = nu
            delta = jnp.abs(error - new_error)
            converged = ((new_error <= params.error_tol)
                         | (delta <= params.absolute_error_tol)
                         | (delta <= params.relative_error_tol
                            * jnp.maximum(error, 1e-300)))
            hist = hist.at[it + 1].set(new_error.astype(hist.dtype))
            return (it + 1, new_arrays, new_error, lam_out, ceil, nu_out,
                    ~accepted | converged, accepted & converged, hist, tries)

        hist0 = jnp.full((maxit + 1,), jnp.nan,
                         dtype=dt).at[0].set(error0.astype(dt))
        st = (jnp.asarray(0), arrays0, error0,
              jnp.asarray(params.lambda_initial, dtype=dt),
              jnp.asarray(0.0, dtype=dt),
              jnp.asarray(2.0, dtype=dt),
              jnp.asarray(False), jnp.asarray(False), hist0,
              jnp.asarray(0))
        it, arrays, error, _, _, _, _, conv, hist, tries = lax.while_loop(
            outer_cond, outer_body, st)
        return it, arrays, error, conv, hist, tries

    return jax.jit(lm_outer)


def levenberg_marquardt_fused(graph: FactorGraph, initial: Values,
                              params: LMParams = None,
                              solver=None) -> OptimizeResult:
    """Fully on-device LM: the ENTIRE optimize loop — linearize, lambda
    search, accept/reject, convergence test — is one jitted program built
    from `lax.while_loop`s (SURVEY.md §7 hard part (f): keep the lambda
    search on-device).  One compile, zero host<->device round trips per
    iteration; semantics match `levenberg_marquardt` (tryLambda policy of
    LevenbergMarquardtOptimizer.cpp:121-215 with error-decrease acceptance).

    `solver` defaults to auto-selection: dense normal equations (with the
    exact-constraint KKT block when the graph has sigma==0 rows) for small
    systems, the supernodal sparse solver for large ones — the whole sparse
    level schedule is jit-safe, so sphere2500-class pose graphs run the full
    LM loop as one XLA program."""
    fn = make_fused_lm(graph, initial, params, solver)
    it, arrays, error, conv, hist, _tries = fn(initial.arrays)
    it = int(it)
    hist = np.asarray(hist)
    history = [float(h) for h in hist[:it + 1] if math.isfinite(h)]
    return OptimizeResult(initial.replace_arrays(arrays), float(error), it,
                          bool(conv), history)


def nonlinear_conjugate_gradient(graph: FactorGraph, initial: Values,
                                 params: OptimizerParams = None) -> OptimizeResult:
    """Manifold nonlinear CG with Polak-Ribiere direction updates and
    backtracking line search (gtsam/nonlinear/
    NonlinearConjugateGradientOptimizer.{h,cpp}: System::gradient + lineSearch).

    The tangent gradient comes from autodiff through retract at zero — the
    JAX-native replacement for the reference's gradientInPlace.
    """
    params = params or OptimizerParams()
    bound = graph.bind(initial)
    layout = initial.layout()

    @jax.jit
    def error_fn(arrays):
        return bound.error(arrays)

    @jax.jit
    def grad_fn(arrays):
        dim = layout.total_dim
        zero = jnp.zeros(dim, dtype=_default_dtype())
        return jax.grad(
            lambda dx: bound.error(retract_arrays(arrays, dx, layout)))(zero)

    @jax.jit
    def eval_at(arrays, d, t):
        return bound.error(retract_arrays(arrays, t * d, layout))

    arrays = initial.arrays
    error = float(error_fn(arrays))
    history = [error]
    g = grad_fn(arrays)
    d = -g
    converged = False
    it = 0
    step0 = 1.0
    for it in range(1, params.max_iterations + 1):
        # backtracking Armijo line search along d
        gd = float(jnp.dot(g, d))
        if gd >= 0:  # not a descent direction: restart with steepest descent
            d = -g
            gd = float(jnp.dot(g, d))
            if gd >= 0:
                break
        t = step0
        new_error = error
        for _ in range(30):
            cand = float(eval_at(arrays, d, t))
            if math.isfinite(cand) and cand <= error + 1e-4 * t * gd:
                new_error = cand
                break
            t *= 0.5
        else:
            break
        arrays = retract_arrays(arrays, t * d, layout)
        step0 = min(max(t * 2.0, 1e-8), 10.0)  # warm-start next search
        g_new = grad_fn(arrays)
        # Polak-Ribiere+ beta, restart when negative
        beta = float(jnp.dot(g_new, g_new - g) /
                     jnp.maximum(jnp.dot(g, g), 1e-300))
        beta = max(beta, 0.0)
        d = -g_new + beta * d
        g = g_new
        prev, error = error, new_error
        history.append(error)
        if params.verbose:
            print(f"NCG iter {it}: error {prev:.6g} -> {error:.6g} step {t:.3g}")
        if check_convergence(prev, error, params):
            converged = True
            break
    return OptimizeResult(initial.replace_arrays(arrays), error, it, converged,
                          history)


def dogleg(graph: FactorGraph, initial: Values,
           params: DoglegParams = None, solver=None) -> OptimizeResult:
    """Trust-region dogleg combining GN and steepest-descent steps
    (DoglegOptimizerImpl.h:95 ComputeDoglegPoint)."""
    params = params or DoglegParams()
    bound, error_fn, system_fn, try_step, solver_obj = _make_step_fns(
        graph, initial, solver)
    layout = initial.layout()
    constrained = bool(getattr(bound, "num_constraints", 0))
    err_bound = bound
    if constrained:
        # sigma == 0 rows: optimize the method-of-weighting penalty objective
        # (its gradient/Hessian drive the Cauchy leg and the trust region)
        # while the GN leg is the EXACT KKT step — so at convergence, where
        # the full GN step fits the trust region, constraints land exactly.
        # Reference runs these through constraint-aware QR
        # (NoiseModel.h:260,514); see SparseSolver._solve_constrained for
        # why weighting+exact-steps is the batched-front-friendly form.
        w = 1e3 if _default_dtype() == jnp.float64 else 1e2
        soft = _soften_constraints(bound, w)
        err_bound = soft

        @jax.jit
        def error_fn(arrays):
            return soft.error(arrays)

        @jax.jit
        def system_fn(arrays):
            Hs, gs = soft.gn_system(arrays)
            C, c = bound.constraint_system(arrays)
            return Hs, gs, C, c
    sparse_sup = (not constrained
                  and isinstance(solver_obj, SparseSolver)
                  and solver_obj._method == "supernodal")

    def _dogleg_core(arrays, dx_gn, g, Hv, delta):
        # steepest descent: u = g (gradient direction), alpha = g'g / g'Hg
        Hg = Hv(g)
        gHg = g @ Hg
        alpha = jnp.where(gHg > 0, (g @ g) / jnp.maximum(gHg, 1e-300), 0.0)
        dx_u = alpha * g
        n_gn = jnp.linalg.norm(dx_gn)
        n_u = jnp.linalg.norm(dx_u)

        def blend():
            # find tau: || dx_u + tau (dx_gn - dx_u) || = delta
            d = dx_gn - dx_u
            a = d @ d
            b = 2.0 * (dx_u @ d)
            c = dx_u @ dx_u - delta * delta
            disc = jnp.maximum(b * b - 4 * a * c, 0.0)
            tau = (-b + jnp.sqrt(disc)) / jnp.maximum(2 * a, 1e-300)
            return dx_u + tau * d

        dx = jnp.where(n_gn <= delta, dx_gn,
                       jnp.where(n_u >= delta,
                                 dx_u * (delta / jnp.maximum(n_u, 1e-300)),
                                 blend()))
        new_arrays = retract_arrays(arrays, dx, layout)
        new_error = err_bound.error(new_arrays)
        # predicted reduction from the linear model: g'dx - 0.5 dx'H dx
        pred = g @ dx - 0.5 * dx @ Hv(dx)
        return dx, new_arrays, new_error, pred

    if sparse_sup:
        sup = solver_obj._s

        @jax.jit
        def dogleg_step(arrays, blocks, gpad, delta):
            factored = sup.factorize(blocks, 0.0, False)
            dx_gn = sup.solve_factored(factored, gpad)
            g = sup._flatten(gpad)

            def Hv(x):
                return sup._flatten(sup.matvec(blocks, sup.pack_rhs(x)))

            return _dogleg_core(arrays, dx_gn, g, Hv, delta)
    elif constrained:
        @jax.jit
        def dogleg_step(arrays, system, delta):
            Hs, gs, C, c = system
            dx_gn = _kkt_solve(Hs, gs, C, c, 0.0, False)
            return _dogleg_core(arrays, dx_gn, gs, lambda x: Hs @ x, delta)
    else:
        @jax.jit
        def dogleg_step(arrays, H, g, delta):
            dx_gn = _dense_solve(H, g, 0.0, False)
            return _dogleg_core(arrays, dx_gn, g, lambda x: H @ x, delta)

    arrays = initial.arrays
    error = float(error_fn(arrays))
    history = [error]
    delta = params.initial_delta
    converged = False
    it = 0
    for it in range(1, params.max_iterations + 1):
        system = system_fn(arrays)
        prev = error
        accepted = False
        for _ in range(10):
            if constrained:
                dx, new_arrays, new_error, pred = dogleg_step(
                    arrays, system, delta)
            else:
                H, g = system
                dx, new_arrays, new_error, pred = dogleg_step(
                    arrays, H, g, delta)
            new_error = float(new_error)
            pred = float(pred)
            rho = (error - new_error) / pred if pred > 0 else -1.0
            if rho > 0.75:
                delta = min(2 * delta, 1e10)
            elif rho < 0.25:
                delta = delta / 2.0
            if math.isfinite(new_error) and new_error < error:
                arrays, error = new_arrays, new_error
                accepted = True
                break
            if delta < 1e-10:
                break
        history.append(error)
        if params.verbose:
            print(f"Dogleg iter {it}: error {prev:.6g} -> {error:.6g} delta {delta:.3g}")
        if not accepted:
            break
        if check_convergence(prev, error, params):
            converged = True
            break
    return OptimizeResult(initial.replace_arrays(arrays), error, it, converged, history)
