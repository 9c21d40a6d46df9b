"""Dense active-set QP/LP solvers.

Reference: gtsam_unstable/linear — QPSolver.{h,cpp}, ActiveSetSolver*, LP.h
(active-set quadratic/linear programming on factor graphs).  This is the small
host-side equivalent: primal active-set QP over dense matrices (the reference's
QPS test problems are tiny), with LP as the degenerate QP case.
"""

import dataclasses
import numpy as np


@dataclasses.dataclass
class QPResult:
    x: np.ndarray
    active: list
    iterations: int
    converged: bool


def solve_qp(G, g, A_eq=None, b_eq=None, A_in=None, b_in=None, x0=None,
             max_iterations: int = 100, tol: float = 1e-10) -> QPResult:
    """min 0.5 x'Gx + g'x  s.t.  A_eq x = b_eq,  A_in x >= b_in.

    Primal active-set with equality-constrained KKT subproblems.
    """
    G = np.asarray(G, dtype=float)
    g = np.asarray(g, dtype=float)
    n = len(g)
    A_eq = np.zeros((0, n)) if A_eq is None else np.atleast_2d(np.asarray(A_eq, dtype=float))
    b_eq = np.zeros(0) if b_eq is None else np.atleast_1d(np.asarray(b_eq, dtype=float))
    A_in = np.zeros((0, n)) if A_in is None else np.atleast_2d(np.asarray(A_in, dtype=float))
    b_in = np.zeros(0) if b_in is None else np.atleast_1d(np.asarray(b_in, dtype=float))

    def kkt_solve(x, active):
        """Solve the equality-constrained step: direction p and multipliers.

        The constraint rows of the KKT rhs carry the residual b_w - A_w x
        (not zero), so the step also corrects any drift off the working-set
        manifold — a start that is infeasible w.r.t. the equalities gets
        pulled onto them instead of converging to an infeasible point."""
        Aw = np.vstack([A_eq] + [A_in[i:i + 1] for i in active]) \
            if (len(A_eq) or active) else np.zeros((0, n))
        bw = np.concatenate([b_eq, [b_in[i] for i in active]]) \
            if (len(A_eq) or active) else np.zeros(0)
        m = Aw.shape[0]
        K = np.block([[G, Aw.T], [Aw, np.zeros((m, m))]])
        rhs = np.concatenate([-(G @ x + g), bw - Aw @ x])
        eps = 1e-14 * max(1.0, np.abs(G).max())   # scale-aware regularization
        try:
            sol = np.linalg.solve(K + eps * np.eye(n + m), rhs)
        except np.linalg.LinAlgError:
            sol = np.linalg.lstsq(K, rhs, rcond=None)[0]
        # KKT solves G p + A' v = -(G x + g); the inequality multipliers in the
        # L = f - lam (a'x - b) convention are lam = -v
        return sol[:n], -sol[n + len(A_eq):]

    # feasible start: solve a phase-1-ish least squares if x0 not given
    if x0 is None:
        A_all = np.vstack([A_eq, A_in])
        b_all = np.concatenate([b_eq, b_in])
        if len(A_all):
            # equality manifold first (min-norm exact), then inequality pushes
            if len(A_eq):
                x = np.linalg.lstsq(A_eq, b_eq, rcond=None)[0]
            else:
                x = np.linalg.lstsq(A_all, b_all, rcond=None)[0]
            # push into the feasible side of inequalities WITHOUT leaving the
            # equality manifold (correction solved jointly with A_eq c = 0)
            for _ in range(50):
                viol = A_in @ x - b_in if len(A_in) else np.zeros(0)
                bad = viol < -tol
                if not bad.any():
                    break
                Ac = np.vstack([A_in[bad], A_eq])
                bc = np.concatenate([-viol[bad], np.zeros(len(A_eq))])
                corr = np.linalg.lstsq(Ac, bc, rcond=None)[0]
                x = x + corr
        else:
            x = np.zeros(n)
    else:
        x = np.asarray(x0, dtype=float)

    active = [int(i) for i in range(len(A_in))
              if abs(A_in[i] @ x - b_in[i]) < tol]
    for it in range(1, max_iterations + 1):
        p, lam_in = kkt_solve(x, active)
        if np.linalg.norm(p) < tol:
            # converged on this working set; check multipliers AND primal
            # feasibility (a failed phase-1 start can otherwise report a
            # KKT point of the working set that violates an inactive row)
            if len(active) == 0 or (len(lam_in) and lam_in.min() >= -tol) \
                    or not len(lam_in):
                return QPResult(x, active, it,
                                _feasible(x, A_eq, b_eq, A_in, b_in, tol))
            # drop most negative multiplier
            drop = active[int(np.argmin(lam_in))]
            active.remove(drop)
            continue
        # step length to nearest violated inactive inequality
        alpha = 1.0
        blocking = None
        for i in range(len(A_in)):
            if i in active:
                continue
            denom = A_in[i] @ p
            if denom < -tol:
                a = (b_in[i] - A_in[i] @ x) / denom
                # an already-violated constraint gives a < 0; stepping
                # backwards along p would chase it — ignore it in the ratio
                # test (it can only be repaired by the KKT correction step)
                if 0.0 <= a < alpha:
                    alpha = a
                    blocking = i
        x = x + alpha * p
        if blocking is not None:
            active.append(blocking)
    return QPResult(x, active, max_iterations, False)


def _feasible(x, A_eq, b_eq, A_in, b_in, tol):
    ok = True
    if len(A_eq):
        ok &= bool(np.abs(A_eq @ x - b_eq).max() <= max(tol, 1e-8))
    if len(A_in):
        ok &= bool((A_in @ x - b_in).min() >= -max(tol, 1e-8))
    return ok


def solve_lp(c, A_eq=None, b_eq=None, A_in=None, b_in=None,
             reg: float = 1e-8) -> QPResult:
    """min c'x  s.t. constraints — as a lightly regularized QP (LP.h analog)."""
    n = len(c)
    return solve_qp(reg * np.eye(n), np.asarray(c, dtype=float),
                    A_eq, b_eq, A_in, b_in)
