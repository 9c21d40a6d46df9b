"""QPS (MPS-with-QUADOBJ) file parser feeding the dense active-set QP solver.

Reference: gtsam_unstable/linear/QPSParser.{h,cpp} (flex/bison parser building
a QP factor graph); behavior validated against the reference's QPSolver test
expectations on the shipped HS*/QPTEST problems
(gtsam_unstable/linear/tests/testQPSolver.cpp:259-312).

Objective convention (standard QPS): f(x) = 0.5 x'Qx + c'x + f0, where
QUADOBJ lists the lower triangle of Q, COLUMNS gives c on the N row, and an
RHS entry on the objective row contributes f0 = -rhs.
"""

import dataclasses
from typing import Dict, List, Optional

import numpy as np

from . import qp as qp_mod


@dataclasses.dataclass
class QPSProblem:
    names: List[str]                  # variable names, column order
    Q: np.ndarray                     # (n, n) symmetric
    c: np.ndarray                     # (n,)
    f0: float                         # objective constant
    A_eq: np.ndarray
    b_eq: np.ndarray
    A_in: np.ndarray                  # A_in x >= b_in
    b_in: np.ndarray

    def objective(self, x) -> float:
        x = np.asarray(x, dtype=float)
        return float(0.5 * x @ self.Q @ x + self.c @ x + self.f0)


def parse_qps(path: str) -> QPSProblem:
    rows: Dict[str, str] = {}          # row name -> N|G|L|E
    obj_row: Optional[str] = None
    row_order: List[str] = []
    cols: List[str] = []
    col_idx: Dict[str, int] = {}
    entries: Dict[str, Dict[str, float]] = {}   # row -> {col: val}
    cvec: Dict[str, float] = {}
    rhs: Dict[str, float] = {}
    ranges: Dict[str, float] = {}
    quad: List[tuple] = []
    lo: Dict[str, float] = {}
    up: Dict[str, float] = {}
    fx: Dict[str, float] = {}
    free: set = set()

    section = None
    with open(path) as f:
        for raw in f:
            line = raw.rstrip("\n")
            if not line.strip() or line.lstrip().startswith("*"):
                continue
            if not line[0].isspace():
                section = line.split()[0].upper()
                continue
            tok = line.split()
            if section == "ROWS":
                kind, name = tok[0].upper(), tok[1]
                if kind == "N":
                    if obj_row is None:
                        obj_row = name
                else:
                    rows[name] = kind
                    row_order.append(name)
            elif section == "COLUMNS":
                col = tok[0]
                if col not in col_idx:
                    col_idx[col] = len(cols)
                    cols.append(col)
                for i in range(1, len(tok) - 1, 2):
                    rname, val = tok[i], float(tok[i + 1])
                    if rname == obj_row:
                        cvec[col] = cvec.get(col, 0.0) + val
                    else:
                        entries.setdefault(rname, {})[col] = val
            elif section == "RHS":
                # tok[0] is the rhs-set name
                for i in range(1, len(tok) - 1, 2):
                    rhs[tok[i]] = float(tok[i + 1])
            elif section == "RANGES":
                for i in range(1, len(tok) - 1, 2):
                    ranges[tok[i]] = float(tok[i + 1])
            elif section == "BOUNDS":
                kind = tok[0].upper()
                col = tok[2]
                val = float(tok[3]) if len(tok) > 3 else 0.0
                if kind == "UP":
                    up[col] = val
                elif kind == "LO":
                    lo[col] = val
                elif kind == "FX":
                    fx[col] = val
                elif kind == "FR":
                    free.add(col)
                elif kind == "MI":
                    lo[col] = -np.inf
                elif kind == "PL":
                    up[col] = np.inf
                elif kind == "BV":       # binary treated as [0, 1] box
                    lo[col], up[col] = 0.0, 1.0
            elif section in ("QUADOBJ", "QMATRIX"):
                for i in range(1, len(tok) - 1, 2):
                    quad.append((section, tok[0], tok[i], float(tok[i + 1])))

    n = len(cols)
    Q = np.zeros((n, n))
    for sec, c1, c2, v in quad:
        i, j = col_idx[c1], col_idx[c2]
        if sec == "QMATRIX":
            # QMATRIX lists BOTH triangles explicitly — assign one-sided,
            # no mirroring (mirroring would double every cross term)
            Q[i, j] += v
        else:
            # QUADOBJ lists the lower triangle only; mirror off-diagonals
            Q[i, j] += v
            if i != j:
                Q[j, i] += v
    c = np.zeros(n)
    for name, v in cvec.items():
        c[col_idx[name]] = v
    f0 = -rhs.get(obj_row, 0.0)

    A_eq, b_eq, A_in, b_in = [], [], [], []
    for rname in row_order:
        a = np.zeros(n)
        for cname, v in entries.get(rname, {}).items():
            a[col_idx[cname]] = v
        b = rhs.get(rname, 0.0)
        kind = rows[rname]
        if kind == "E":
            if rname in ranges:
                # MPS range r on an E row: b <= ax <= b+r (r>0) or
                # b+r <= ax <= b (r<0) — a two-sided inequality, not an
                # equality
                r = ranges[rname]
                los, his = (b, b + r) if r >= 0 else (b + r, b)
                A_in.append(a)
                b_in.append(los)
                A_in.append(-a)
                b_in.append(-his)
            else:
                A_eq.append(a)
                b_eq.append(b)
        elif kind == "G":
            A_in.append(a)
            b_in.append(b)
            if rname in ranges:         # G with range r: b <= ax <= b + |r|
                A_in.append(-a)
                b_in.append(-(b + abs(ranges[rname])))
        elif kind == "L":
            A_in.append(-a)
            b_in.append(-b)
            if rname in ranges:         # L with range r: b - |r| <= ax <= b
                A_in.append(a)
                b_in.append(b - abs(ranges[rname]))

    # bounds: default LO = 0 unless FR/MI/FX given (MPS convention)
    for j, name in enumerate(cols):
        if name in fx:
            a = np.zeros(n)
            a[j] = 1.0
            A_eq.append(a)
            b_eq.append(fx[name])
            continue
        lo_v = lo.get(name, None)
        if name not in free and lo_v is None:
            lo_v = 0.0
        if lo_v is not None and np.isfinite(lo_v):
            a = np.zeros(n)
            a[j] = 1.0
            A_in.append(a)
            b_in.append(lo_v)
        up_v = up.get(name, None)
        if up_v is not None and np.isfinite(up_v):
            a = np.zeros(n)
            a[j] = -1.0
            A_in.append(a)
            b_in.append(-up_v)

    return QPSProblem(
        cols, Q, c, f0,
        np.asarray(A_eq).reshape(-1, n), np.asarray(b_eq, dtype=float),
        np.asarray(A_in).reshape(-1, n), np.asarray(b_in, dtype=float))


def solve_qps(path: str, **kw):
    """Parse + solve; returns (QPSProblem, QPResult, objective value)."""
    prob = parse_qps(path)
    res = qp_mod.solve_qp(prob.Q, prob.c,
                          A_eq=prob.A_eq if len(prob.A_eq) else None,
                          b_eq=prob.b_eq if len(prob.b_eq) else None,
                          A_in=prob.A_in if len(prob.A_in) else None,
                          b_in=prob.b_in if len(prob.b_in) else None, **kw)
    return prob, res, prob.objective(res.x)
