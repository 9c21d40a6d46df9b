"""ISAM2Tree: true incremental smoothing on a resident supernodal Bayes tree.

The reference ISAM2 (gtsam/nonlinear/ISAM2.cpp:116-249 recalculate/
recalculateIncremental, inference/BayesTree.h:223-229 removePath/removeTop,
ISAM2Clique.h:90,172 wildfire back-substitution, ISAM2.h:192-199
marginalizeLeaves) keeps the factored system resident and, per update, edits
only the affected top of the tree.  This engine is the TPU-native rebuild:

  host (symbolic, incremental):
    - persistent supernode forest over stable variable ids; elimination
      positions from a monotone counter (re-eliminated vars get fresh, larger
      positions, so unaffected columns stay valid — the removeTop invariant)
    - per update: affected = vars of new factors + vars of factors touching
      relinearized vars, closed under assembly-tree ancestors; the affected
      supernodes are re-analyzed locally (analyze_supernodal on the affected
      subgraph + orphan-separator cliques) and spliced back over the orphans

  device (numeric, multifrontal extend-add):
    - per-supernode CACHED Schur complements U and forward-substituted rhs u
      (the ISAM2Clique cachedFactor analog): re-eliminating the top gathers
      the orphans' cached U instead of revisiting their subtrees
    - refactorization of the affected top runs level-batched with runtime
      index arrays, so ONE compiled program serves every update with the same
      capacity signature (capacities grow pow2 -> recompiles are O(log n))
    - forward solve state (y) is incremental: only affected columns recompute;
      backward substitution is level-batched over the whole tree (a handful of
      fused batched ops — the TPU answer to wildfire's serial traversal)

Exact-equivalence oracle: delta == the batch Gauss-Newton step of the same
factors at the same linearization points (tests/test_isam2_tree.py).
"""

import dataclasses
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
from ..config import default_dtype as _default_dtype
import numpy as np

from ..graph import factors as factors_mod
from ..graph import manifolds
from ..graph.values import Values
from ..inference import ordering as ordering_mod
from ..inference import supernodes as sn_mod


def _stack_plans(plans):
    """Stack per-level HOST plan dicts and ship each field in ONE transfer
    (per-level jnp arrays cost ~17 arrays x nlev tunnel round-trips per
    update — measured as a flat ~2.6 s p50 floor at late-stage caps)."""
    return {k: jnp.asarray(np.stack([np.asarray(p[k]) for p in plans]))
            for k in plans[0]}


def _pow2(n, lo=4):
    c = lo
    while c < n:
        c *= 2
    return c


def _round_up(n, q):
    return ((n + q - 1) // q) * q if n else q


_W_BUCKETS = (4, 8, 16, 24, 32, 48, 64, 96, 128)
_R_BUCKETS = (0, 8, 16, 32, 64, 96, 128, 192, 256)


def _bucket(n, buckets):
    for b in buckets:
        if n <= b:
            return b
    return _pow2(n, buckets[-1])


# ---------------------------------------------------------------------------
# host bookkeeping


@dataclasses.dataclass
class _SNode:
    sid: int
    cols: List[int]                 # var ids, elimination order
    rows: List[int]                 # separator var ids, ascending position
    parent: int                     # sid or -1
    children: set
    level: int                      # height from leaves
    u_slots: Optional[np.ndarray]   # (r*(r+1)/2,) Ubuf slots, (a>=b) pair order
    urhs_slots: Optional[np.ndarray]  # (r,) Urhs slots
    frozen: bool = False
    # lazy caches of the snode's block-slot grids (structure is immutable
    # after creation, so these are computed once; plan building slices them)
    blk_diag: Optional[np.ndarray] = None   # (w, w) lower filled
    blk_panel: Optional[np.ndarray] = None  # (r, w)


@dataclasses.dataclass
class _FactorStore:
    batch: factors_mod.FactorBatch  # template (residual_fn, var_types, rdim)
    cap: int
    n: int
    keys: np.ndarray                # (cap, arity) var ids
    meas: object
    R: jnp.ndarray                  # (cap, rdim, rdim) whitening (0 = inactive)


class _SlotPool:
    """Grow-only slot allocator with free list (block / U-buffer slots)."""

    def __init__(self):
        self.top = 0
        self.free: List[int] = []

    def alloc(self, k: int) -> np.ndarray:
        out = []
        while self.free and len(out) < k:
            out.append(self.free.pop())
        need = k - len(out)
        if need:
            out.extend(range(self.top, self.top + need))
            self.top += need
        return np.asarray(out, dtype=np.int32)

    def release(self, slots):
        self.free.extend(int(s) for s in np.asarray(slots).reshape(-1))


# ---------------------------------------------------------------------------


class ISAM2Tree:
    """Incremental smoother with a resident supernodal factorization.

    Usage:
        isam = ISAM2Tree()
        isam.update(new_batches, new_entries)   # returns delta (n, d) rows
        est = isam.calculate_estimate()
    """

    def __init__(self, relinearize_threshold: float = 0.1,
                 relinearize_skip: int = 1,
                 relax_tau: float = 0.3, force_width: int = 8,
                 max_width: int = 48, wildfire_threshold: float = 0.001,
                 optimization: str = "gn", initial_delta: float = 1.0):
        self.relin_threshold = relinearize_threshold
        self.relin_skip = relinearize_skip
        # optimization = "gn" (wildfire Gauss-Newton delta, the reference's
        # ISAM2Params::OptimizationParams GaussNewton default) or "dogleg"
        # (trust-region updateDelta, reference ISAM2.cpp:724-779 +
        # DoglegOptimizerImpl.h:138 Iterate): the published delta is the
        # dogleg blend of the Newton step with the Cauchy (steepest-descent)
        # step, and the trust radius persists across updates like the
        # reference's doglegDelta_.  Dogleg disables wildfire partial
        # back-substitution (the reference keeps separate deltaNewton_ /
        # RgProd_ vectors for that; here the Newton step is always solved
        # in full) and is not supported together with marginalize_leaves.
        if optimization not in ("gn", "dogleg"):
            raise ValueError(f"optimization must be gn|dogleg, "
                             f"got {optimization!r}")
        self.optimization = optimization
        self.delta_trust = float(initial_delta)
        # wildfire-style selective back-substitution (reference
        # ISAM2Clique::optimizeWildfire, ISAM2Clique.h:90,172 — default
        # threshold 0.001 matches ISAM2Params): after refactoring, solve the
        # affected TOP only; if the delta change at the orphan interface is
        # below threshold, the untouched subtrees keep their old delta and
        # the whole-tree backward pass is skipped.  0.0 = always exact.
        self.wildfire_threshold = wildfire_threshold
        self._last_orphans: List[int] = []
        self._sn_params = dict(relax_tau=relax_tau, force_width=force_width,
                               max_width=max_width)
        # variables
        self.nvar = 0
        self.var_type: List[str] = []
        self.var_row: List[int] = []
        self.var_key: List[int] = []
        self.key_to_vid: Dict[int, int] = {}
        self.types: List[str] = []
        self.var_arrays: Dict[str, object] = {}
        self.type_cap: Dict[str, int] = {}
        self.type_rows: Dict[str, List[int]] = {}   # row -> vid
        self.d = 0
        # factors
        self.stores: List[_FactorStore] = []
        self._store_of: Dict[tuple, int] = {}
        self.adj: List[set] = []
        self._vid_factors: List[set] = []   # vid -> set of (store, row)
        # elimination state
        self.pos = np.zeros(0, dtype=np.int64)   # vid -> elimination position
        self._pos_counter = 0
        self.snodes: Dict[int, _SNode] = {}
        self.snode_of: List[int] = []            # vid -> sid
        self._next_sid = 0
        self.levels: List[set] = []              # level -> set of sids
        # device buffers + slot pools
        self.block_slot: Dict[Tuple[int, int], int] = {}  # (vid_hi_pos? no:
        #   key = (a, b) with pos[a] > pos[b] normalized at lookup time
        self.block_pool = _SlotPool()
        self.u_pool = _SlotPool()
        self.urhs_pool = _SlotPool()
        self.B_cap = 64
        self.n_cap = 8
        self.U_cap = 64
        self.UR_cap = 64
        self.Lb = None       # (B_cap+1, d, d)
        self.Ubuf = None     # (U_cap+1, d, d)
        self.Urhs = None     # (UR_cap+1, d)
        self.y = None        # (n_cap+1, d)
        self.delta_host = np.zeros((0, 0))
        self.update_count = 0
        self._jit_cache: Dict[tuple, callable] = {}
        self._marked_relin: set = set()
        self._asm_dirty: Dict[int, set] = {}   # store idx -> dirty factor rows
        self.Hres = None    # resident assembled H blocks (B_cap+1, d, d)
        self.gres = None    # resident gradient (n_cap+1, d)
        # monotone capacity state: every padded capacity that enters a compile
        # signature only ever grows, so the sequence of shape classes is a
        # short monotone chain (O(#caps x log) recompiles per tree lifetime)
        # instead of a fresh class per update (the round-2 compile storm on
        # irregular graphs, cf. reference ISAM2.cpp:116-249 which has no
        # compile step at all)
        self._mono: Dict[str, int] = {}

    def _np_full(self, shape, fill, dtype="int32"):
        """Cached constant HOST array for plan padding (stacked + shipped
        once per field per update)."""
        key = ("np", shape, float(fill), dtype)
        cache = getattr(self, "_const_cache", None)
        if cache is None:
            cache = self._const_cache = {}
        out = cache.get(key)
        if out is None:
            out = np.full(shape, fill, dtype=dtype)
            out.setflags(write=False)
            cache[key] = out
        return out

    def _const_full(self, shape, fill, dtype="int32"):
        """Cached constant device array (plan padding is rebuilt every
        update; eager jnp.full dispatch was ~40% of per-update host time)."""
        key = (shape, int(fill) if dtype != "float64" else float(fill), dtype)
        cache = getattr(self, "_const_cache", None)
        if cache is None:
            cache = self._const_cache = {}
        out = cache.get(key)
        if out is None:
            out = cache[key] = jnp.asarray(
                np.full(shape, fill,
                        dtype=np.float64 if dtype == "float64"
                        else np.int32 if dtype == "int32" else np.bool_))
        return out

    def _mono_cap(self, name: str, need: int) -> int:
        cur = self._mono.get(name, 0)
        if need > cur:
            self._mono[name] = need
            return need
        return cur

    # -- variable / factor ingestion ----------------------------------------

    def _ensure_dtype_buffers(self):
        dt = _default_dtype()
        if self.Lb is None or self.Lb.shape[0] != self.B_cap + 1 \
                or self.Lb.shape[1] != self.d:
            old = self.Lb
            self.Lb = jnp.zeros((self.B_cap + 1, self.d, self.d), dtype=dt)
            if old is not None and old.shape[1] == self.d:
                self.Lb = self.Lb.at[:old.shape[0] - 1].set(old[:-1])
        if self.Ubuf is None or self.Ubuf.shape[0] != self.U_cap + 1 \
                or self.Ubuf.shape[1] != self.d:
            old = self.Ubuf
            self.Ubuf = jnp.zeros((self.U_cap + 1, self.d, self.d), dtype=dt)
            if old is not None and old.shape[1] == self.d:
                self.Ubuf = self.Ubuf.at[:old.shape[0] - 1].set(old[:-1])
        if self.Urhs is None or self.Urhs.shape[0] != self.UR_cap + 1 \
                or self.Urhs.shape[1] != self.d:
            old = self.Urhs
            self.Urhs = jnp.zeros((self.UR_cap + 1, self.d), dtype=dt)
            if old is not None and old.shape[1] == self.d:
                self.Urhs = self.Urhs.at[:old.shape[0] - 1].set(old[:-1])
        if self.y is None or self.y.shape[0] != self.n_cap + 1 \
                or self.y.shape[1] != self.d:
            old = self.y
            self.y = jnp.zeros((self.n_cap + 1, self.d), dtype=dt)
            if old is not None and old.shape[1] == self.d:
                self.y = self.y.at[:old.shape[0] - 1].set(old[:-1])

    def _add_value(self, key, tname, val):
        key = int(key)
        if key in self.key_to_vid:
            return None
        dim = manifolds.get(tname).dim
        if dim > self.d:
            self.d = dim            # buffers resized in _ensure_dtype_buffers
        if tname not in self.type_cap:
            self.types = sorted(set(self.types) | {tname})
            self.type_cap[tname] = 8
            self.type_rows[tname] = []
            self.var_arrays[tname] = jax.tree.map(
                lambda a: jnp.broadcast_to(
                    jnp.asarray(a)[None], (8,) + jnp.asarray(a).shape).copy(),
                val)
        row = len(self.type_rows[tname])
        if row >= self.type_cap[tname]:
            cap = self.type_cap[tname]
            self.var_arrays[tname] = jax.tree.map(
                lambda a: jnp.concatenate([a, a[:cap]]), self.var_arrays[tname])
            self.type_cap[tname] = cap * 2
        self.var_arrays[tname] = jax.tree.map(
            lambda a, v: a.at[row].set(jnp.asarray(v)),
            self.var_arrays[tname], val)
        vid = self.nvar
        self.nvar += 1
        self.var_type.append(tname)
        self.var_row.append(row)
        self.var_key.append(key)
        self.key_to_vid[key] = vid
        self.type_rows[tname].append(vid)
        self.adj.append(set())
        self._vid_factors.append(set())
        self.snode_of.append(-1)
        self.pos = np.append(self.pos, -1)
        if self.nvar > self.n_cap:
            self.n_cap = _pow2(self.nvar, 8)
        return vid

    def _add_factors(self, batch: factors_mod.FactorBatch):
        sig = (batch.residual_fn, batch.var_types, batch.rdim)
        nz = batch.noise
        r, n = batch.rdim, batch.num_factors
        if nz.kind == "unit":
            R_new = jnp.broadcast_to(jnp.eye(r), (n, r, r))
        elif nz.kind in ("diagonal", "constrained"):
            dd = jnp.broadcast_to(nz.data, (n, r))
            R_new = jax.vmap(jnp.diag)(dd)
        else:
            R_new = jnp.broadcast_to(nz.data, (n, r, r))
        vkeys = np.asarray(
            [[self.key_to_vid[int(k)] for k in row] for row in batch.keys],
            dtype=np.int64)
        if sig not in self._store_of:
            cap = _pow2(n, 8)
            pad = cap - n
            keys = np.concatenate([vkeys, np.tile(vkeys[:1], (pad, 1))])
            meas = jax.tree.map(
                lambda a: jnp.concatenate(
                    [jnp.asarray(a),
                     jnp.broadcast_to(jnp.asarray(a)[:1],
                                      (pad,) + jnp.asarray(a).shape[1:])]),
                batch.measurements)
            R = jnp.concatenate([R_new, jnp.zeros((pad,) + R_new.shape[1:])])
            self._store_of[sig] = len(self.stores)
            self.stores.append(_FactorStore(batch, cap, n, keys, meas, R))
            si = len(self.stores) - 1
            rows = range(n)
        else:
            si = self._store_of[sig]
            st = self.stores[si]
            need = st.n + n
            if need > st.cap:
                new_cap = _pow2(need, 8)
                grow = new_cap - st.cap
                st.keys = np.concatenate(
                    [st.keys, np.tile(st.keys[:1], (grow, 1))])
                st.meas = jax.tree.map(
                    lambda a: jnp.concatenate(
                        [a, jnp.broadcast_to(a[:1], (grow,) + a.shape[1:])]),
                    st.meas)
                st.R = jnp.concatenate(
                    [st.R, jnp.zeros((grow,) + st.R.shape[1:])])
                st.cap = new_cap
            rows = range(st.n, st.n + n)
            st.keys[st.n:st.n + n] = vkeys
            idx = jnp.arange(st.n, st.n + n)
            st.meas = jax.tree.map(
                lambda a, b: a.at[idx].set(jnp.asarray(b)),
                st.meas, batch.measurements)
            st.R = st.R.at[idx].set(R_new)
            st.n += n
        touched = set()
        for fr, row in enumerate(rows):
            self._asm_dirty.setdefault(si, set()).add(row)
            vs = [int(v) for v in vkeys[fr]]
            for a in vs:
                self._vid_factors[a].add((si, row))
                touched.add(a)
                for b in vs:
                    if a != b:
                        self.adj[a].add(b)
        return touched

    # -- block slots ---------------------------------------------------------

    def _blk(self, a: int, b: int) -> int:
        """Slot of the block for var pair {a, b} (allocating if new).
        Key normalized to unordered (min_vid, max_vid)."""
        k = (a, b) if a <= b else (b, a)
        s = self.block_slot.get(k)
        if s is None:
            s = int(self.block_pool.alloc(1)[0])
            self.block_slot[k] = s
            if self.block_pool.top > self.B_cap:
                self.B_cap = _pow2(self.block_pool.top, 64)
        return s

    def _blk_get(self, a: int, b: int) -> int:
        k = (a, b) if a <= b else (b, a)
        return self.block_slot[k]

    # -- update --------------------------------------------------------------

    def update(self, new_batches=(), new_entries=(), force_full: bool = False,
               no_relin_keys=(), extra_reelim_keys=(),
               force_relinearize: bool = False):
        """One incremental update.

        ISAM2UpdateParams analog knobs (gtsam/nonlinear/ISAM2UpdateParams.h):
        - no_relin_keys: keys whose linearization point must NOT move this
          update even if their delta exceeds the threshold (noRelinKeys)
        - extra_reelim_keys: keys to force into the re-eliminated top even
          when untouched (extraReelimKeys)
        - force_relinearize: run the relin check this update regardless of
          relinearize_skip (ISAM2UpdateParams::force_relinearize)
        """
        new_vids = []
        for (k, t, v) in new_entries:
            vid = self._add_value(k, t, v)
            if vid is not None:
                new_vids.append(vid)
        touched = set(new_vids)
        for b in new_batches:
            touched |= self._add_factors(b)
        for k in extra_reelim_keys:
            vid = self.key_to_vid.get(int(k))
            if vid is not None:
                touched.add(int(vid))
        self.update_count += 1

        # relinearization: every relin_skip updates, move theta for big deltas
        no_relin_vids = {self.key_to_vid[int(k)] for k in no_relin_keys
                         if int(k) in self.key_to_vid}
        relin_vids = set()
        if (self.update_count > 1 and
                (force_relinearize or
                 self.update_count % self.relin_skip == 0) and
                len(self.delta_host)):
            mags = np.max(np.abs(self.delta_host), axis=1)
            relin_vids = {int(v) for v in np.where(
                mags > self.relin_threshold)[0]
                if self.snode_of[v] >= 0 and not self._frozen_vid(v)
                and int(v) not in no_relin_vids}
            if relin_vids:
                self._apply_relin(relin_vids)
                for v in relin_vids:
                    for (si, row) in self._vid_factors[v]:
                        for w in self.stores[si].keys[row]:
                            touched.add(int(w))

        affected_sids = self._affected_closure(touched, force_full)
        if not affected_sids and not new_vids:
            # nothing changed structurally or numerically
            return self.delta_host[:self.nvar]
        self._check_frozen(affected_sids, touched)
        plan = self._replan(affected_sids, touched, new_vids)
        self._ensure_dtype_buffers()
        self._execute(plan)
        if self.optimization == "dogleg":
            self._update_delta_dogleg()
        return self.delta_host[:self.nvar]

    def _frozen_vid(self, v):
        sid = self.snode_of[v]
        return sid >= 0 and self.snodes[sid].frozen

    def _apply_relin(self, relin_vids):
        """theta <- retract(theta, delta) for relin vars; zero their delta."""
        by_type: Dict[str, list] = {}
        for v in relin_vids:
            by_type.setdefault(self.var_type[v], []).append(v)
        for t, vids in by_type.items():
            man = manifolds.get(t)
            rows = np.asarray([self.var_row[v] for v in vids])
            dvec = jnp.asarray(self.delta_host[vids][:, :man.dim])
            cur = jax.tree.map(lambda a: a[rows], self.var_arrays[t])
            new = jax.vmap(man.retract)(cur, dvec)
            self.var_arrays[t] = jax.tree.map(
                lambda a, nv: a.at[rows].set(nv), self.var_arrays[t], new)
            self.delta_host[vids] = 0.0

    def _affected_closure(self, touched, force_full):
        if force_full or not self.snodes:
            return set(self.snodes.keys())
        aff = set()
        stack = [self.snode_of[v] for v in touched if self.snode_of[v] >= 0]
        while stack:
            sid = stack.pop()
            if sid in aff or sid < 0:
                continue
            aff.add(sid)
            p = self.snodes[sid].parent
            if p >= 0 and p not in aff:
                stack.append(p)
        return aff

    def _check_frozen(self, affected_sids, touched):
        for sid in affected_sids:
            if self.snodes[sid].frozen:
                raise ValueError(
                    "update touches marginalized (frozen) variables "
                    f"(supernode {sid}); marginalized variables cannot "
                    "receive new factors or relinearize")

    # -- symbolic re-elimination of the affected top --------------------------

    def _replan(self, affected_sids, touched, new_vids):
        # removed vars = cols of affected snodes + brand-new vars
        r_vars = list(new_vids)
        for sid in affected_sids:
            r_vars.extend(self.snodes[sid].cols)
        r_vars = sorted(set(r_vars))
        m = len(r_vars)
        local = {v: i for i, v in enumerate(r_vars)}

        # orphans: children of removed snodes that are not removed
        orphans = []
        for sid in affected_sids:
            for c in self.snodes[sid].children:
                if c not in affected_sids:
                    orphans.append(c)
        self._last_orphans = list(orphans)

        # local adjacency: factor edges within + orphan separator cliques
        import scipy.sparse as sp
        ri, ci = [], []
        for v in r_vars:
            for w in self.adj[v]:
                if w in local:
                    ri.append(local[v])
                    ci.append(local[w])
        for o in orphans:
            rows = self.snodes[o].rows
            for a in range(len(rows)):
                for b in range(len(rows)):
                    if a != b:
                        ri.append(local[rows[a]])
                        ci.append(local[rows[b]])
        adj_l = sp.csr_matrix(
            (np.ones(len(ri), dtype=np.int8), (ri, ci)), shape=(m, m))

        # constrain the vars touched THIS update (new vars + new-factor vars)
        # to eliminate LAST, so they land at the top of the rebuilt subtree
        # and the next update's affected closure stays small — the reference's
        # constrained-COLAMD newKeys trick (ISAM2.cpp recalculate,
        # Ordering::ColamdConstrainedLast).  Without this, AMD eliminates the
        # newest (degree-1) vars first, the freshest vars sink to the BOTTOM
        # of the top, and every subsequent update refactors the whole tree.
        recent = set(new_vids) | {v for v in touched if v in local}
        cmask = np.zeros(m, dtype=bool)
        for v in recent:
            if v in local:
                cmask[local[v]] = True
        perm = ordering_mod.minimum_degree(adj_l, constrained_last=cmask)
        sym = sn_mod.analyze_supernodal(adj_l, perm, **self._sn_params)

        # assign fresh global positions in the local elimination order
        for j in range(m):
            self.pos[r_vars[int(sym.perm[j])]] = self._pos_counter
            self._pos_counter += 1
        # fresh positions invalidate cached assembly targets/flips of every
        # factor touching a re-eliminated variable
        for v in r_vars:
            for (si, row) in self._vid_factors[v]:
                self._asm_dirty.setdefault(si, set()).add(row)

        # tear down removed snodes
        old_pairs = set()
        for sid in affected_sids:
            s = self.snodes[sid]
            for pr in self._snode_pairs(s):
                old_pairs.add(pr)
            if s.u_slots is not None:
                self.u_pool.release(s.u_slots)
            if s.urhs_slots is not None:
                self.urhs_pool.release(s.urhs_slots)
            self.levels[s.level].discard(sid)
            self.snodes.pop(sid)

        # build new snodes from the local analysis
        new_sids = []
        loc2vid = [r_vars[int(sym.perm[j])] for j in range(m)]
        for ls in range(sym.nsuper):
            c0, w = int(sym.snode_start[ls]), int(sym.snode_width[ls])
            cols = [loc2vid[c0 + a] for a in range(w)]
            rows = [loc2vid[int(r)] for r in sym.snode_rows[ls]]
            sid = self._next_sid
            self._next_sid += 1
            r = len(rows)
            u_slots = self.u_pool.alloc(r * (r + 1) // 2) if r else None
            urhs_slots = self.urhs_pool.alloc(r) if r else None
            sn = _SNode(sid, cols, rows, -1, set(), 0, u_slots, urhs_slots)
            self.snodes[sid] = sn
            new_sids.append(sid)
            for v in cols:
                self.snode_of[v] = sid
        if self.u_pool.top > self.U_cap:
            self.U_cap = _pow2(self.u_pool.top, 64)
        if self.urhs_pool.top > self.UR_cap:
            self.UR_cap = _pow2(self.urhs_pool.top, 64)

        # parents: local tree structure + orphan reattachment
        for ls, sid in enumerate(new_sids):
            lp = int(sym.snode_parent[ls])
            if lp >= 0:
                self.snodes[sid].parent = new_sids[lp]
                self.snodes[new_sids[lp]].children.add(sid)
        for o in orphans:
            rows = self.snodes[o].rows
            first = min(rows, key=lambda v: self.pos[v])
            p = self.snode_of[first]
            self.snodes[o].parent = p
            self.snodes[p].children.add(o)

        # levels (heights): orphan heights are unchanged; new snodes bottom-up
        for ls, sid in enumerate(new_sids):
            s = self.snodes[sid]
            h = 0
            for c in s.children:
                h = max(h, self.snodes[c].level + 1)
            s.level = h
        while len(self.levels) < 1 + max(
                (self.snodes[s].level for s in new_sids), default=0):
            self.levels.append(set())
        for sid in new_sids:
            self.levels[self.snodes[sid].level].add(sid)

        # block slots: allocate new fill, free stale
        new_pairs = set()
        for sid in new_sids:
            for pr in self._snode_pairs(self.snodes[sid]):
                new_pairs.add(pr)
        for pr in old_pairs - new_pairs:
            self.block_pool.release([self.block_slot.pop(pr)])
        for pr in new_pairs - old_pairs:
            a, b = pr
            self._blk(a, b)
        return new_sids

    def _snode_pairs(self, s: _SNode):
        cols, rows = s.cols, s.rows
        for i in range(len(cols)):
            for j in range(i, len(cols)):
                a, b = cols[i], cols[j]
                yield (a, b) if a <= b else (b, a)
        for r in rows:
            for c in cols:
                yield (r, c) if r <= c else (c, r)

    # -- numeric execution ---------------------------------------------------

    def _execute(self, new_sids):
        import os as _os
        import time as _time
        _dbg = _os.environ.get("GTSAM_TPU_ISAM_DEBUG")
        _t0 = _time.time()
        H, g = self._assemble_incremental()
        if _dbg:
            jax.block_until_ready(H)
            print(f"  [isam asm {_time.time()-_t0:.3f}s]", flush=True)
            _t0 = _time.time()
        plans, sig = self._refactor_plans(new_sids)
        refactor = self._refactor_program(sig)
        plans = jax.tree.map(lambda *xs: jnp.stack(xs), *plans)
        if _dbg:
            jax.block_until_ready(plans)
            print(f"  [isam rplan {_time.time()-_t0:.3f}s]", flush=True)
            _t0 = _time.time()
        (self.Lb, self.Ubuf, self.Urhs, self.y) = refactor(
            H, g, self.Lb, self.Ubuf, self.Urhs, self.y, plans)
        if _dbg:
            jax.block_until_ready(self.y)
            print(f"  [isam refactor {_time.time()-_t0:.3f}s]", flush=True)
            _t0 = _time.time()
        if self._try_wildfire(new_sids):
            if _dbg:
                print(f"  [isam wildfire {_time.time()-_t0:.3f}s]",
                      flush=True)
            return
        bplans, bsig = self._backward_plans()
        backward = self._backward_program(bsig)
        bplans = _stack_plans(bplans)
        if _dbg:
            jax.block_until_ready(bplans)
            print(f"  [isam bplan {_time.time()-_t0:.3f}s]", flush=True)
            _t0 = _time.time()
        x = backward(self.Lb, self.y, bplans)
        self.delta_host = np.array(x[:-1])
        if _dbg:
            print(f"  [isam backward {_time.time()-_t0:.3f}s]", flush=True)

    def _try_wildfire(self, new_sids) -> bool:
        """Top-only backward + interface threshold test (wildfire analog).

        The affected set is ancestor-closed, so the refactored top's
        separators lie inside the top itself: a level-batched backward over
        only the new supernodes is exact for the top's columns.  If the
        resulting delta change at every orphan-interface variable is within
        wildfire_threshold, the orphan subtrees keep their previous delta
        (reference ISAM2Clique::optimizeWildfire stopping rule) and the
        whole-tree pass is skipped."""
        wf = self.wildfire_threshold
        if wf is None or wf <= 0.0 or not len(self.delta_host):
            return False
        if self.optimization != "gn":
            # dogleg needs the FULL Newton step each update (the published
            # delta_host holds the blended dogleg step, so the wildfire
            # interface comparison against it would be meaningless)
            return False
        if len(self.delta_host) < self.nvar:
            return False     # new variables appeared: grow delta via full pass
        top_set = set(new_sids)
        live_top = [s for s in new_sids if s in self.snodes]
        if not live_top or not self._last_orphans:
            return False
        # only worth attempting when the top is a small fraction of the tree:
        # otherwise the (capacity-padded) top solve costs as much as the full
        # backward pass, and a threshold miss would pay BOTH
        if len(live_top) * 4 > max(len(self.snodes), 4):
            return False
        plans, sig = self._top_backward_plans(live_top)
        plans = _stack_plans(plans)
        backward = self._backward_program(sig)
        x = np.array(backward(self.Lb, self.y, plans)[:-1])
        top_cols = [v for s in live_top for v in self.snodes[s].cols]
        iface = sorted({int(v) for o in self._last_orphans
                        if o in self.snodes
                        for v in self.snodes[o].rows})
        if iface and np.max(np.abs(x[iface] - self.delta_host[iface])) > wf:
            return False
        self.delta_host[top_cols] = x[top_cols]
        self._wf_hits = getattr(self, "_wf_hits", 0) + 1
        return True

    def _top_backward_plans(self, live_top):
        """Backward-substitution plans restricted to the refactored top,
        ordered parents-first (reverse local height)."""
        d = self.d
        top_set = set(live_top)
        by_h: Dict[int, list] = {}
        for sid in live_top:
            by_h.setdefault(self._local_height(sid, top_set), []).append(sid)
        S_u = self._mono_cap(
            "tb_S", _pow2(max(len(v) for v in by_h.values()), 1))
        W_u = self._mono_cap(
            "tb_W", _bucket(max(len(self.snodes[s].cols) for s in live_top),
                            _W_BUCKETS))
        R_u = self._mono_cap(
            "tb_R",
            _bucket(max((len(self.snodes[s].rows) for s in live_top),
                        default=0), _R_BUCKETS)
            if any(self.snodes[s].rows for s in live_top) else 0)
        nlev_cap = self._mono_cap("tb_nlev", _pow2(max(len(by_h), 1), 1))
        plans = []
        for h in sorted(by_h, reverse=True):   # roots of the top first
            sids = by_h[h]
            S, W, R = S_u, W_u, R_u
            diag_ids = np.full((S, W, W), self.B_cap, dtype=np.int32)
            panel_ids = np.full((S, R, W), self.B_cap, dtype=np.int32)
            col_vars = np.full((S, W), self.n_cap, dtype=np.int32)
            row_vars = np.full((S, R), self.n_cap, dtype=np.int32)
            for si, sid in enumerate(sids):
                s = self.snodes[sid]
                bd, bp = self._snode_blocks(s)
                w, r = len(s.cols), len(s.rows)
                col_vars[si, :w] = s.cols
                row_vars[si, :r] = s.rows
                ii, jj = np.tril_indices(w)
                diag_ids[si, ii, jj] = bd[ii, jj]
                panel_ids[si, :r, :w] = bp
            plans.append(dict(
                diag_ids=diag_ids,
                panel_ids=panel_ids,
                col_vars=col_vars,
                row_vars=row_vars,
            ))
        while len(plans) < nlev_cap:
            plans.append(dict(
                diag_ids=self._np_full((S_u, W_u, W_u), self.B_cap),
                panel_ids=self._np_full((S_u, R_u, W_u), self.B_cap),
                col_vars=self._np_full((S_u, W_u), self.n_cap),
                row_vars=self._np_full((S_u, R_u), self.n_cap),
            ))
        return plans, (nlev_cap, S_u, W_u, R_u)

    # .. incremental assembly: resident H/g, zone rebuild ....................

    def _assemble_incremental(self):
        """O(affected) assembly: keep H blocks and the gradient RESIDENT on
        device; per update, re-linearize only the ZONE (all factors touching
        a variable of any dirty factor), zero exactly the H slots / g rows the
        zone owns, and scatter-add the fresh contributions.

        Consistency: every contributor to a zone pair-slot is itself a zone
        factor (a pair touching var v with v re-eliminated has all of v's
        factors in the zone), and zone contributions to g are masked to the
        zone's variable set, so nothing outside the zone is double-counted.
        The reference relinearizes exactly the affected cliques' factors
        (ISAM2.cpp relinearizeAffectedFactors); this is its batched-scatter
        form."""
        d = self.d
        dt = _default_dtype()
        dirty = self._asm_dirty
        total = sum(st.n for st in self.stores)
        nd = sum(len(r) for r in dirty.values())
        shape_ok = (
            self.Hres is not None
            and self.Hres.shape == (self.B_cap + 1, d, d)
            and self.gres is not None
            and self.gres.shape == (self.n_cap + 1, d))
        if not shape_ok or nd * 3 > max(total, 1):
            H, g = self._assemble()    # full rebuild (consumes _asm_dirty)
            self.Hres, self.gres = H, g
            return H, g
        self._asm_dirty = {}
        for si, rows in dirty.items():
            st = self.stores[si]
            if getattr(st, "_asm", None) is not None \
                    and st._asm["cap"] == st.cap:
                self._asm_rows_for(st, sorted(r for r in rows
                                              if r < st.cap))
        # zone = factors of the dirty rows' variables
        vset = set()
        for si, rows in dirty.items():
            st = self.stores[si]
            for row in rows:
                if row < st.n:
                    vset.update(int(v) for v in st.keys[row])
        zone: Dict[int, set] = {}
        for v in vset:
            for (si, row) in self._vid_factors[v]:
                zone.setdefault(si, set()).add(row)

        zero_slots = set()
        store_args = []
        sig_stores = []
        for si, st in enumerate(self.stores):
            if getattr(st, "_asm", None) is None or st._asm["cap"] != st.cap:
                arity = st.keys.shape[1]
                st._asm = {
                    "cap": st.cap,
                    "tg": {(s1, s2): np.zeros(st.cap, dtype=np.int64)
                           for s1 in range(arity)
                           for s2 in range(s1, arity)},
                    "flip": {(s1, s2): np.zeros(st.cap, dtype=bool)
                             for s1 in range(arity)
                             for s2 in range(s1, arity)},
                }
                self._asm_rows_for(st, range(st.cap))
            rows = sorted(zone.get(si, ()))
            arity = st.keys.shape[1]
            Zc = self._mono_cap(f"az{si}", _pow2(max(len(rows), 1), 8))
            zidx = np.zeros(Zc, dtype=np.int32)
            zidx[:len(rows)] = rows
            vrows = []
            gvars = []
            for s in range(arity):
                vr = np.zeros(Zc, dtype=np.int32)
                vr[:len(rows)] = [self.var_row[int(st.keys[r, s])]
                                  for r in rows]
                vrows.append(jnp.asarray(vr))
                gv = np.full(Zc, self.n_cap + 1, dtype=np.int64)
                for k, r in enumerate(rows):
                    v = int(st.keys[r, s])
                    gv[k] = v if v in vset else self.n_cap + 1
                gvars.append(jnp.asarray(gv, dtype=jnp.int32))
            tgs, flips = [], []
            for s1 in range(arity):
                for s2 in range(s1, arity):
                    tg = np.full(Zc, self.B_cap + 1, dtype=np.int64)
                    fl = np.zeros(Zc, dtype=bool)
                    tg[:len(rows)] = st._asm["tg"][(s1, s2)][rows]
                    fl[:len(rows)] = st._asm["flip"][(s1, s2)][rows]
                    zero_slots.update(int(x) for x in tg[:len(rows)])
                    # dirty-but-not-zone rows (deactivated factors): their
                    # old contribution must still be cleared
                    for r in dirty.get(si, ()):
                        if r < st.cap and r not in zone.get(si, ()):
                            zero_slots.add(int(st._asm["tg"][(s1, s2)][r]))
                    tgs.append(jnp.asarray(tg, dtype=jnp.int32))
                    flips.append(jnp.asarray(fl))
            store_args.append((st.meas, st.R, jnp.asarray(zidx),
                               tuple(vrows), tuple(gvars), tuple(tgs),
                               tuple(flips)))
            sig_stores.append((st.batch.residual_fn, st.batch.var_types,
                               st.batch.rdim, st.cap, Zc))

        zs = np.fromiter(zero_slots, dtype=np.int64, count=len(zero_slots))
        Zs = self._mono_cap("azslots", _pow2(max(len(zs), 1), 64))
        zs_pad = np.full(Zs, self.B_cap + 1, dtype=np.int64)
        zs_pad[:len(zs)] = zs
        vz = np.fromiter(vset, dtype=np.int64, count=len(vset))
        Vz = self._mono_cap("azvars", _pow2(max(len(vz), 1), 64))
        vz_pad = np.full(Vz, self.n_cap + 1, dtype=np.int64)
        vz_pad[:len(vz)] = vz

        prog = self._asm_incr_program(tuple(sig_stores), Zs, Vz)
        H, g = prog(self.var_arrays, store_args,
                    jnp.asarray(zs_pad, dtype=jnp.int32),
                    jnp.asarray(vz_pad, dtype=jnp.int32),
                    self.Hres, self.gres)
        self.Hres, self.gres = H, g
        return H, g

    def _asm_incr_program(self, sig_stores, Zs, Vz):
        key = ("asm_incr", sig_stores, Zs, Vz, self.B_cap, self.n_cap,
               self.d, tuple(sorted(self.type_cap.items())))
        if key in self._jit_cache:
            return self._jit_cache[key]
        self._evict_jit()
        metas = [(st.batch, st.batch.var_types) for st in self.stores]
        d = self.d

        @jax.jit
        def incr(var_arrays, store_args, zero_slots, zero_vars, H, g):
            dt = _default_dtype()
            H = H.at[zero_slots].set(0.0, mode="drop")
            g = g.at[zero_vars].set(0.0, mode="drop")
            for (batch, types), (meas, R, zidx, vrows, gvars, tgs, flips) \
                    in zip(metas, store_args):
                meas_z = jax.tree.map(lambda a: a[zidx], meas)
                R_z = R[zidx]
                xs = tuple(jax.tree.map(lambda a: a[vrows[s]],
                                        var_arrays[t])
                           for s, t in enumerate(types))
                dims = batch.dims()
                retracts = tuple(manifolds.get(t).retract for t in types)

                def res_tangent(deltas, xs_one, meas_one):
                    xs_p = tuple(r(x, dd) for r, x, dd in
                                 zip(retracts, xs_one, deltas))
                    return batch.residual_fn(xs_p, meas_one)

                def one(xs_one, meas_one):
                    zeros = tuple(jnp.zeros(dd, dtype=dt) for dd in dims)
                    J = jax.jacfwd(res_tangent)(zeros, xs_one, meas_one)
                    r = res_tangent(zeros, xs_one, meas_one)
                    return J, r

                J, r = jax.vmap(one)(xs, meas_z)
                wJ = tuple(jnp.einsum("nij,njd->nid", R_z, Ji) for Ji in J)
                b = -jnp.einsum("nij,nj->ni", R_z, r)
                pi = 0
                for s1 in range(len(types)):
                    gi = jnp.einsum("nrd,nr->nd", wJ[s1], b)
                    gi = jnp.pad(gi, ((0, 0), (0, d - dims[s1])))
                    g = g.at[gvars[s1]].add(gi, mode="drop")
                    for s2 in range(s1, len(types)):
                        Hij = jnp.einsum("nri,nrj->nij", wJ[s1], wJ[s2])
                        Hij = jnp.pad(Hij, ((0, 0), (0, d - dims[s1]),
                                            (0, d - dims[s2])))
                        Hij = jnp.where(flips[pi][:, None, None],
                                        jnp.swapaxes(Hij, 1, 2), Hij)
                        H = H.at[tgs[pi]].add(Hij, mode="drop")
                        pi += 1
            return H, g

        self._jit_cache[key] = incr
        return incr

    # .. full assembly (H blocks + gradient), every update ..................

    def _asm_rows_for(self, st, rows):
        """(Re)compute cached assembly targets/flips for `rows` of store st.

        blk_get is idempotent slot allocation, so recomputation after a
        position change is safe regardless of refactor-plan order."""
        arity = st.keys.shape[1]
        cache = st._asm
        for s1 in range(arity):
            for s2 in range(s1, arity):
                tg = cache["tg"][(s1, s2)]
                fl = cache["flip"][(s1, s2)]
                for row in rows:
                    a = int(st.keys[row, s1])
                    b = int(st.keys[row, s2])
                    tg[row] = self._blk_get(a, b)
                    fl[row] = self.pos[a] < self.pos[b]

    def _assemble(self):
        dt = _default_dtype()
        d = self.d
        # host: contribution target lists — CACHED per store; only rows whose
        # variables were re-eliminated this update (fresh positions / fresh
        # block slots) are recomputed (the full per-factor python rebuild was
        # ~60 ms/update at sphere2500 scale)
        asm_t, g_t = [], []
        metas = []
        dirty = getattr(self, "_asm_dirty", {})
        for si, st in enumerate(self.stores):
            arity = st.keys.shape[1]
            cache = getattr(st, "_asm", None)
            if cache is None or cache["cap"] != st.cap:
                st._asm = cache = {
                    "cap": st.cap,
                    "tg": {(s1, s2): np.zeros(st.cap, dtype=np.int64)
                           for s1 in range(arity)
                           for s2 in range(s1, arity)},
                    "flip": {(s1, s2): np.zeros(st.cap, dtype=bool)
                             for s1 in range(arity)
                             for s2 in range(s1, arity)},
                }
                self._asm_rows_for(st, range(st.cap))
            elif si in dirty:
                self._asm_rows_for(st, sorted(dirty[si]))
            for s1 in range(arity):
                g_t.append(st.keys[:, s1].astype(np.int64))
                for s2 in range(s1, arity):
                    # stored block = (later, earlier); we emit value H_{s1 s2}
                    # and transpose when s1 is eliminated first
                    asm_t.append(cache["tg"][(s1, s2)])
                    metas.append((cache["flip"][(s1, s2)],))
        self._asm_dirty = {}
        asm_t_flat = (np.concatenate(asm_t) if asm_t
                      else np.zeros(0, dtype=np.int64))
        order = np.argsort(asm_t_flat, kind="stable").astype(np.int32)
        seg = asm_t_flat[order].astype(np.int32)
        g_t_flat = (np.concatenate(g_t) if g_t
                    else np.zeros(0, dtype=np.int64))
        gorder = np.argsort(g_t_flat, kind="stable").astype(np.int32)
        gseg = g_t_flat[gorder].astype(np.int32)

        prog = self._assembly_program()
        H, g = prog(self.var_arrays, self._store_args(),
                    [jnp.asarray(m[0]) for m in metas],
                    jnp.asarray(order), jnp.asarray(seg),
                    jnp.asarray(gorder), jnp.asarray(gseg))
        return H, g

    def _store_args(self):
        args = []
        for st in self.stores:
            rows = []
            for s, t in enumerate(st.batch.var_types):
                rows.append(jnp.asarray(
                    [self.var_row[int(v)] for v in st.keys[:, s]],
                    dtype=jnp.int32))
            args.append((st.meas, st.R, tuple(rows)))
        return args

    def _assembly_program(self):
        key = ("asm", self.B_cap, self.n_cap, self.d,
               tuple((st.batch.residual_fn, st.batch.var_types,
                      st.batch.rdim, st.cap) for st in self.stores),
               tuple(sorted(self.type_cap.items())))
        if key in self._jit_cache:
            return self._jit_cache[key]
        metas = [(st.batch, st.batch.var_types) for st in self.stores]
        d, B_cap, n_cap = self.d, self.B_cap, self.n_cap

        @jax.jit
        def assemble(var_arrays, store_args, flips, order, seg, gorder, gseg):
            dt = _default_dtype()
            h_parts, g_parts = [], []
            fi = 0
            for (batch, types), (meas, R, rows) in zip(metas, store_args):
                xs = tuple(jax.tree.map(lambda a: a[rows[s]], var_arrays[t])
                           for s, t in enumerate(types))
                dims = batch.dims()
                retracts = tuple(manifolds.get(t).retract for t in types)

                def res_tangent(deltas, xs_one, meas_one):
                    xs_p = tuple(r(x, dd) for r, x, dd in
                                 zip(retracts, xs_one, deltas))
                    return batch.residual_fn(xs_p, meas_one)

                def one(xs_one, meas_one):
                    zeros = tuple(jnp.zeros(dd, dtype=dt) for dd in dims)
                    J = jax.jacfwd(res_tangent)(zeros, xs_one, meas_one)
                    r = res_tangent(zeros, xs_one, meas_one)
                    return J, r

                J, r = jax.vmap(one)(xs, meas)
                wJ = tuple(jnp.einsum("nij,njd->nid", R, Ji) for Ji in J)
                b = -jnp.einsum("nij,nj->ni", R, r)
                for s1 in range(len(types)):
                    gi = jnp.einsum("nrd,nr->nd", wJ[s1], b)
                    g_parts.append(jnp.pad(gi, ((0, 0), (0, d - dims[s1]))))
                    for s2 in range(s1, len(types)):
                        Hij = jnp.einsum("nri,nrj->nij", wJ[s1], wJ[s2])
                        Hij = jnp.pad(Hij, ((0, 0), (0, d - dims[s1]),
                                            (0, d - dims[s2])))
                        Hij = jnp.where(flips[fi][:, None, None],
                                        jnp.swapaxes(Hij, 1, 2), Hij)
                        h_parts.append(Hij)
                        fi += 1
            H = jnp.zeros((B_cap + 1, d, d), dtype=dt)
            if h_parts:
                allH = jnp.concatenate(h_parts, axis=0)[order]
                H = H.at[seg].add(allH)
            g = jnp.zeros((n_cap + 1, d), dtype=dt)
            if g_parts:
                allG = jnp.concatenate(g_parts, axis=0)[gorder]
                g = g.at[gseg].add(allG)
            return H, g

        self._jit_cache[key] = assemble
        return assemble

    # .. refactorization of the affected top ..................................

    def _refactor_plans(self, new_sids):
        """Per-local-level runtime index bundles for the new snodes."""
        d = self.d
        new_set = set(new_sids)
        by_h: Dict[int, list] = {}
        for sid in new_sids:
            by_h.setdefault(self._local_height(sid, new_set), []).append(sid)
        plans = []
        sig = []
        # uniform MONOTONE caps across local levels AND across updates: one
        # signature per capacity chain, not per update shape (see _mono_cap)
        all_sids = [sid for h in sorted(by_h) for sid in by_h[h]]
        S_u = self._mono_cap(
            "rf_S", _pow2(max(len(v) for v in by_h.values()), 1))
        W_u = self._mono_cap(
            "rf_W", _bucket(max(len(self.snodes[s].cols) for s in all_sids),
                            _W_BUCKETS))
        R_u = self._mono_cap(
            "rf_R",
            _bucket(max((len(self.snodes[s].rows) for s in all_sids),
                        default=0), _R_BUCKETS)
            if any(self.snodes[s].rows for s in all_sids) else 0)
        raw_levels = []
        for h in sorted(by_h):
            sids = by_h[h]
            S, W, R = S_u, W_u, R_u
            F = W + R
            a_pos, a_blk = [], []
            e_src, e_dst = [], []
            er_src, er_dst = [], []
            uo_src, uo_dst = [], []
            yro_src, yro_dst = [], []
            col_vars = np.full((S, W), self.n_cap, dtype=np.int32)
            lo_src, lo_dst = [], []
            pad_cols = np.zeros((S, F * d), dtype=np.float64)
            # padded SUPERNODE rows (si >= len(sids)) must get full identity
            # fronts, or their all-zero Cholesky is NaN and the sentinel-row
            # scatter leaks it into real lanes through the shared backward
            # solve (hit with mixed-dim graphs where S_u > len(sids))
            pad_cols[len(sids):, :] = 1.0
            valid_piv = np.zeros((S, W * d), dtype=bool)
            if not hasattr(self, "_var_dim_arr") or \
                    len(self._var_dim_arr) < self.n_cap + 1:
                self._var_dim_arr = np.array(
                    [manifolds.get(t).dim for t in self.var_type]
                    + [d] * (self.n_cap + 1 - len(self.var_type)),
                    dtype=np.int64)
            slot_of = np.zeros(self.n_cap + 1, dtype=np.int64)
            for si, sid in enumerate(sids):
                s = self.snodes[sid]
                cols, rows = s.cols, s.rows
                w, r = len(cols), len(rows)
                cols_a = np.asarray(cols, dtype=np.int64)
                rows_a = np.asarray(rows, dtype=np.int64)
                # front SLOT of each fvar: cols at [0, w), rows at [W, W+r) —
                # when w < W (padded width bucket) the row region still starts
                # at W, NOT at w (rows inside padded column slots would make
                # Fcc indefinite).  slot_of is a scratch lookup; entries are
                # written immediately before every read, so staleness across
                # snodes is harmless.
                slot_of[cols_a] = np.arange(w)
                slot_of[rows_a] = W + np.arange(r)
                col_vars[si, :w] = cols_a
                dims = self._var_dim_arr[cols_a]               # (w,)
                lane = np.arange(d)[None, :]
                valid_piv[si, :w * d] = (lane < dims[:, None]).reshape(-1)
                pad_cols[si, :w * d] = (lane >= dims[:, None]).reshape(-1)
                pad_cols[si, w * d:W * d] = 1.0   # padded col slots only —
                # the row region of the front diag stays 0 for real snodes
                # A-block gather + L-block output: lower strip
                # (slot_i >= slot_j, fj < w).  _snode_blocks caches the
                # block-slot grids, so this is pure numpy (the per-pair
                # python loops + dict lookups here were 10+ s per update at
                # late-stage caps — the round-5 p50 regression)
                bd, bp = self._snode_blocks(s)      # (w,w) lower, (r,w)
                ii, jj = np.tril_indices(w)
                pos_d = (si * F + ii) * W + jj
                blk_d = bd[ii, jj]
                ar = np.arange(r)[:, None]
                bw = np.arange(w)[None, :]
                pos_p = ((si * F + W + ar) * W + bw).reshape(-1)
                blk_p = bp.reshape(-1)
                a_pos.extend(pos_d)
                a_pos.extend(pos_p)
                a_blk.extend(blk_d)
                a_blk.extend(blk_p)
                lo_src.extend(pos_d)
                lo_src.extend(pos_p)
                lo_dst.extend(blk_d)
                lo_dst.extend(blk_p)
                # extend-add children U and u_rhs (tril order matches the
                # row-major k loop that assigned u_slots)
                for c in s.children:
                    cs = self.snodes[c]
                    if not cs.rows:
                        continue
                    cr = np.asarray(cs.rows, dtype=np.int64)
                    cmap = slot_of[cr]
                    rc = len(cr)
                    ca, cb = np.tril_indices(rc)
                    fi = np.maximum(cmap[ca], cmap[cb])
                    fj = np.minimum(cmap[ca], cmap[cb])
                    e_src.extend(np.asarray(cs.u_slots[:len(ca)],
                                            dtype=np.int64))
                    e_dst.extend((si * F + fi) * F + fj)
                    er_src.extend(np.asarray(cs.urhs_slots[:rc],
                                             dtype=np.int64))
                    er_dst.extend(si * F + cmap)
                # outputs: U, u_rhs, y (childless roots carry no U slots)
                if r > 0:
                    ua, ub = np.tril_indices(r)
                    uo_src.extend((si * R + ua) * R + ub)
                    uo_dst.extend(np.asarray(s.u_slots[:len(ua)],
                                             dtype=np.int64))
                    yro_src.extend(si * R + np.arange(r))
                    yro_dst.extend(np.asarray(s.urhs_slots[:r],
                                              dtype=np.int64))
            raw_levels.append(dict(
                a_pos=a_pos, a_blk=a_blk, e_src=e_src, e_dst=e_dst,
                er_src=er_src, er_dst=er_dst, uo_src=uo_src, uo_dst=uo_dst,
                yro_src=yro_src, yro_dst=yro_dst, lo_src=lo_src,
                lo_dst=lo_dst, col_vars=col_vars, pad_cols=pad_cols,
                valid_piv=valid_piv))
        # uniform monotone index caps (shared by every level of every update)
        def _need(k):
            return max((len(rl[k]) for rl in raw_levels), default=0)
        E = self._mono_cap("rf_E", _pow2(max(_need("e_src"), 1), 64))
        ER = self._mono_cap("rf_ER", _pow2(max(_need("er_src"), 1), 64))
        A = self._mono_cap("rf_A", _pow2(max(_need("a_pos"), 1), 64))
        L = self._mono_cap("rf_L", _pow2(max(_need("lo_src"), 1), 64))
        Uo = self._mono_cap("rf_Uo", _pow2(max(_need("uo_src"), 1), 64))
        YR = self._mono_cap("rf_YR", _pow2(max(_need("yro_src"), 1), 64))
        S, W, R = S_u, W_u, R_u
        F = W + R

        def pad(a, cap, sent):
            a = np.asarray(a, dtype=np.int64)
            return np.pad(a, (0, cap - len(a)),
                          constant_values=sent).astype(np.int32)

        for rl in raw_levels:
            plans.append(dict(
                # a_pos sentinel: out-of-bounds -> dropped; a_blk pads to the
                # zero sentinel row of H
                a_pos=pad(rl["a_pos"], A, S * F * W),
                a_blk=pad(rl["a_blk"], A, self.B_cap),
                e_src=pad(rl["e_src"], E, self.U_cap),
                e_dst=pad(rl["e_dst"], E, S * F * F),
                er_src=pad(rl["er_src"], ER, self.UR_cap),
                er_dst=pad(rl["er_dst"], ER, S * F),
                uo_src=pad(rl["uo_src"], Uo, 0),
                uo_dst=pad(rl["uo_dst"], Uo, self.U_cap + 1),   # OOB -> drop
                yro_src=pad(rl["yro_src"], YR, 0),
                yro_dst=pad(rl["yro_dst"], YR, self.UR_cap + 1),
                lo_src=pad(rl["lo_src"], L, 0),
                lo_dst=pad(rl["lo_dst"], L, self.B_cap + 1),    # OOB -> drop
                col_vars=rl["col_vars"],
                pad_cols=rl["pad_cols"],
                valid_piv=rl["valid_piv"],
            ))
            sig.append((S, W, R, E, ER, A, L, Uo, YR))
        # pad the level list to a MONOTONE pow2 count with no-op dummy levels
        # so the refactor program signature stays stable across updates
        nlev_cap = self._mono_cap("rf_nlev", _pow2(max(len(plans), 1), 1))
        zero = lambda cap, sent: self._np_full((cap,), sent)
        while len(plans) < nlev_cap:
            plans.append(dict(
                a_pos=zero(A, S * F * W),
                a_blk=zero(A, self.B_cap),
                e_src=zero(E, self.U_cap),
                e_dst=zero(E, S * F * F),
                er_src=zero(ER, self.UR_cap),
                er_dst=zero(ER, S * F),
                uo_src=zero(Uo, 0),
                uo_dst=zero(Uo, self.U_cap + 1),
                yro_src=zero(YR, 0),
                yro_dst=zero(YR, self.UR_cap + 1),
                lo_src=zero(L, 0),
                lo_dst=zero(L, self.B_cap + 1),
                col_vars=self._np_full((S, W), self.n_cap),
                pad_cols=self._np_full((S, F * self.d), 1, "float64"),
                valid_piv=self._np_full((S, W * self.d), 0, "bool"),
            ))
            sig.append((S, W, R, E, ER, A, L, Uo, YR))
        return plans, tuple(sig)

    def _local_height(self, sid, new_set):
        s = self.snodes[sid]
        h = 0
        for c in s.children:
            if c in new_set:
                h = max(h, self._local_height(c, new_set) + 1)
        return h

    def _refactor_program(self, sig):
        key = ("refactor", sig, self.B_cap, self.n_cap, self.U_cap,
               self.UR_cap, self.d)
        if key in self._jit_cache:
            return self._jit_cache[key]
        self._evict_jit()
        d = self.d
        B_cap, n_cap = self.B_cap, self.n_cap
        U_cap, UR_cap = self.U_cap, self.UR_cap

        @jax.jit
        def refactor(H, g, Lb, Ubuf, Urhs, y, plans):
            # plans arrive STACKED (leading level axis); the level loop is a
            # lax.scan, so the compiled program is O(1) in tree depth — the
            # unrolled version compiled in O(nlev) (measured 60-240 s per new
            # capacity signature over the TPU tunnel, the round-4/5 ISAM2
            # tail-latency spikes)
            dt = H.dtype
            g_ext0 = jnp.concatenate([g, jnp.zeros((1, d), dtype=dt)])

            def level_body(carry, lp):
                Lb, Ubuf, Urhs, y = carry
                S, W = lp["col_vars"].shape
                F = lp["pad_cols"].shape[1] // d
                R = F - W
                # leading column strip from H (A-blocks)
                strip = jnp.zeros((S * F * W, d, d), dtype=dt)
                strip = strip.at[lp["a_pos"]].set(H[lp["a_blk"]],
                                                  mode="drop")
                # full lower front grid, extend-add cached U
                G = jnp.zeros((S * F * F + 1, d, d), dtype=dt)
                sfw = strip.reshape(S, F, W, d, d)
                fi_idx = np.arange(F)[None, :, None]
                fj_idx = np.arange(W)[None, None, :]
                s_idx = np.arange(S)[:, None, None]
                flat = ((s_idx * F + fi_idx) * F + fj_idx)
                G = G.at[flat.reshape(-1)].set(
                    sfw.reshape(S * F * W, d, d))
                G = G.at[lp["e_dst"]].add(Ubuf[lp["e_src"]], mode="drop")
                G = G[:-1].reshape(S, F, F, d, d)
                # symmetrize (lower stored)
                eye_mask = np.eye(F, dtype=bool)[None, :, :, None, None]
                Gt = jnp.swapaxes(jnp.swapaxes(G, 1, 2), 3, 4)
                G = jnp.where(eye_mask, G, G + Gt)
                front = G.transpose(0, 1, 3, 2, 4).reshape(S, F * d, F * d)
                front = front + jax.vmap(jnp.diag)(
                    lp["pad_cols"].astype(dt))
                # rhs front
                fr = jnp.zeros((S * F + 1, d), dtype=dt)
                cm = lp["col_vars"]
                fr = fr.at[(np.arange(S)[:, None] * F
                            + np.arange(W)[None, :]).reshape(-1)].set(
                    g_ext0[cm].reshape(S * W, d))
                fr = fr.at[lp["er_dst"]].add(Urhs[lp["er_src"]], mode="drop")
                fr = fr[:-1].reshape(S, F * d)
                # partial factorization
                Fcc = front[:, :W * d, :W * d]
                Lcc = jnp.linalg.cholesky(Fcc)
                Lcc = jnp.where(jnp.isfinite(Lcc), Lcc, 0.0)
                ycc = jax.lax.linalg.triangular_solve(
                    Lcc, fr[:, :W * d, None], left_side=True,
                    lower=True)[..., 0]
                # scatter y at columns
                yb = ycc.reshape(S, W, d).reshape(S * W, d)
                y = y.at[cm.reshape(-1)].set(yb, mode="drop")
                # L blocks out (cc part lives in the strip layout)
                if R > 0:
                    Frc = front[:, W * d:, :W * d]
                    Xt = jax.lax.linalg.triangular_solve(
                        Lcc, jnp.swapaxes(Frc, 1, 2), left_side=True,
                        lower=True)
                    Lrc = jnp.swapaxes(Xt, 1, 2)
                    Lrc = jnp.where(jnp.isfinite(Lrc), Lrc, 0.0)
                    Urr = (front[:, W * d:, W * d:]
                           - jnp.einsum("sij,skj->sik", Lrc, Lrc))
                    urhs_s = (fr[:, W * d:]
                              - jnp.einsum("sij,sj->si", Lrc, ycc))
                    # U out
                    Ub = Urr.reshape(S, R, d, R, d).transpose(0, 1, 3, 2, 4)
                    Ub = Ub.reshape(S * R * R, d, d)
                    Ubuf = Ubuf.at[lp["uo_dst"]].set(Ub[lp["uo_src"]],
                                                     mode="drop")
                    ub = urhs_s.reshape(S, R, d).reshape(S * R, d)
                    Urhs = Urhs.at[lp["yro_dst"]].set(ub[lp["yro_src"]],
                                                      mode="drop")
                    # L out: whole strip [Lcc; Lrc] in front layout
                    Lfull = jnp.concatenate([Lcc, Lrc], axis=1)
                else:
                    Lfull = Lcc
                Lb_blocks = Lfull.reshape(S, F, d, W, d).transpose(
                    0, 1, 3, 2, 4).reshape(S * F * W, d, d)
                Lb = Lb.at[lp["lo_dst"]].set(Lb_blocks[lp["lo_src"]],
                                             mode="drop")
                return (Lb, Ubuf, Urhs, y), None

            (Lb, Ubuf, Urhs, y), _ = jax.lax.scan(
                level_body, (Lb, Ubuf, Urhs, y), plans)
            return Lb, Ubuf, Urhs, y

        self._jit_cache[key] = refactor
        return refactor

    # .. backward substitution over the whole tree ............................

    def _backward_plans(self):
        d = self.d
        plans = []
        sig = []
        # UNIFORM caps across all levels: one compile signature for the whole
        # tree shape class (padding waste is small batched work; recompiles
        # over the tunnel are 30s+)
        live = [lev for lev in range(len(self.levels))
                if any(s in self.snodes for s in self.levels[lev])]
        all_s = [s for lev in live for s in self.levels[lev]
                 if s in self.snodes]
        S_u = self._mono_cap(
            "bw_S", _pow2(max((len([s for s in self.levels[lev]
                                    if s in self.snodes]) for lev in live),
                              default=1), 1))
        W_u = self._mono_cap(
            "bw_W", _bucket(max((len(self.snodes[s].cols) for s in all_s),
                                default=1), _W_BUCKETS))
        R_u = self._mono_cap(
            "bw_R",
            _bucket(max((len(self.snodes[s].rows) for s in all_s),
                        default=0), _R_BUCKETS)
            if any(self.snodes[s].rows for s in all_s) else 0)
        nlev_cap = self._mono_cap("bw_nlev", _pow2(max(len(live), 1), 2))
        for lev in range(len(self.levels) - 1, -1, -1):
            sids = [s for s in self.levels[lev] if s in self.snodes]
            if not sids:
                continue
            S, W, R = S_u, W_u, R_u
            diag_ids = np.full((S, W, W), self.B_cap, dtype=np.int32)
            panel_ids = np.full((S, R, W), self.B_cap, dtype=np.int32)
            col_vars = np.full((S, W), self.n_cap, dtype=np.int32)
            row_vars = np.full((S, R), self.n_cap, dtype=np.int32)
            for si, sid in enumerate(sids):
                s = self.snodes[sid]
                bd, bp = self._snode_blocks(s)
                w, r = len(s.cols), len(s.rows)
                col_vars[si, :w] = s.cols
                row_vars[si, :r] = s.rows
                ii, jj = np.tril_indices(w)
                diag_ids[si, ii, jj] = bd[ii, jj]
                panel_ids[si, :r, :w] = bp
            plans.append(dict(
                diag_ids=diag_ids,
                panel_ids=panel_ids,
                col_vars=col_vars,
                row_vars=row_vars,
            ))
        while len(plans) < nlev_cap:   # no-op dummy levels
            plans.append(dict(
                diag_ids=self._np_full((S_u, W_u, W_u), self.B_cap),
                panel_ids=self._np_full((S_u, R_u, W_u), self.B_cap),
                col_vars=self._np_full((S_u, W_u), self.n_cap),
                row_vars=self._np_full((S_u, R_u), self.n_cap),
            ))
        sig = (nlev_cap, S_u, W_u, R_u)
        return plans, sig

    def _backward_program(self, sig):
        key = ("backward", sig, self.B_cap, self.n_cap, self.d)
        if key in self._jit_cache:
            return self._jit_cache[key]
        self._evict_jit()
        d, n_cap = self.d, self.n_cap

        @jax.jit
        def backward(Lb, y, plans):
            # stacked level plans + lax.scan: program size O(1) in depth
            # (same conversion as the refactor program)
            dt = Lb.dtype
            x0 = jnp.zeros((n_cap + 1, d), dtype=dt)

            def level_body(x, lp):
                S, W = lp["col_vars"].shape
                R = lp["row_vars"].shape[1]
                # dense L_cc per snode (lower grid -> dense)
                G = Lb[lp["diag_ids"]]                        # (S,W,W,d,d)
                Ld = G.transpose(0, 1, 3, 2, 4).reshape(S, W * d, W * d)
                # padded cols: identity so the solve is well-posed
                diag = jnp.diagonal(Ld, axis1=-2, axis2=-1)
                fix = (jnp.abs(diag) < 1e-300).astype(dt)
                Ld = Ld + jax.vmap(jnp.diag)(fix)
                rhs = y[lp["col_vars"]].reshape(S, W * d)
                if R > 0:
                    P = Lb[lp["panel_ids"]]                   # (S,R,W,d,d)
                    Pd = P.transpose(0, 1, 3, 2, 4).reshape(S, R * d, W * d)
                    xr = x[lp["row_vars"]].reshape(S, R * d)
                    rhs = rhs - jnp.einsum("sij,si->sj", Pd, xr)
                xs = jax.lax.linalg.triangular_solve(
                    Ld, rhs[..., None], left_side=True, lower=True,
                    transpose_a=True)[..., 0]
                xb = xs.reshape(S, W, d).reshape(S * W, d)
                x = x.at[lp["col_vars"].reshape(-1)].set(xb, mode="drop")
                return x, None

            x, _ = jax.lax.scan(level_body, x0, plans)
            return x

        self._jit_cache[key] = backward
        return backward

    def _snode_blocks(self, s):
        """Cached (w,w) lower diag-slot grid + (r,w) panel-slot grid."""
        if s.blk_diag is None:
            cols, rows = s.cols, s.rows
            w, r = len(cols), len(rows)
            bd = np.zeros((w, w), dtype=np.int32)
            for a in range(w):
                for b in range(a + 1):
                    bd[a, b] = self._blk_get(cols[a], cols[b])
            bp = np.zeros((r, w), dtype=np.int32)
            for a in range(r):
                for b in range(w):
                    bp[a, b] = self._blk_get(rows[a], cols[b])
            s.blk_diag, s.blk_panel = bd, bp
        return s.blk_diag, s.blk_panel

    def _evict_jit(self, cap: int = 512):
        """Bound compiled-program memory (old capacity signatures die)."""
        while len(self._jit_cache) >= cap:
            oldest = next(iter(self._jit_cache))
            del self._jit_cache[oldest]

    # -- marginalization ------------------------------------------------------

    def marginalize_leaves(self, keys):
        """Freeze leaf supernodes whose columns are all in `keys`: their
        cached Schur complement becomes a permanent prior on the separator
        and their factors/variables leave the active system (ISAM2::
        marginalizeLeaves, gtsam/nonlinear/ISAM2.h:192-199)."""
        if self.optimization != "gn":
            raise ValueError(
                "marginalize_leaves requires optimization='gn': the dogleg "
                "gradient/Hessian ride the resident factor H/g, which no "
                "longer carries frozen subtrees' folded marginal terms")
        vids = {self.key_to_vid[int(k)] for k in keys}
        frozen_any = False
        for sid, s in list(self.snodes.items()):
            if s.frozen or s.children:
                # only leaves (children must all be frozen)
                if s.children and all(self.snodes[c].frozen
                                      for c in s.children) and not s.frozen:
                    pass
                else:
                    continue
            if not set(s.cols) <= vids:
                continue
            # fold the separator-pair contributions of this snode's factors
            # into the cached U/Urhs (they disappear from future assemblies)
            self._fold_factor_separator_terms(s)
            # deactivate factors fully inside cols (weight rows to zero)
            for v in s.cols:
                for (si, row) in list(self._vid_factors[v]):
                    st = self.stores[si]
                    st.R = st.R.at[row].set(
                        jnp.zeros_like(st.R[row]))
                    self._asm_dirty.setdefault(si, set()).add(row)
                    for w in st.keys[row]:
                        self._vid_factors[int(w)].discard((si, row))
            s.frozen = True
            frozen_any = True
        return frozen_any

    def _fold_factor_separator_terms(self, s: _SNode):
        """Add the separator-block H/g contributions of s's factors into the
        cached U/Urhs so dropping the factors preserves the marginal."""
        rows = s.rows
        if not rows:
            return
        facs = set()
        for v in s.cols:
            facs |= self._vid_factors[v]
        H, g = self._assemble_subset(facs)
        r = len(rows)
        # U entries are stored as blocks (row_a, row_b) with a >= b in the
        # snode's row order == ascending elimination position, matching the
        # (later, earlier) orientation of _assemble_subset values.
        k = 0
        upd, dsts = [], []
        for a in range(r):
            for b in range(a + 1):
                pr = self._blk_key(rows[a], rows[b])
                if pr in H:
                    upd.append(H[pr])
                    dsts.append(int(s.u_slots[k]))
                k += 1
        if upd:
            self.Ubuf = self.Ubuf.at[jnp.asarray(dsts)].add(
                jnp.asarray(np.stack(upd)))
        gupd, gdst = [], []
        for a, v in enumerate(rows):
            if v in g:
                gupd.append(g[v])
                gdst.append(int(s.urhs_slots[a]))
        if gupd:
            self.Urhs = self.Urhs.at[jnp.asarray(gdst)].add(
                jnp.asarray(np.stack(gupd)))

    def _blk_key(self, a, b):
        return (a, b) if a <= b else (b, a)

    def _assemble_subset(self, facs):
        """Host-side tiny assembly of H-block/gradient contributions of the
        given (store, row) factor set (numpy; used only at marginalization)."""
        Hd: Dict[tuple, np.ndarray] = {}
        gd: Dict[int, np.ndarray] = {}
        d = self.d
        for (si, row) in facs:
            st = self.stores[si]
            types = st.batch.var_types
            xs = tuple(
                jax.tree.map(lambda a: a[self.var_row[int(st.keys[row, s])]],
                             self.var_arrays[t])
                for s, t in enumerate(types))
            dims = st.batch.dims()
            retracts = tuple(manifolds.get(t).retract for t in types)
            meas_one = jax.tree.map(lambda a: a[row], st.meas)

            def res_tangent(deltas):
                xs_p = tuple(r(x, dd) for r, x, dd in
                             zip(retracts, xs, deltas))
                return st.batch.residual_fn(xs_p, meas_one)

            zeros = tuple(jnp.zeros(dd) for dd in dims)
            J = jax.jacfwd(res_tangent)(zeros)
            rres = res_tangent(zeros)
            R = st.R[row]
            wJ = [np.asarray(R @ Ji) for Ji in J]
            b = -np.asarray(R @ rres)
            for s1 in range(len(types)):
                v1 = int(st.keys[row, s1])
                gi = wJ[s1].T @ b
                gd[v1] = gd.get(v1, np.zeros(d)) + np.pad(
                    gi, (0, d - dims[s1]))
                for s2 in range(s1, len(types)):
                    v2 = int(st.keys[row, s2])
                    Hij = wJ[s1].T @ wJ[s2]
                    Hij = np.pad(Hij, ((0, d - dims[s1]), (0, d - dims[s2])))
                    if self.pos[v1] < self.pos[v2]:
                        Hij = Hij.T     # orient to (later, earlier)
                    key = self._blk_key(v1, v2)
                    Hd[key] = Hd.get(key, np.zeros((d, d))) + Hij
        return Hd, gd

    # -- dogleg updateDelta ---------------------------------------------------
    # Reference: ISAM2.cpp:724-779 (updateDelta, dogleg branch) feeding
    # DoglegOptimizerImpl::Iterate (DoglegOptimizerImpl.h:138): blend the
    # Newton step with the Cauchy step at the persistent trust radius,
    # evaluate the TRUE nonlinear error at the blend, adapt the radius from
    # the gain ratio, and publish the blended delta.  gradientAtZero is the
    # resident assembled gradient g (H dx = g is the normal-equation form of
    # the Bayes tree), and g'Hg rides the resident H blocks.

    def _ensure_err_idx(self, st):
        cache = getattr(st, "_err_idx", None)
        if cache is not None and cache["cap"] == st.cap \
                and cache["n"] == st.n:
            return cache
        arity = st.keys.shape[1]
        rows = np.zeros((st.cap, arity), dtype=np.int32)
        vids = np.full((st.cap, arity), self.n_cap, dtype=np.int32)
        for r in range(st.n):
            for s in range(arity):
                v = int(st.keys[r, s])
                rows[r, s] = self.var_row[v]
                vids[r, s] = v
        st._err_idx = dict(cap=st.cap, n=st.n, rows=jnp.asarray(rows),
                           vids=jnp.asarray(vids))
        return st._err_idx

    def _err_program(self, sig):
        key = ("nlerr", sig, self.n_cap, self.d,
               tuple(sorted(self.type_cap.items())))
        if key in self._jit_cache:
            return self._jit_cache[key]
        self._evict_jit()
        metas = [(st.batch, st.batch.var_types) for st in self.stores]

        @jax.jit
        def err(var_arrays, store_args, dpad):
            tot = jnp.zeros((), dtype=dpad.dtype)
            for (batch, types), (meas, R, rows, vids) in zip(
                    metas, store_args):
                dims = batch.dims()
                retracts = tuple(manifolds.get(t).retract for t in types)
                xs = tuple(jax.tree.map(lambda a: a[rows[:, s]],
                                        var_arrays[t])
                           for s, t in enumerate(types))
                ds = tuple(dpad[vids[:, s], :dims[s]]
                           for s in range(len(types)))

                def one(xs_one, ds_one, meas_one, R_one):
                    xs_p = tuple(r(x, dd) for r, x, dd in
                                 zip(retracts, xs_one, ds_one))
                    w = R_one @ batch.residual_fn(xs_p, meas_one)
                    return 0.5 * jnp.sum(w * w)

                tot = tot + jnp.sum(jax.vmap(one)(xs, ds, meas, R))
            return tot

        self._jit_cache[key] = err
        return err

    def _nl_error(self, delta=None) -> float:
        """Total nonlinear half-chi2 at retract(theta, delta).

        Inactive (padding / marginalized) factor rows have R == 0 and
        contribute nothing; delta rows are indexed by vid (padding row
        n_cap is zero)."""
        dpad = np.zeros((self.n_cap + 1, self.d))
        if delta is not None:
            dpad[:self.nvar] = delta
        args, sig = [], []
        for st in self.stores:
            idx = self._ensure_err_idx(st)
            args.append((st.meas, st.R, idx["rows"], idx["vids"]))
            sig.append((st.batch.residual_fn, st.batch.var_types,
                        st.batch.rdim, st.cap))
        prog = self._err_program(tuple(sig))
        return float(prog(self.var_arrays, args, jnp.asarray(dpad)))

    def _hres_matvec(self):
        """Block-sparse y = H x over the resident assembled H blocks.

        Stored block orientation is (larger-pos rows, smaller-pos cols) —
        the same convention the assembly flips enforce."""
        items = list(self.block_slot.items())
        aa = np.fromiter((p[0] for p, _ in items), dtype=np.int64,
                         count=len(items))
        bb = np.fromiter((p[1] for p, _ in items), dtype=np.int64,
                         count=len(items))
        slots = np.fromiter((s for _, s in items), dtype=np.int64,
                            count=len(items))
        hi = self.pos[aa] >= self.pos[bb]
        p = np.where(hi, aa, bb)
        q = np.where(hi, bb, aa)
        Hb = np.asarray(self.Hres, dtype=np.float64)[slots]
        off = p != q

        def mv(v):     # v: (nvar, d)
            out = np.zeros_like(v)
            np.add.at(out, p, np.einsum("mij,mj->mi", Hb, v[q]))
            np.add.at(out, q[off],
                      np.einsum("mji,mj->mi", Hb[off], v[p[off]]))
            return out

        return mv

    def _update_delta_dogleg(self):
        n, d = self.nvar, self.d
        dx_n = np.asarray(self.delta_host[:n], dtype=np.float64)
        g = np.asarray(self.gres[:n], dtype=np.float64)
        mv = self._hres_matvec()
        err0 = self._nl_error(None)
        gg = float(np.vdot(g, g))
        gHg = float(np.vdot(g, mv(g)))
        alpha = gg / gHg if gHg > 0 else 0.0
        dx_u = alpha * g
        n_gn = float(np.linalg.norm(dx_n))
        n_u = float(np.linalg.norm(dx_u))
        dx_d = dx_n
        for _ in range(10):       # SEARCH_EACH_ITERATION analog
            delta = self.delta_trust
            if n_gn <= delta:
                dx_d = dx_n
            elif n_u >= delta:
                dx_d = dx_u * (delta / max(n_u, 1e-300))
            else:
                # || dx_u + tau (dx_n - dx_u) || = delta
                dvec = dx_n - dx_u
                a = float(np.vdot(dvec, dvec))
                b = 2.0 * float(np.vdot(dx_u, dvec))
                c = float(np.vdot(dx_u, dx_u)) - delta * delta
                disc = max(b * b - 4 * a * c, 0.0)
                tau = (-b + np.sqrt(disc)) / max(2 * a, 1e-300)
                dx_d = dx_u + tau * dvec
            err_new = self._nl_error(dx_d)
            pred = float(np.vdot(g, dx_d)) - 0.5 * float(
                np.vdot(dx_d, mv(dx_d)))
            rho = (err0 - err_new) / pred if pred > 0 else -1.0
            if rho > 0.75:
                # reference DoglegOptimizerImpl expansion: Delta jumps to
                # 3*|dx_d| when the model fits well, so a tiny radius
                # recovers immediately instead of one doubling per update
                self.delta_trust = min(
                    max(self.delta_trust, 3.0 * float(np.linalg.norm(dx_d))),
                    1e10)
            elif rho < 0.25:
                self.delta_trust = self.delta_trust / 2.0
            if np.isfinite(err_new) and err_new <= err0:
                break
            if self.delta_trust < 1e-10:
                break
        self.delta_host[:n] = dx_d

    # -- estimates ------------------------------------------------------------

    def calculate_estimate(self) -> Values:
        entries = []
        for t in self.types:
            man = manifolds.get(t)
            for vid in self.type_rows[t]:
                row = self.var_row[vid]
                val = jax.tree.map(lambda a: a[row], self.var_arrays[t])
                if len(self.delta_host):
                    dd = jnp.asarray(self.delta_host[vid][:man.dim])
                    val = man.retract(val, dd)
                entries.append((self.var_key[vid], t, val))
        return Values.from_entries(entries)

    def estimate_of(self, key):
        vid = self.key_to_vid[int(key)]
        t = self.var_type[vid]
        man = manifolds.get(t)
        val = jax.tree.map(lambda a: a[self.var_row[vid]], self.var_arrays[t])
        if len(self.delta_host):
            val = man.retract(val, jnp.asarray(self.delta_host[vid][:man.dim]))
        return val

    # -- introspection --------------------------------------------------------

    def stats(self):
        return dict(
            nvar=self.nvar, nsuper=len(self.snodes),
            nlevels=sum(1 for l in self.levels if l),
            blocks=self.block_pool.top - len(self.block_pool.free),
            frozen=sum(1 for s in self.snodes.values() if s.frozen))
