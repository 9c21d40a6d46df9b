"""Sparse-interior distributed pose-graph solver: partition -> per-shard
SUPERNODAL partial elimination -> separator Schur psum -> replicated
separator solve -> local back-substitution.

This replaces the round-4 dense-interior design (sharded_posegraph.py kept
as the small-problem fallback): interiors are eliminated with the same
level-batched supernodal machinery as the single-device solver
(linear/supernodal.py), so per-device memory is O(nnz(L_shard)) instead of
O(shard^2) and work O(supernodal fill) instead of O(shard^3).

Reference blueprint: gtsam_unstable/partition NestedDissection-inl.h +
FindSeparator-inl.h:240 (recursive partition -> cluster tree); the psum over
the mesh is the ICI collective replacing the reference's shared-memory
junction-tree reduction (SURVEY §2.8 P5, §5.8).

SPMD uniformity: every device runs the SAME program; per-device symbolic
structure (orderings, level plans, scatter maps) is padded to fleet-wide
caps and shipped as SHARDED OPERANDS (leading mesh axis), the same
operand-plan pattern as ISAM2Tree's refactor programs.  Sentinel rows make
padded lanes inert: gathers read a zero block, scatters land in a dump slot.
"""

import dataclasses
from typing import List

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..graph import factors as factors_mod
from ..graph.values import Values
from ..inference import ordering as ordering_mod
from ..inference import supernodes as sn_mod
from .sharded_posegraph import ShardedPoseGraphStructure


def _pad_to(a, n, fill):
    a = np.asarray(a)
    if len(a) >= n:
        return a[:n]
    pad = np.full((n - len(a),) + a.shape[1:], fill, dtype=a.dtype)
    return np.concatenate([a, pad])


def make_sharded_supernodal_solver(mesh: Mesh,
                                   st: ShardedPoseGraphStructure,
                                   graph, values: Values,
                                   axis: str = "blocks",
                                   force_width: int = 16):
    """Build a jitted one-damped-GN-step solver over the mesh.

    Returns solve(arrays, lam) -> delta (total_dim,) in the Values layout,
    exact w.r.t. the single-device damped-GN solve (tested).
    """
    layout = values.layout()
    D = layout.total_dim
    ndev = st.ndev
    tname = "SE3" if "SE3" in values.arrays else "SE2"
    dim = 6 if tname == "SE3" else 3
    offsets = layout.offsets[tname]
    nsep = len(st.separator)

    # ---- factor ownership (same rule as sharded_posegraph) ----------------
    nkeys = len(offsets)
    owner = np.full(nkeys, -1, dtype=np.int32)
    for d, block in enumerate(st.interior):
        owner[block] = d
    sel_per_dev = [[] for _ in range(ndev)]
    rr = 0
    for bi, b in enumerate(graph.batches):
        dev_rows: List[List[int]] = [[] for _ in range(ndev)]
        for i in range(b.num_factors):
            dsel = -1
            for k in b.keys[i]:
                if owner[int(k)] >= 0:
                    dsel = int(owner[int(k)])
                    break
            if dsel < 0:
                dsel = rr % ndev
                rr += 1
            dev_rows[dsel].append(i)
        for d in range(ndev):
            sel_per_dev[d].append((bi, np.asarray(dev_rows[d],
                                                  dtype=np.int64)))

    # ---- per-device local variable space [interior_d | separator] ---------
    ni = [len(b) for b in st.interior]
    ni_max = max(ni)
    nloc_max = ni_max + nsep
    # local var v -> global key row; padded with key row 0 (masked)
    local_keys = np.zeros((ndev, nloc_max), dtype=np.int64)
    local_mask = np.zeros((ndev, nloc_max), dtype=bool)
    # global key -> local var id per device
    g2l = np.full((ndev, nkeys), -1, dtype=np.int64)
    for d in range(ndev):
        lk = np.concatenate([st.interior[d], st.separator])
        local_keys[d, :len(lk)] = lk
        local_mask[d, :len(lk)] = True
        g2l[d, lk] = np.arange(len(lk))
        # pad slots alias var 0 (masked out of every scatter)
    rows_of = values.rows_of(tname, np.arange(nkeys))
    local_rows = rows_of[local_keys]                       # (ndev, nloc_max)

    # ---- per-device symbolic: separator-last AMD + barrier supernodes -----
    syms = []
    for d in range(ndev):
        n_d = ni[d] + nsep
        fkeys = []
        for bi, rows in sel_per_dev[d]:
            b = graph.batches[bi]
            if len(rows) == 0:
                continue
            fkeys.append(g2l[d][b.keys[rows]])
        adj = ordering_mod.adjacency_from_factors(fkeys, n_d)
        # interior ordered by nested dissection (log-depth level schedule —
        # AMD on chain-like shards produces O(shard/width) sequential
        # levels), separator kept last
        if ni[d] > 1:
            adj_int = adj[:ni[d], :ni[d]].tocsr()
            perm_int = ordering_mod.nested_dissection(adj_int)
        else:
            perm_int = np.arange(ni[d])
        perm = np.concatenate([perm_int,
                               np.arange(ni[d], n_d)]).astype(np.int64)
        sym = sn_mod.analyze_supernodal(adj, perm, force_width=force_width,
                                        barrier=ni[d])
        syms.append(sym)

    # fleet-wide caps
    B_max = max(s.nnz_blocks for s in syms)
    SENT = B_max            # zero block for padded gathers
    DUMP = B_max + 1        # write sink for padded scatters
    int_levels = []         # per device: list of interior-snode id arrays
    for d, sym in enumerate(syms):
        lvls = []
        for sids in sym.levels:
            ii = [s for s in sids if sym.snode_start[s] < ni[d]]
            if ii:
                lvls.append(np.asarray(ii))
        int_levels.append(lvls)
    L_max = max((len(l) for l in int_levels), default=0)
    S_u = max((len(s) for lv in int_levels for s in lv), default=1)
    W_u = max((int(syms[d].snode_width[s])
               for d in range(ndev) for lv in int_levels[d] for s in lv),
              default=1)
    R_u = max((len(syms[d].snode_rows[s])
               for d in range(ndev) for lv in int_levels[d] for s in lv),
              default=0)

    # ---- per-device per-level plans (stacked operands) --------------------
    def level_plan(d, lev):
        sym = syms[d]
        sids = int_levels[d][lev] if lev < len(int_levels[d]) else []
        S, W, R = S_u, W_u, R_u
        diag_ids = np.full((S, W, W), SENT, dtype=np.int32)
        diag_flip = np.zeros((S, W, W), dtype=bool)
        diag_pad = np.ones((S, W * dim), dtype=np.float32)
        col_vars = np.full((S, W), nloc_max, dtype=np.int32)  # sentinel var
        panel_ids = np.full((S, R, W), SENT, dtype=np.int32)
        row_vars = np.full((S, R), nloc_max, dtype=np.int32)
        sc_tgt = np.full((S * R * R,), DUMP, dtype=np.int32)
        for si, s in enumerate(sids):
            c0, w = int(sym.snode_start[s]), int(sym.snode_width[s])
            col_vars[si, :w] = sym.perm[c0:c0 + w]     # ORIGINAL local var
            diag_pad[si, :w * dim] = 0.0
            for a in range(w):
                for b in range(w):
                    if a >= b:
                        diag_ids[si, a, b] = sym.block_of[(c0 + a, c0 + b)]
                    else:
                        diag_ids[si, a, b] = sym.block_of[(c0 + b, c0 + a)]
                        diag_flip[si, a, b] = True
            rows = sym.snode_rows[s]
            row_vars[si, :len(rows)] = sym.perm[rows]
            for a, ra in enumerate(rows):
                for b in range(w):
                    panel_ids[si, a, b] = sym.block_of[(int(ra), c0 + b)]
                for b in range(a + 1):
                    sc_tgt[(si * R + a) * R + b] = \
                        sym.block_of[(int(ra), int(rows[b]))]
        return dict(diag_ids=diag_ids, diag_flip=diag_flip,
                    diag_pad=diag_pad, col_vars=col_vars,
                    panel_ids=panel_ids, row_vars=row_vars, sc_tgt=sc_tgt)

    plans = {k: [] for k in ("diag_ids", "diag_flip", "diag_pad", "col_vars",
                             "panel_ids", "row_vars", "sc_tgt")}
    for lev in range(L_max):
        per_dev = [level_plan(d, lev) for d in range(ndev)]
        for k in plans:
            plans[k].append(np.stack([p[k] for p in per_dev]))
    # (L, ndev, ...) -> (ndev, L, ...)
    plan_ops = {k: jnp.asarray(np.stack(v, axis=1)) if v else
                jnp.zeros((ndev, 0), jnp.int32) for k, v in plans.items()}

    # ---- assembly plans ----------------------------------------------------
    # For every (batch, slot-pair) the contribution rows are laid out in a
    # FIXED fleet-uniform order; per-device target block ids + valid masks
    # are operands.  Padded factor rows alias row 0 of the batch (masked).
    F_max = [max(1, max(len(dict(sel_per_dev[d])[bi]) for d in range(ndev)))
             for bi in range(len(graph.batches))]
    batch_rows = []       # per batch: (ndev, F_max) source factor rows
    batch_valid = []      # per batch: (ndev, F_max) bool
    batch_lvid = []       # per batch: (ndev, F_max, arity) local var ids
    for bi, b in enumerate(graph.batches):
        rows_d = np.zeros((ndev, F_max[bi]), dtype=np.int64)
        val_d = np.zeros((ndev, F_max[bi]), dtype=bool)
        lvid_d = np.zeros((ndev, F_max[bi], b.keys.shape[1]), dtype=np.int64)
        for d in range(ndev):
            rows = dict(sel_per_dev[d])[bi]
            rows_p = _pad_to(rows, F_max[bi], 0)
            if len(rows) == 0:
                rows_p[:] = 0
            rows_d[d] = rows_p
            val_d[d, :len(rows)] = True
            lv = g2l[d][b.keys[rows_p]]
            lv[lv < 0] = 0        # padded / foreign keys -> var 0 (masked)
            lvid_d[d] = lv
        batch_rows.append(rows_d)
        batch_valid.append(val_d)
        batch_lvid.append(lvid_d)

    # stacked measurements + noise (leaf-wise stack of per-device slices)
    batch_meas, batch_noise = [], []
    for bi, b in enumerate(graph.batches):
        sl = [factors_mod.slice_batch(b, batch_rows[bi][d])
              for d in range(ndev)]
        batch_meas.append(jax.tree.map(lambda *xs: jnp.stack(xs),
                                       *[s.measurements for s in sl])
                          if b.measurements is not None else None)
        batch_noise.append(jax.tree.map(lambda *xs: jnp.stack(xs),
                                        *[s.noise for s in sl]))

    # per-device H-assembly targets per (batch, s1<=s2) in fixed order
    asm_tgt, asm_flip = [], []
    for bi, b in enumerate(graph.batches):
        arity = b.keys.shape[1]
        for s1 in range(arity):
            for s2 in range(s1, arity):
                tgt = np.full((ndev, F_max[bi]), DUMP, dtype=np.int32)
                flip = np.zeros((ndev, F_max[bi]), dtype=bool)
                for d in range(ndev):
                    sym = syms[d]
                    lv = batch_lvid[bi][d]
                    pi = sym.inv_perm[lv[:, s1]]
                    pj = sym.inv_perm[lv[:, s2]]
                    hi = np.maximum(pi, pj)
                    lo = np.minimum(pi, pj)
                    for f in range(F_max[bi]):
                        if not batch_valid[bi][d, f]:
                            continue
                        tgt[d, f] = sym.block_of[(int(hi[f]), int(lo[f]))]
                        flip[d, f] = pi[f] < pj[f]
                asm_tgt.append(jnp.asarray(tgt))
                asm_flip.append(jnp.asarray(flip))

    # separator-block collection: per device, for every sep-pair block in
    # its structure: (block id, si, sj) with si >= sj in GLOBAL sep indexing
    P_max = 0
    sep_cols = []
    for d, sym in enumerate(syms):
        entries = []
        for (pr, pc), blk in sym.block_of.items():
            i, j = int(sym.perm[pr]), int(sym.perm[pc])
            if i >= ni[d] and j >= ni[d]:
                si, sj = i - ni[d], j - ni[d]
                entries.append((blk, si, sj))
        sep_cols.append(entries)
        P_max = max(P_max, len(entries))
    sep_blk = np.full((ndev, P_max), SENT, dtype=np.int32)
    sep_i = np.zeros((ndev, P_max), dtype=np.int32)
    sep_j = np.zeros((ndev, P_max), dtype=np.int32)
    for d, entries in enumerate(sep_cols):
        for p, (blk, si, sj) in enumerate(entries):
            sep_blk[d, p] = blk
            sep_i[d, p] = si
            sep_j[d, p] = sj

    # local var id (original local indexing) -> permuted column, per device
    inv_perm_ops = np.zeros((ndev, nloc_max + 1), dtype=np.int32)
    perm_ops = np.full((ndev, nloc_max + 1), nloc_max, dtype=np.int32)
    diag_blk_ops = np.full((ndev, nloc_max), SENT, dtype=np.int32)
    for d, sym in enumerate(syms):
        n_d = ni[d] + nsep
        inv_perm_ops[d, :n_d] = sym.inv_perm
        inv_perm_ops[d, n_d:] = 0
        perm_ops[d, :n_d] = sym.perm
        diag_blk_ops[d, :n_d] = sym.diag_block_by_col[sym.inv_perm]
    # interior mask in ORIGINAL local indexing (+ sentinel slot)
    int_mask = np.zeros((ndev, nloc_max + 1), dtype=bool)
    for d in range(ndev):
        int_mask[d, :ni[d]] = True

    ops = dict(
        local_rows=jnp.asarray(local_rows),
        local_mask=jnp.asarray(local_mask),
        diag_blk=jnp.asarray(diag_blk_ops),
        int_mask=jnp.asarray(int_mask),
        sep_blk=jnp.asarray(sep_blk), sep_i=jnp.asarray(sep_i),
        sep_j=jnp.asarray(sep_j),
        **{f"plan_{k}": v for k, v in plan_ops.items()},
        **{f"asm_tgt_{i}": t for i, t in enumerate(asm_tgt)},
        **{f"asm_flip_{i}": t for i, t in enumerate(asm_flip)},
        **{f"lvid_{bi}": jnp.asarray(v) for bi, v in enumerate(batch_lvid)},
        **{f"valid_{bi}": jnp.asarray(v) for bi, v in
           enumerate(batch_valid)},
    )
    meas_ops = batch_meas
    noise_ops = batch_noise

    man = values.arrays[tname]
    nI = ni_max * dim

    def device_body(arrays_t, lam, *op_leaves):
        opd = jax.tree.unflatten(ops_treedef, op_leaves)
        o = {k: v[0] for k, v in opd["ops"].items()}
        meas = [None if m is None else jax.tree.map(lambda a: a[0], m)
                for m in opd["meas"]]
        noises = [jax.tree.map(lambda a: a[0], nz) for nz in opd["noise"]]
        dt = jnp.result_type(jax.tree.leaves(arrays_t)[0].dtype, jnp.float32)

        # local values (padded vars alias row 0)
        lvals = jax.tree.map(lambda a: a[o["local_rows"]], arrays_t)

        # ---- linearize + assemble block store + gradient ------------------
        blocks = jnp.zeros((B_max + 2, dim * dim), dtype=dt)
        g = jnp.zeros((nloc_max + 1, dim), dtype=dt)
        ai = 0
        for bi, b in enumerate(graph.batches):
            lvid = o[f"lvid_{bi}"]
            validf = o[f"valid_{bi}"]
            xs = tuple(jax.tree.map(lambda a: a[lvid[:, s]], lvals)
                       for s in range(b.keys.shape[1]))
            bb = dataclasses.replace(b, measurements=meas[bi],
                                     noise=noises[bi]) \
                if hasattr(b, "measurements") else b
            wJ, bvec = factors_mod.linearize(bb, xs, out_dtype=dt)
            m = validf.astype(dt)
            wJ = tuple(Ji * m[:, None, None] for Ji in wJ)
            bvec = bvec * m[:, None]
            dims = bb.dims()
            for s in range(bb.arity):
                gi = bb.sign * jnp.einsum("nrd,nr->nd", wJ[s], bvec)
                gi = jnp.pad(gi, ((0, 0), (0, dim - dims[s])))
                g = g.at[lvid[:, s]].add(gi)
            for s1 in range(bb.arity):
                for s2 in range(s1, bb.arity):
                    Hij = bb.sign * jnp.einsum("nri,nrj->nij",
                                               wJ[s1], wJ[s2])
                    Hij = jnp.pad(Hij, ((0, 0), (0, dim - dims[s1]),
                                        (0, dim - dims[s2])))
                    flip = o[f"asm_flip_{ai}"]
                    Hij = jnp.where(flip[:, None, None],
                                    jnp.swapaxes(Hij, 1, 2), Hij)
                    blocks = blocks.at[o[f"asm_tgt_{ai}"]].add(
                        Hij.reshape(-1, dim * dim))
                    ai += 1
        # damping: full lam on interior vars; lam/ndev on separator vars so
        # the psum of per-device separator systems carries exactly one lam
        diag_idx = np.arange(dim) * dim + np.arange(dim)
        wt = jnp.where(o["int_mask"][:nloc_max], 1.0, 1.0 / ndev)
        damp = lam * wt[:, None] * jnp.ones((nloc_max, dim), dtype=dt)
        blocks = blocks.at[o["diag_blk"][:nloc_max, None],
                           diag_idx[None, :]].add(damp)
        blocks = blocks.at[SENT].set(0.0)
        blocks = blocks.at[DUMP].set(0.0)

        # ---- interior partial elimination: ONE scan over the stacked
        # per-level plans (program size O(1) in tree depth) ------------------
        S, W, R = S_u, W_u, R_u

        def elim_level(blocks, plan):
            di, fl, dp, pi, sct = plan
            G = blocks[di].reshape(S, W, W, dim, dim)
            G = jnp.where(fl[..., None, None], jnp.swapaxes(G, -1, -2), G)
            front = G.transpose(0, 1, 3, 2, 4).reshape(S, W * dim, W * dim)
            front = front + jax.vmap(jnp.diag)(dp.astype(blocks.dtype))
            L = jnp.linalg.cholesky(front)
            L = jnp.where(jnp.isfinite(L), L, 0.0)
            Pn = blocks[pi].reshape(S, R, W, dim, dim)
            A_panel = Pn.transpose(0, 1, 3, 2, 4).reshape(S, R * dim,
                                                          W * dim)
            Xt = jax.lax.linalg.triangular_solve(
                L, jnp.swapaxes(A_panel, 1, 2), left_side=True, lower=True)
            Lp = jnp.swapaxes(Xt, 1, 2)
            Lp = jnp.where(jnp.isfinite(Lp), Lp, 0.0)
            U = jnp.einsum("sij,skj->sik", Lp, Lp)
            Ub = U.reshape(S, R, dim, R, dim).transpose(0, 1, 3, 2, 4)
            blocks = blocks.at[sct].add(-Ub.reshape(-1, dim * dim))
            blocks = blocks.at[SENT].set(0.0)
            blocks = blocks.at[DUMP].set(0.0)
            return blocks, (L, Lp)

        if L_max:
            blocks, (Ldiags, Lpanels) = jax.lax.scan(
                elim_level, blocks,
                (o["plan_diag_ids"], o["plan_diag_flip"],
                 o["plan_diag_pad"], o["plan_panel_ids"],
                 o["plan_sc_tgt"]))
        else:
            Ldiags = jnp.zeros((0, S, W * dim, W * dim), dt)
            Lpanels = jnp.zeros((0, S, R * dim, W * dim), dt)

        # ---- forward substitution over interior levels --------------------
        g_ext = jnp.concatenate([g[:nloc_max],
                                 jnp.zeros((1, dim), dtype=dt)])
        # scan carries must share the shard_map varying-axis type with the
        # body outputs (which depend on per-device data)
        acc = jax.lax.pvary(jnp.zeros((nloc_max + 1, dim), dtype=dt),
                            (axis,))

        def fwd_level(acc, xs_lev):
            cv, rv, L, Lp = xs_lev
            rhs = (g_ext - acc)[cv].reshape(S, W * dim)
            y = jax.lax.linalg.triangular_solve(
                L, rhs[..., None], left_side=True, lower=True)[..., 0]
            c = jnp.einsum("sij,sj->si", Lp, y)
            acc = acc.at[rv.reshape(-1)].add(c.reshape(S * R, dim))
            acc = acc.at[nloc_max].set(0.0)
            return acc, y

        if L_max:
            acc, ys = jax.lax.scan(
                fwd_level, acc,
                (o["plan_col_vars"], o["plan_row_vars"], Ldiags, Lpanels))
        else:
            ys = jnp.zeros((0, S, W * dim), dt)

        # ---- separator system: gather blocks + rhs, psum ------------------
        Ssz = nsep * dim
        Sg = jnp.zeros((Ssz, Ssz), dtype=dt)
        sb = blocks[o["sep_blk"]].reshape(-1, dim, dim)  # (P_max, d, d)
        si = o["sep_i"]
        sj = o["sep_j"]
        ii = (si[:, None] * dim + np.arange(dim)[None, :])
        jjj = (sj[:, None] * dim + np.arange(dim)[None, :])
        Sg = Sg.at[ii[:, :, None], jjj[:, None, :]].add(sb)
        offd = (si != sj)
        sbT = jnp.where(offd[:, None, None], jnp.swapaxes(sb, 1, 2), 0.0)
        Sg = Sg.at[jjj[:, :, None], ii[:, None, :]].add(sbT)
        # separator rhs: (g - acc) on separator vars (original local ids
        # ni_d..ni_d+nsep, uniform tail positions? no — use global sep slots)
        rhs_s_full = (g_ext - acc)
        # separator local ids are ni_d + s; gather via per-device index op
        sep_lid = o["sep_lid"]
        rhs_s = rhs_s_full[sep_lid].reshape(Ssz)
        S_sum = jax.lax.psum(Sg, axis)
        rhs_sum = jax.lax.psum(rhs_s, axis)
        dsep = jnp.linalg.solve(
            S_sum + 0.0 * jnp.eye(Ssz, dtype=dt), rhs_sum)

        # ---- backward substitution ----------------------------------------
        x = jnp.zeros((nloc_max + 1, dim), dtype=dt)
        x = x.at[sep_lid].set(dsep.reshape(nsep, dim))
        if axis not in jax.typeof(x).vma:
            x = jax.lax.pvary(x, (axis,))

        def bwd_level(x, xs_lev):
            cv, rv, L, Lp, y = xs_lev
            xr = x[rv].reshape(S, R * dim)
            rhs = y - jnp.einsum("sij,si->sj", Lp, xr)
            xs = jax.lax.linalg.triangular_solve(
                L, rhs[..., None], left_side=True, lower=True,
                transpose_a=True)[..., 0]
            x = x.at[cv.reshape(-1)].set(xs.reshape(S * W, dim))
            x = x.at[nloc_max].set(0.0)
            return x, None

        if L_max:
            x, _ = jax.lax.scan(
                bwd_level, x,
                (o["plan_col_vars"], o["plan_row_vars"], Ldiags, Lpanels,
                 ys), reverse=True)
        # zero non-interior (separator set by dsep; keep) and padding
        dint = jnp.where(o["int_mask"][:nloc_max, None],
                         x[:nloc_max], 0.0)
        return dint[None], dsep[None]

    # separator local ids per device: ni_d + arange(nsep)
    sep_lid = np.stack([ni[d] + np.arange(nsep) for d in range(ndev)])
    ops["sep_lid"] = jnp.asarray(sep_lid, dtype=np.int32)

    ops_tree = dict(ops=ops, meas=meas_ops, noise=noise_ops)
    ops_leaves, ops_treedef = jax.tree.flatten(ops_tree)

    in_specs = (P(), P()) + tuple(P(axis) for _ in ops_leaves)
    f = shard_map(device_body, mesh=mesh,
                  in_specs=in_specs,
                  out_specs=(P(axis), P(axis)))

    # global scatter maps (host)
    colmap = np.zeros((ndev, ni_max * dim), dtype=np.int64)
    colmask = np.zeros((ndev, ni_max * dim), dtype=bool)
    for d in range(ndev):
        cols, msk = [], []
        for r in st.interior[d]:
            cols.extend(range(offsets[r], offsets[r] + dim))
            msk.extend([True] * dim)
        pad = ni_max * dim - len(cols)
        cols.extend([0] * pad)
        msk.extend([False] * pad)
        colmap[d] = cols
        colmask[d] = msk
    sepcols = np.concatenate([np.arange(offsets[r], offsets[r] + dim)
                              for r in st.separator])

    def solve(arrays, lam):
        at = arrays[tname]
        dint, dsep = f(at, jnp.asarray(lam), *ops_leaves)
        delta = jnp.zeros(D, dtype=dsep.dtype)
        dint_flat = dint[:, :ni_max, :].reshape(ndev, ni_max * dim)
        for d in range(ndev):
            delta = delta.at[jnp.asarray(colmap[d])].add(
                jnp.where(jnp.asarray(colmask[d]), dint_flat[d], 0.0))
        delta = delta.at[jnp.asarray(sepcols)].set(dsep[0])
        return delta

    return solve
