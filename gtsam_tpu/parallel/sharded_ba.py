"""Multi-chip distributed bundle adjustment (SURVEY.md §2.8 P5 analog).

Sharding design (round 1): tracks (landmarks) are partitioned across the mesh
so every track's observations live on one device — landmark elimination and the
per-pair Schur outer products are then purely local; the reduced camera system
(dense 9M x 9M) and camera gradient are combined with one psum over ICI, and the
dense factorize/solve runs replicated.  Back-substitution of landmark deltas is
local again.  This replaces the reference's intra-process TBB task tree with
mesh parallelism; the separator here is the camera block, allreduced, exactly
the 'reduced camera system over ICI' blueprint in SURVEY.md §5.8.
"""

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P


@dataclasses.dataclass(frozen=True)
class ShardedSchurStructure:
    """Per-device padded structure: leading axis = device."""

    obs_cam: np.ndarray    # (ndev, Kd)
    obs_pt_local: np.ndarray   # (ndev, Kd) local point ids
    obs_valid: np.ndarray  # (ndev, Kd) bool — padding mask
    pair_a: np.ndarray     # (ndev, Pd)
    pair_b: np.ndarray     # (ndev, Pd)
    pair_valid: np.ndarray  # (ndev, Pd)
    point_offset: np.ndarray  # (ndev,) global id of local point 0
    num_cameras: int
    num_points_local: int  # padded per-device point count
    obs_order: np.ndarray  # (K,) permutation: global sorted-by-point order

    @staticmethod
    def build(obs_cam, obs_pt, num_cameras, num_points, ndev):
        order = np.argsort(obs_pt, kind="stable")
        oc, op = obs_cam[order], obs_pt[order]
        K = len(oc)
        # contiguous point ranges per device, balanced by observation count
        n_loc = -(-num_points // ndev)
        bounds = [np.searchsorted(op, d * n_loc) for d in range(ndev + 1)]
        counts = [bounds[d + 1] - bounds[d] for d in range(ndev)]
        Kd = max(max(counts), 1)
        obs_cam_s = np.zeros((ndev, Kd), dtype=np.int32)
        obs_pt_s = np.zeros((ndev, Kd), dtype=np.int32)
        obs_val = np.zeros((ndev, Kd), dtype=bool)
        pas, pbs = [], []
        for d in range(ndev):
            s, e = bounds[d], bounds[d + 1]
            c = e - s
            obs_cam_s[d, :c] = oc[s:e]
            obs_pt_s[d, :c] = op[s:e] - d * n_loc
            obs_val[d, :c] = True
            pa, pb = [], []
            i = s
            while i < e:
                j = i
                while j < e and op[j] == op[i]:
                    j += 1
                for a in range(i - s, j - s):
                    for b in range(a, j - s):
                        pa.append(a)
                        pb.append(b)
                i = j
            pas.append(np.asarray(pa, dtype=np.int32))
            pbs.append(np.asarray(pb, dtype=np.int32))
        Pd = max(max(len(p) for p in pas), 1)
        pair_a = np.zeros((ndev, Pd), dtype=np.int32)
        pair_b = np.zeros((ndev, Pd), dtype=np.int32)
        pair_val = np.zeros((ndev, Pd), dtype=bool)
        for d in range(ndev):
            n = len(pas[d])
            pair_a[d, :n] = pas[d]
            pair_b[d, :n] = pbs[d]
            pair_val[d, :n] = True
        return ShardedSchurStructure(
            obs_cam_s, obs_pt_s, obs_val, pair_a, pair_b, pair_val,
            np.arange(ndev, dtype=np.int32) * n_loc,
            num_cameras, n_loc, order)

    def scatter_obs(self, arr_sorted):
        """(K, ...) sorted-by-point array -> (ndev, Kd, ...) padded."""
        ndev, Kd = self.obs_cam.shape
        out = np.zeros((ndev, Kd) + arr_sorted.shape[1:], dtype=arr_sorted.dtype)
        k = 0
        for d in range(ndev):
            c = int(self.obs_valid[d].sum())
            out[d, :c] = arr_sorted[k:k + c]
            k += c
        return out


def _local_schur(st: ShardedSchurStructure, A_cam, A_pt, b, lam, axis="tracks"):
    """Per-device body (inside shard_map): local elimination + psum'd solve.

    A_cam: (1, Kd, 2, 9) local shard (leading device axis of size 1 inside).
    Returns (dc replicated (M, 9), dl local (1, n_loc, 3)).
    """
    d = jax.lax.axis_index(axis)
    A_cam, A_pt, b = A_cam[0], A_pt[0], b[0]
    seg_pt = jnp.asarray(st.obs_pt_local)[d]
    seg_cam = jnp.asarray(st.obs_cam)[d]
    valid = jnp.asarray(st.obs_valid)[d]
    pa = jnp.asarray(st.pair_a)[d]
    pb = jnp.asarray(st.pair_b)[d]
    pval = jnp.asarray(st.pair_valid)[d]
    M, NL = st.num_cameras, st.num_points_local
    dt = A_cam.dtype

    A_cam = A_cam * valid[:, None, None]
    A_pt = A_pt * valid[:, None, None]
    b = b * valid[:, None]

    Hll = jax.ops.segment_sum(jnp.einsum("kri,krj->kij", A_pt, A_pt), seg_pt, NL)
    gl = jax.ops.segment_sum(jnp.einsum("kri,kr->ki", A_pt, b), seg_pt, NL)
    Hpp = jax.ops.segment_sum(jnp.einsum("kri,krj->kij", A_cam, A_cam), seg_cam, M)
    gp = jax.ops.segment_sum(jnp.einsum("kri,kr->ki", A_cam, b), seg_cam, M)
    W = jnp.einsum("kri,krj->kij", A_cam, A_pt)
    C = jnp.linalg.inv(Hll + lam * jnp.eye(3, dtype=dt))

    Cg = jnp.einsum("nij,nj->ni", C, gl)
    corr = jnp.einsum("kij,kj->ki", W, Cg[seg_pt])
    gp_part = gp - jax.ops.segment_sum(corr, seg_cam, M)

    WC = jnp.einsum("kij,kjl->kil", W, C[seg_pt])
    blocks = jnp.einsum("pij,plj->pil", WC[pa], W[pb]) * pval[:, None, None]
    ca, cb = seg_cam[pa], seg_cam[pb]
    D = 9 * M
    # flat (M*M, 81) scatter layout (see sfm/ba.py: avoids 9x9-tile padding)
    Sflat = jnp.zeros((M * M, 81), dtype=dt)
    Sflat = Sflat.at[ca * M + cb].add(-blocks.reshape(-1, 81))
    off = ((pa != pb) & pval)[:, None]
    Sflat = Sflat.at[cb * M + ca].add(
        -jnp.swapaxes(blocks, 1, 2).reshape(-1, 81) * off)
    diag_idx = jnp.arange(M, dtype=jnp.int32)
    Sflat = Sflat.at[diag_idx * M + diag_idx].add(Hpp.reshape(-1, 81))
    S = jnp.transpose(Sflat.reshape(M, M, 9, 9), (0, 2, 1, 3)).reshape(D, D)

    # combine the reduced camera system over the mesh (ICI)
    S = jax.lax.psum(S, axis)
    gp_t = jax.lax.psum(gp_part, axis)
    S = S + lam * jnp.eye(D, dtype=dt)

    L = jnp.linalg.cholesky(S)
    dc = jax.scipy.linalg.cho_solve((L, True), gp_t.reshape(-1)).reshape(M, 9)

    Wt_dc = jnp.einsum("kij,ki->kj", W, dc[seg_cam])
    rhs_l = gl - jax.ops.segment_sum(Wt_dc, seg_pt, NL)
    dl = jnp.einsum("nij,nj->ni", C, rhs_l)
    return dc, dl[None]


def make_sharded_solver(mesh: Mesh, st: ShardedSchurStructure, axis="tracks"):
    """Returns jitted solve(A_cam, A_pt, b, lam) over device-sharded inputs."""
    spec_obs = P(axis)

    body = partial(_local_schur, st, axis=axis)
    solver = jax.shard_map(
        body, mesh=mesh,
        in_specs=(spec_obs, spec_obs, spec_obs, P()),
        out_specs=(P(), P(axis)),
    )
    return jax.jit(solver)
