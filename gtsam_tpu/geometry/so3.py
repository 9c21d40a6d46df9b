"""SO(3) as batched 3x3 rotation matrices — functional, vmap/jit-ready, AD-safe.

All functions broadcast over leading batch dimensions.  Tangent vectors are
axis-angle 3-vectors (GTSAM convention, reference gtsam/geometry/SO3.h:53-87).
Small-angle branches use the double-`where` pattern so that both values and
gradients are NaN-free at theta == 0.
"""

import jax.numpy as jnp

_SMALL = 1e-10  # threshold on theta^2; Taylor error ~ theta^6 << f64 eps


def _small2(theta2):
    """Dtype-aware small-angle threshold on theta^2.

    1-cos(t) and t-sin(t) cancel catastrophically near eps of the dtype: in
    f32, cos(2e-5) rounds to 1.0 exactly, so (1-cos t)/t^2 = 0 instead of 0.5
    and V^-1's (1 - A/2B)/t^2 becomes inf/NaN (hit on sphere2500 when a pose
    lands ~1e-5 from its prior).  Switch to the Taylor branch while the
    truncation error (~t^4/720) is still far below dtype eps."""
    return _SMALL if jnp.asarray(theta2).dtype == jnp.float64 else 1e-3


def _taylor_coeffs(theta2):
    """A = sin(t)/t, B = (1-cos t)/t^2, C = (t - sin t)/t^3, all AD-safe.

    Returns (A, B, C) broadcast like theta2.
    """
    small = theta2 < _small2(theta2)
    safe = jnp.where(small, 1.0, theta2)
    theta = jnp.sqrt(safe)
    sin_t, cos_t = jnp.sin(theta), jnp.cos(theta)
    A = jnp.where(small, 1.0 - theta2 / 6.0, sin_t / theta)
    B = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - cos_t) / safe)
    C = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0, (theta - sin_t) / (safe * theta))
    return A, B, C


def hat(w):
    """(...,3) -> (...,3,3) skew-symmetric matrix."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy], axis=-1),
            jnp.stack([wz, z, -wx], axis=-1),
            jnp.stack([-wy, wx, z], axis=-1),
        ],
        axis=-2,
    )


def vee(W):
    """(...,3,3) skew -> (...,3)."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


def expmap(w):
    """Rodrigues' formula: exp(hat(w)). (...,3) -> (...,3,3)."""
    theta2 = jnp.sum(w * w, axis=-1)
    A, B, _ = _taylor_coeffs(theta2)
    W = hat(w)
    W2 = W @ W
    I = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return I + A[..., None, None] * W + B[..., None, None] * W2


def to_quaternion(R):
    """Rotation matrix -> unit quaternion (w, x, y, z), Shepperd's method.

    Branch-free (4-way `where`), safe for all rotations including theta = pi.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidate 4*q*q_i parameterizations; pick the numerically largest pivot.
    # case 0: pivot w; case 1: pivot x; case 2: pivot y; case 3: pivot z
    def q_from(pivot2, a, b, c, d):
        s = jnp.sqrt(jnp.maximum(pivot2, 1e-30)) * 2.0  # 4*pivot
        return jnp.stack([a / s, b / s, c / s, d / s], axis=-1)

    one = jnp.ones_like(tr)
    q0 = q_from(1.0 + tr, (1.0 + tr) * one, m21 - m12, m02 - m20, m10 - m01)
    q1 = q_from(1.0 + m00 - m11 - m22, m21 - m12, (1.0 + m00 - m11 - m22) * one,
                m01 + m10, m02 + m20)
    q2 = q_from(1.0 - m00 + m11 - m22, m02 - m20, m01 + m10,
                (1.0 - m00 + m11 - m22) * one, m12 + m21)
    q3 = q_from(1.0 - m00 - m11 + m22, m10 - m01, m02 + m20, m12 + m21,
                (1.0 - m00 - m11 + m22) * one)

    cond0 = tr > 0.0
    cond1 = (m00 > m11) & (m00 > m22)
    cond2 = m11 > m22
    q = jnp.where(
        cond0[..., None], q0,
        jnp.where(cond1[..., None], q1, jnp.where(cond2[..., None], q2, q3)),
    )
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def logmap(R):
    """(...,3,3) -> (...,3) axis-angle.  Robust via quaternion (stable at pi)."""
    q = to_quaternion(R)
    qw = q[..., 0]
    qv = q[..., 1:]
    # enforce w >= 0 so theta in [0, pi]
    sign = jnp.where(qw < 0.0, -1.0, 1.0)
    qw = qw * sign
    qv = qv * sign[..., None]
    nv2 = jnp.sum(qv * qv, axis=-1)
    small = nv2 < _SMALL
    nv = jnp.sqrt(jnp.where(small, 1.0, nv2))
    theta = 2.0 * jnp.arctan2(nv, qw)
    # w = theta * qv / nv ; small angle: theta/nv -> 2/qw * (1 + nv2/(3 qw^2))
    scale = jnp.where(small, 2.0 / jnp.maximum(qw, 1e-30) * (1.0 + nv2 / 3.0),
                      theta / nv)
    return qv * scale[..., None]


def inverse(R):
    return jnp.swapaxes(R, -1, -2)


def compose(R1, R2):
    return R1 @ R2


def between(R1, R2):
    """R1^{-1} R2."""
    return inverse(R1) @ R2


def rotate(R, p):
    """Apply rotation to points: (...,3,3),(...,3)->(...,3)."""
    return jnp.einsum("...ij,...j->...i", R, p)


def unrotate(R, p):
    return jnp.einsum("...ji,...j->...i", R, p)


def right_jacobian(w):
    """J_r(w): d/d(dw) Log(Exp(w)^{-1} Exp(w + dw)) at dw=0.

    J_r = I - B*W + C*W^2 (reference SO3.h:74 ExpmapDerivative is J_r as well).
    """
    theta2 = jnp.sum(w * w, axis=-1)
    _, B, C = _taylor_coeffs(theta2)
    W = hat(w)
    W2 = W @ W
    I = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return I - B[..., None, None] * W + C[..., None, None] * W2


def left_jacobian(w):
    """J_l = J_r(-w) = I + B*W + C*W^2; also the 'V' matrix of SE(3) Expmap."""
    theta2 = jnp.sum(w * w, axis=-1)
    _, B, C = _taylor_coeffs(theta2)
    W = hat(w)
    W2 = W @ W
    I = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return I + B[..., None, None] * W + C[..., None, None] * W2


def left_jacobian_inverse(w):
    """V^{-1} = I - W/2 + E * W^2 with E = (1 - A/(2B)) / theta^2 (AD-safe)."""
    theta2 = jnp.sum(w * w, axis=-1)
    A, B, _ = _taylor_coeffs(theta2)
    small = theta2 < _small2(theta2)
    safe = jnp.where(small, 1.0, theta2)
    E = jnp.where(small, 1.0 / 12.0 + theta2 / 720.0, (1.0 - 0.5 * A / B) / safe)
    W = hat(w)
    W2 = W @ W
    I = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return I - 0.5 * W + E[..., None, None] * W2


def retract(R, w):
    """Right retraction: R * Exp(w) (GTSAM default, Rot3 Expmap retract)."""
    return R @ expmap(w)


def local(R1, R2):
    """Inverse retraction: Log(R1^{-1} R2)."""
    return logmap(between(R1, R2))


def identity(dtype=jnp.float64):
    return jnp.eye(3, dtype=dtype)


def rx(t):
    c, s = jnp.cos(t), jnp.sin(t)
    z, o = jnp.zeros_like(t), jnp.ones_like(t)
    return jnp.stack([
        jnp.stack([o, z, z], -1),
        jnp.stack([z, c, -s], -1),
        jnp.stack([z, s, c], -1),
    ], -2)


def ry(t):
    c, s = jnp.cos(t), jnp.sin(t)
    z, o = jnp.zeros_like(t), jnp.ones_like(t)
    return jnp.stack([
        jnp.stack([c, z, s], -1),
        jnp.stack([z, o, z], -1),
        jnp.stack([-s, z, c], -1),
    ], -2)


def rz(t):
    c, s = jnp.cos(t), jnp.sin(t)
    z, o = jnp.zeros_like(t), jnp.ones_like(t)
    return jnp.stack([
        jnp.stack([c, -s, z], -1),
        jnp.stack([s, c, z], -1),
        jnp.stack([z, z, o], -1),
    ], -2)


def ypr(yaw, pitch, roll):
    """Rz(yaw) @ Ry(pitch) @ Rx(roll) — reference Rot3::Ypr (dataset EDGE3 parsing)."""
    return rz(yaw) @ ry(pitch) @ rx(roll)


def from_quaternion(q):
    """(w,x,y,z) unit quaternion -> rotation matrix."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack([
        jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1),
        jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1),
        jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1),
    ], -2)
