"""Quaternion and rotation math.

TPU-native rotation library: pure jnp, fully batched, f32. This replaces the
reference's `isaacgym.torch_utils` quaternion helpers and the AMP rotation lib
(`/root/reference/isaacgymenvs/tasks/amp/poselib/poselib/core/rotation3d.py`).

Convention: quaternions are stored **(w, x, y, z)**, unit-norm, and represent
the rotation of a body frame into the world frame: ``rotate(q, v_body) ->
v_world``. The reference (IsaacGym) stores (x, y, z, w); use
:func:`from_xyzw` / :func:`to_xyzw` at parity boundaries.

All functions broadcast over leading batch dimensions.
"""
from __future__ import annotations

import jax.numpy as jnp


def normalize(q: jnp.ndarray, eps: float = 1e-9) -> jnp.ndarray:
    """Normalize along the last axis."""
    return q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + eps)


def identity(shape=()) -> jnp.ndarray:
    """Identity quaternion(s) with the given batch shape."""
    q = jnp.zeros(shape + (4,))
    return q.at[..., 0].set(1.0)


def from_xyzw(q: jnp.ndarray) -> jnp.ndarray:
    """Convert from IsaacGym's (x, y, z, w) layout to (w, x, y, z)."""
    return jnp.concatenate([q[..., 3:4], q[..., 0:3]], axis=-1)


def to_xyzw(q: jnp.ndarray) -> jnp.ndarray:
    """Convert to IsaacGym's (x, y, z, w) layout."""
    return jnp.concatenate([q[..., 1:4], q[..., 0:1]], axis=-1)


def mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product a ⊗ b."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def conj(q: jnp.ndarray) -> jnp.ndarray:
    """Conjugate (= inverse for unit quaternions)."""
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


inverse = conj


def rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vector(s) v by quaternion(s) q: body -> world.

    Uses the expanded form 2*(q_v x (q_v x v + w v)) + v (15 mul) instead of
    q v q* (two Hamilton products) — fewer flops, XLA fuses it into a handful
    of VPU ops.
    """
    w = q[..., 0:1]
    qv = q[..., 1:4]
    t = 2.0 * jnp.cross(qv, v)
    return v + w * t + jnp.cross(qv, t)


def rotate_inv(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vector(s) v by the inverse of q: world -> body.

    Parity with `quat_rotate_inverse` used by the reference's observation
    kernels (e.g. `tasks/gogoro_new.py:698-699`).
    """
    return rotate(conj(q), v)


def from_axis_angle(axis: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    """Quaternion for rotation of `angle` radians about unit `axis`."""
    half = 0.5 * angle
    w = jnp.cos(half)
    xyz = axis * jnp.sin(half)[..., None]
    return jnp.concatenate([w[..., None], xyz], axis=-1)


def from_euler_xyz(roll: jnp.ndarray, pitch: jnp.ndarray, yaw: jnp.ndarray) -> jnp.ndarray:
    """Intrinsic XYZ (roll-pitch-yaw) Euler angles to quaternion.

    Matches URDF `rpy` semantics (R = Rz(yaw) @ Ry(pitch) @ Rx(roll)) and the
    reference's `euler_to_quaternion` (`tasks/gogoro_new.py:496-502`).
    """
    cr, sr = jnp.cos(roll * 0.5), jnp.sin(roll * 0.5)
    cp, sp = jnp.cos(pitch * 0.5), jnp.sin(pitch * 0.5)
    cy, sy = jnp.cos(yaw * 0.5), jnp.sin(yaw * 0.5)
    w = cr * cp * cy + sr * sp * sy
    x = sr * cp * cy - cr * sp * sy
    y = cr * sp * cy + sr * cp * sy
    z = cr * cp * sy - sr * sp * cy
    return jnp.stack([w, x, y, z], axis=-1)


def to_euler_xyz(q: jnp.ndarray):
    """Quaternion to (roll, pitch, yaw), each wrapped to (-pi, pi].

    Parity with `get_euler_xyz` used at `tasks/gogoro_new.py:392,696`.
    """
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    # roll (x-axis rotation)
    sinr_cosp = 2.0 * (w * x + y * z)
    cosr_cosp = 1.0 - 2.0 * (x * x + y * y)
    roll = jnp.arctan2(sinr_cosp, cosr_cosp)
    # pitch (y-axis rotation)
    sinp = jnp.clip(2.0 * (w * y - z * x), -1.0, 1.0)
    pitch = jnp.arcsin(sinp)
    # yaw (z-axis rotation)
    siny_cosp = 2.0 * (w * z + x * y)
    cosy_cosp = 1.0 - 2.0 * (y * y + z * z)
    yaw = jnp.arctan2(siny_cosp, cosy_cosp)
    return roll, pitch, yaw


def to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion to 3x3 rotation matrix (body->world)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def from_matrix(m: jnp.ndarray) -> jnp.ndarray:
    """3x3 rotation matrix to quaternion (w,x,y,z), branch-free (Shepperd).

    Uses the max-trace-component trick with jnp.where so it jits cleanly.
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    tr = m00 + m11 + m22
    # four candidate formulations, pick the numerically best by max pivot
    qw0 = jnp.sqrt(jnp.maximum(1.0 + tr, 1e-12)) * 0.5
    q0 = jnp.stack([qw0, (m21 - m12) / (4 * qw0), (m02 - m20) / (4 * qw0), (m10 - m01) / (4 * qw0)], axis=-1)
    qx1 = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, 1e-12)) * 0.5
    q1 = jnp.stack([(m21 - m12) / (4 * qx1), qx1, (m01 + m10) / (4 * qx1), (m02 + m20) / (4 * qx1)], axis=-1)
    qy2 = jnp.sqrt(jnp.maximum(1.0 - m00 + m11 - m22, 1e-12)) * 0.5
    q2 = jnp.stack([(m02 - m20) / (4 * qy2), (m01 + m10) / (4 * qy2), qy2, (m12 + m21) / (4 * qy2)], axis=-1)
    qz3 = jnp.sqrt(jnp.maximum(1.0 - m00 - m11 + m22, 1e-12)) * 0.5
    q3 = jnp.stack([(m10 - m01) / (4 * qz3), (m02 + m20) / (4 * qz3), (m12 + m21) / (4 * qz3), qz3], axis=-1)

    cond0 = tr > 0.0
    cond1 = (m00 > m11) & (m00 > m22)
    cond2 = m11 > m22
    q = jnp.where(
        cond0[..., None], q0,
        jnp.where(cond1[..., None], q1, jnp.where(cond2[..., None], q2, q3)),
    )
    return normalize(q)


def integrate(q: jnp.ndarray, omega_world: jnp.ndarray, dt) -> jnp.ndarray:
    """Integrate orientation by angular velocity (world frame) over dt.

    First-order exponential-map update, renormalized; stable for the
    substep sizes used by the engine (<= 10 ms).
    """
    dq = jnp.concatenate([jnp.zeros_like(omega_world[..., :1]), omega_world], axis=-1)
    qn = q + 0.5 * dt * mul(dq, q)
    return normalize(qn)


def slerp(q0: jnp.ndarray, q1: jnp.ndarray, t) -> jnp.ndarray:
    """Spherical interpolation between unit quaternions (batched).

    Parity with the AMP frame-blending slerp
    (`/root/reference/isaacgymenvs/tasks/amp/utils_amp/motion_lib.py:145,150`).
    `t` broadcasts against the batch shape (last axis of q is the quat).
    Falls back to nlerp when the quats are nearly parallel.
    """
    t = jnp.asarray(t)
    if t.ndim < q0.ndim:
        t = t[..., None]
    dot = jnp.sum(q0 * q1, axis=-1, keepdims=True)
    q1 = jnp.where(dot < 0.0, -q1, q1)          # shortest arc
    dot = jnp.abs(dot)
    dot_c = jnp.clip(dot, -1.0, 1.0 - 1e-7)
    theta = jnp.arccos(dot_c)
    sin_theta = jnp.sin(theta)
    w0 = jnp.sin((1.0 - t) * theta) / sin_theta
    w1 = jnp.sin(t * theta) / sin_theta
    # nlerp branch for nearly-parallel quats (theta ~ 0)
    close = dot > 1.0 - 1e-6
    w0 = jnp.where(close, 1.0 - t, w0)
    w1 = jnp.where(close, t, w1)
    return normalize(w0 * q0 + w1 * q1)


def to_tan_norm(q: jnp.ndarray) -> jnp.ndarray:
    """6-D rotation feature: world images of the body x (tangent) and z
    (normal) axes. Parity with `quat_to_tan_norm`
    (`/root/reference/isaacgymenvs/tasks/amp/utils_amp/amp_torch_utils.py:88`)."""
    tan = rotate(q, jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), q.shape[:-1] + (3,)))
    norm = rotate(q, jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), q.shape[:-1] + (3,)))
    return jnp.concatenate([tan, norm], axis=-1)


def heading(q: jnp.ndarray) -> jnp.ndarray:
    """Yaw heading angle of the body x-axis projected to the ground plane."""
    dir_w = rotate(q, jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), q.shape[:-1] + (3,)))
    return jnp.arctan2(dir_w[..., 1], dir_w[..., 0])


def heading_quat_inv(q: jnp.ndarray) -> jnp.ndarray:
    """Pure-z rotation removing the heading: parity with
    `calc_heading_quat_inv`
    (`/root/reference/isaacgymenvs/tasks/amp/utils_amp/amp_torch_utils.py:196`)."""
    h = heading(q)
    axis = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), q.shape[:-1] + (3,))
    return from_axis_angle(axis, -h)


def wrap_to_pi(angle: jnp.ndarray) -> jnp.ndarray:
    """Wrap angle(s) to (-pi, pi]. Parity: `tasks/gogoro_new.py:805-809`."""
    return jnp.mod(angle + jnp.pi, 2.0 * jnp.pi) - jnp.pi


def shortest_angle_distance(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Signed shortest angular distance from a to b.

    Parity: `tasks/gogoro_new.py:687-689`.
    """
    return jnp.mod(b - a + jnp.pi, 2.0 * jnp.pi) - jnp.pi
