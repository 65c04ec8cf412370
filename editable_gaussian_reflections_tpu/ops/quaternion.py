"""Quaternion utilities (Hamilton, scalar-first: q = (r, x, y, z)).

Matches the reference's conventions in
editable_gauss_refl/cuda/csrc/optix/bvh_wrapper.cu:9-31 (create_transform_matrix)
and editable_gauss_refl/utils/general_utils.py (build_rotation).
"""

from __future__ import annotations

import jax.numpy as jnp


def normalize(q, eps=0.0):
    return q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + eps)


def quat_to_rotmat(q):
    """(..., 4) normalized quaternion -> (..., 3, 3) rotation matrix.

    Row/column layout matches create_transform_matrix exactly: columns are the
    images of the local basis vectors, i.e. world = R @ local.
    """
    r, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    row0 = jnp.stack(
        [1.0 - 2.0 * (y * y + z * z), 2.0 * (x * y - r * z), 2.0 * (x * z + r * y)],
        axis=-1,
    )
    row1 = jnp.stack(
        [2.0 * (x * y + r * z), 1.0 - 2.0 * (x * x + z * z), 2.0 * (y * z - r * x)],
        axis=-1,
    )
    row2 = jnp.stack(
        [2.0 * (x * z - r * y), 2.0 * (y * z + r * x), 1.0 - 2.0 * (x * x + y * y)],
        axis=-1,
    )
    return jnp.stack([row0, row1, row2], axis=-2)


def quat_multiply(a, b):
    """Hamilton product a*b, scalar-first."""
    ar, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    br, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            ar * br - ax * bx - ay * by - az * bz,
            ar * bx + ax * br + ay * bz - az * by,
            ar * by - ax * bz + ay * br + az * bx,
            ar * bz + ax * by - ay * bx + az * br,
        ],
        axis=-1,
    )


def rotmat_to_quat(R):
    """(..., 3, 3) -> (..., 4) scalar-first quaternion (Shepperd's method)."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    def case0():
        s = jnp.sqrt(jnp.maximum(tr + 1.0, 1e-12)) * 2.0
        return jnp.stack(
            [0.25 * s, (m21 - m12) / s, (m02 - m20) / s, (m10 - m01) / s], axis=-1
        )

    def case1():
        s = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, 1e-12)) * 2.0
        return jnp.stack(
            [(m21 - m12) / s, 0.25 * s, (m01 + m10) / s, (m02 + m20) / s], axis=-1
        )

    def case2():
        s = jnp.sqrt(jnp.maximum(1.0 + m11 - m00 - m22, 1e-12)) * 2.0
        return jnp.stack(
            [(m02 - m20) / s, (m01 + m10) / s, 0.25 * s, (m12 + m21) / s], axis=-1
        )

    def case3():
        s = jnp.sqrt(jnp.maximum(1.0 + m22 - m00 - m11, 1e-12)) * 2.0
        return jnp.stack(
            [(m10 - m01) / s, (m02 + m20) / s, (m12 + m21) / s, 0.25 * s], axis=-1
        )

    q = jnp.where(
        (tr > 0.0)[..., None],
        case0(),
        jnp.where(
            jnp.logical_and(m00 >= m11, m00 >= m22)[..., None],
            case1(),
            jnp.where((m11 >= m22)[..., None], case2(), case3()),
        ),
    )
    return normalize(q)
