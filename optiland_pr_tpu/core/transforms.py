"""Rigid-body transforms between the global frame and per-surface local frames.

The reference applies per-axis rotations sequentially to mutable ray arrays
(optiland/coordinate_system.py:73-108, rays/real_rays.py:90-131). Here each
surface's pose is an explicit (translation t, rotation R) pair computed from
differentiable parameters inside jit, applied as fused 3x3 matrix products so
XLA can vectorize over the ray axis.

Conventions (identical to the reference):
- localize:  v_local = R^T (v - t) for positions, d_local = R^T d for directions
- globalize: v = R v_local + t
- R = Rz(rz) @ Ry(ry) @ Rx(rx)  (coordinate_system.py:120-141)
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = ["rotation_matrix", "localize", "globalize", "compose_pose"]


def rotation_matrix(rx, ry, rz):
    """R = Rz @ Ry @ Rx for Euler angles in radians (reference
    coordinate_system.py:120-141)."""
    cx, sx = jnp.cos(rx), jnp.sin(rx)
    cy, sy = jnp.cos(ry), jnp.sin(ry)
    cz, sz = jnp.cos(rz), jnp.sin(rz)
    # Row-wise expansion of Rz@Ry@Rx (kept explicit: 9 scalars, no 3x3 matmuls
    # of tiny matrices in the hot path).
    r00 = cz * cy
    r01 = cz * sy * sx - sz * cx
    r02 = cz * sy * cx + sz * sx
    r10 = sz * cy
    r11 = sz * sy * sx + cz * cx
    r12 = sz * sy * cx - cz * sx
    r20 = -sy
    r21 = cy * sx
    r22 = cy * cx
    return jnp.stack([jnp.stack([r00, r01, r02]),
                      jnp.stack([r10, r11, r12]),
                      jnp.stack([r20, r21, r22])])


def localize(R, tx, ty, tz, x, y, z, L, M, N):
    """Transform positions and directions into the local frame."""
    dx, dy, dz = x - tx, y - ty, z - tz
    # v_local = R^T v
    xl = R[0, 0] * dx + R[1, 0] * dy + R[2, 0] * dz
    yl = R[0, 1] * dx + R[1, 1] * dy + R[2, 1] * dz
    zl = R[0, 2] * dx + R[1, 2] * dy + R[2, 2] * dz
    Ll = R[0, 0] * L + R[1, 0] * M + R[2, 0] * N
    Ml = R[0, 1] * L + R[1, 1] * M + R[2, 1] * N
    Nl = R[0, 2] * L + R[1, 2] * M + R[2, 2] * N
    return xl, yl, zl, Ll, Ml, Nl


def globalize(R, tx, ty, tz, x, y, z, L, M, N):
    """Transform positions and directions back to the parent/global frame."""
    xg = R[0, 0] * x + R[0, 1] * y + R[0, 2] * z + tx
    yg = R[1, 0] * x + R[1, 1] * y + R[1, 2] * z + ty
    zg = R[2, 0] * x + R[2, 1] * y + R[2, 2] * z + tz
    Lg = R[0, 0] * L + R[0, 1] * M + R[0, 2] * N
    Mg = R[1, 0] * L + R[1, 1] * M + R[1, 2] * N
    Ng = R[2, 0] * L + R[2, 1] * M + R[2, 2] * N
    return xg, yg, zg, Lg, Mg, Ng


def compose_pose(t_ref, R_ref, t_loc, R_loc):
    """Compose a local pose under a reference pose (reference
    coordinate_system.py:143-163): t = t_ref + R_ref @ t_loc, R = R_ref @ R_loc."""
    t = t_ref + R_ref @ t_loc
    return t, R_ref @ R_loc
