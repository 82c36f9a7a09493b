"""Polarization: Jones calculus on 3x3 per-ray matrices.

Rebuild of the reference's polarization stack:
- PolarizationState (optiland/rays/polarization_state.py:15)
- PolarizedRays.update / update_intensity (rays/polarized_rays.py:17-153) — the
  per-ray 3x3 matrix chain lives as the optional ``p`` leaf of the Rays pytree
  and composes via batched matmuls (MXU-friendly on TPU).
- JonesFresnel and the polarizer/retarder elements (jones.py:25-452).
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp

__all__ = ["PolarizationState", "fresnel_jones", "polarization_update_matrix",
           "apply_polarization_update", "update_intensity",
           "jones_polarizer_h", "jones_polarizer_v", "jones_polarizer_l45",
           "jones_polarizer_l135", "jones_polarizer_rcp", "jones_polarizer_lcp",
           "jones_linear_diattenuator", "jones_linear_retarder",
           "jones_quarter_wave", "jones_half_wave"]


@dataclasses.dataclass(frozen=True)
class PolarizationState:
    """Jones-vector polarization state (reference rays/polarization_state.py:15)."""
    is_polarized: bool = False
    Ex: float = 1.0
    Ey: float = 0.0
    phase_x: float = 0.0
    phase_y: float = 0.0


def fresnel_jones(n1, n2, aoi, reflect: bool):
    """Per-ray 3x3 Jones matrices from the Fresnel equations
    (reference jones.py JonesFresnel.calculate_matrix)."""
    cos_i = jnp.cos(aoi)
    n = n2 / n1
    radicand = (n**2 - jnp.sin(aoi) ** 2).astype(jnp.complex64
                                                 if cos_i.dtype == jnp.float32
                                                 else jnp.complex128)
    root = jnp.sqrt(radicand)
    if reflect:
        s = (cos_i - root) / (cos_i + root)
        p = (n**2 * cos_i - root) / (n**2 * cos_i + root)
        d = jnp.stack([s, -p, -jnp.ones_like(s)], axis=-1)
    else:
        s = 2 * cos_i / (cos_i + root)
        p = 2 * n * cos_i / (n**2 * cos_i + root)
        d = jnp.stack([s, p, jnp.ones_like(s)], axis=-1)
    eye = jnp.eye(3, dtype=d.dtype)
    return eye * d[..., None, :]  # diag per ray: [n, 3, 3]


def polarization_update_matrix(L0, M0, N0, L1, M1, N1, jones=None,
                               normal=None):
    """Surface polarization matrix p = O_out @ J @ O_in (reference
    rays/polarized_rays.py:115-153): rotate into the s/p basis of the
    interaction plane, apply the Jones matrix, rotate back out.

    ``normal``: optional (nx, ny, nz) unit surface normal. k1 always lies in
    span{k0, n}, so s ~ k0 x n is the SAME direction as the reference's
    k0 x k1 (verified to 1e-12 at f64) — but near normal incidence k0 x k1
    is a cancellation-dominated tiny vector whose f32 direction error leaks
    first-order into intensity (a non-orthonormal s loses |E| norm);
    k0 x n has no cancellation and keeps the f32 chain accurate (round-4
    polarized-kernel audit: %-level near-axis noise removed)."""
    k0 = jnp.stack([L0, M0, N0], axis=-1)
    k1 = jnp.stack([L1, M1, N1], axis=-1)

    if normal is not None:
        nvec = jnp.stack(jnp.broadcast_arrays(normal[0], normal[1],
                                              normal[2]), axis=-1)
        nvec = jnp.broadcast_to(nvec.astype(k0.dtype), k0.shape)
        s = jnp.cross(k0, nvec)
    else:
        s = jnp.cross(k0, k1)
    mag = jnp.linalg.norm(s, axis=-1)
    # Normal-incidence fallback: use the x-axis to build the basis. The
    # reference tests mag == 0 exactly (numpy); under XLA the a*b - c*d
    # cross terms fuse to FMAs, so a bit-identical k0 == k1 leaves a ~ulp
    # rounding RESIDUAL instead of 0 — normalizing that noise vector yields
    # an s/p basis that is non-orthogonal at the 1e-3 level and corrupts
    # the chain. Threshold at sub-physical deflections instead.
    eps = 1e-6 if k0.dtype == jnp.float32 else 1e-12
    fallback = jnp.cross(k0, jnp.broadcast_to(
        jnp.asarray([1.0, 0.0, 0.0], k0.dtype), k0.shape))
    use_fb = (mag < eps)[..., None]
    s = jnp.where(use_fb, fallback, s)
    mag = jnp.linalg.norm(s, axis=-1)
    s = s / mag[..., None]

    p0 = jnp.cross(k0, s)
    p1 = jnp.cross(k1, s)

    o_in = jnp.stack((s, p0, k0), axis=-2)    # rows: s, p, k
    o_out = jnp.stack((s, p1, k1), axis=-1)   # columns: s, p, k

    # precision="highest": on TPU the MXU's default matmul runs bf16 passes
    # (~3 decimal digits) — measured 1e-2..6e-2 intensity error through a
    # 12-surface chain; these are 3x3 products, full f32 costs nothing
    if jones is None:
        return jnp.matmul(o_out, o_in, precision="highest")
    o_out = o_out.astype(jones.dtype)
    o_in = o_in.astype(jones.dtype)
    return jnp.matmul(o_out, jnp.matmul(jones, o_in, precision="highest"),
                      precision="highest")


def apply_polarization_update(p_chain, L0, M0, N0, L1, M1, N1, jones=None,
                              normal=None):
    """Compose this surface's polarization matrix onto the running chain."""
    p_surf = polarization_update_matrix(L0, M0, N0, L1, M1, N1, jones,
                                        normal=normal)
    if p_chain.dtype != p_surf.dtype:
        p_chain = p_chain.astype(p_surf.dtype)
    return jnp.matmul(p_surf, p_chain, precision="highest")


def _initial_field(state: PolarizationState, L0, M0, N0, dtype):
    """3-D E-field for the launch rays (reference polarized_rays.py:153+)."""
    k = jnp.stack([L0, M0, N0], axis=-1)
    x = jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0], k.dtype), k.shape)
    p = jnp.cross(k, x)
    norms = jnp.linalg.norm(p, axis=-1)
    p = p / norms[..., None]
    s = jnp.cross(p, k)
    E = (state.Ex * jnp.exp(1j * state.phase_x) * s.astype(dtype)
         + state.Ey * jnp.exp(1j * state.phase_y) * p.astype(dtype))
    return E


def update_intensity(p_chain, state: PolarizationState | None, i0, L0, M0, N0):
    """Final intensity from the accumulated polarization chain
    (reference polarized_rays.py:68-108)."""
    cdtype = jnp.complex64 if i0.dtype == jnp.float32 else jnp.complex128
    pc = p_chain.astype(cdtype)

    def through(E):
        return jnp.einsum("...ij,...j->...i", pc, E, precision="highest")

    if state is not None and state.is_polarized:
        E1 = through(_initial_field(state, L0, M0, N0, cdtype))
        return jnp.sum(jnp.abs(E1) ** 2, axis=-1)
    sx = PolarizationState(True, 1.0, 0.0, 0.0, 0.0)
    sy = PolarizationState(True, 0.0, 1.0, 0.0, 0.0)
    E1x = through(_initial_field(sx, L0, M0, N0, cdtype))
    E1y = through(_initial_field(sy, L0, M0, N0, cdtype))
    return (jnp.sum(jnp.abs(E1x) ** 2, axis=-1)
            + jnp.sum(jnp.abs(E1y) ** 2, axis=-1)) * i0 / 2


# --- fixed Jones elements (reference jones.py polarizers/retarders) -------

def _diag3(a, b, c=1.0, dtype=jnp.complex128):
    return jnp.diag(jnp.asarray([a, b, c], dtype))


def jones_polarizer_h():
    return _diag3(1.0, 0.0)


def jones_polarizer_v():
    return _diag3(0.0, 1.0)


def _rot2_jones(m00, m01, m10, m11, dtype=jnp.complex128):
    j = jnp.zeros((3, 3), dtype)
    j = j.at[0, 0].set(m00).at[0, 1].set(m01)
    j = j.at[1, 0].set(m10).at[1, 1].set(m11)
    return j.at[2, 2].set(1.0)


def jones_polarizer_l45():
    return _rot2_jones(0.5, 0.5, 0.5, 0.5)


def jones_polarizer_l135():
    return _rot2_jones(0.5, -0.5, -0.5, 0.5)


def jones_polarizer_rcp():
    return _rot2_jones(0.5, 0.5j, -0.5j, 0.5)


def jones_polarizer_lcp():
    return _rot2_jones(0.5, -0.5j, 0.5j, 0.5)


def jones_linear_diattenuator(t_min, t_max=1.0, theta=0.0):
    """Diattenuator with amplitude transmissions t_max/t_min at angle theta
    (reference jones.py:308-364: t_min/t_max are used directly as AMPLITUDE
    coefficients, and the off-diagonal is the reference's literal
    ``t_max - t_min*cos(theta)*sin(theta)`` — reproduced quirks, not the
    textbook ``(t_max - t_min)*cos*sin`` form)."""
    c, s = jnp.cos(theta), jnp.sin(theta)
    m00 = t_max * c**2 + t_min * s**2
    m01 = t_max - t_min * c * s
    m11 = t_max * s**2 + t_min * c**2
    return _rot2_jones(m00, m01, m01, m11)


def jones_linear_retarder(retardance, theta=0.0):
    """Linear retarder with given retardance (radians) at axis angle theta."""
    c, s = jnp.cos(theta), jnp.sin(theta)
    e = jnp.exp(-1j * retardance / 2)
    ec = jnp.exp(1j * retardance / 2)
    m00 = e * c**2 + ec * s**2
    m01 = (e - ec) * c * s
    m11 = e * s**2 + ec * c**2
    return _rot2_jones(m00, m01, m01, m11)


def jones_quarter_wave(theta=0.0):
    return jones_linear_retarder(jnp.pi / 2, theta)


def jones_half_wave(theta=0.0):
    return jones_linear_retarder(jnp.pi, theta)
