"""Fused Pallas trace kernel for conic surface stacks.

The XLA path executes the unrolled surface chain as fused elementwise ops, but
intermediate ray state still round-trips HBM between fusion boundaries. This
kernel keeps the ENTIRE surface stack's ray state in VMEM: the grid tiles the
ray axis; each tile loads launch state once, loops over all surfaces in
registers/VMEM, and writes final state once (SURVEY.md §7 stage 7).

Scope: homogeneous conic + even-asphere stacks (refract/reflect) with
per-surface scalar refractive indices — single-wavelength traces of systems
like the Cooke triplet / double Gauss / aspheric-singlet benchmarks. Aspheres
intersect in-kernel: conic warm start + _NEWTON_ITERS fixed Newton steps
(value path only; gradients use the XLA trace with implicit-diff Newton).
The general path (freeforms, gratings, polarization) stays on XLA.

Surface constants are packed into a [S, 8] array: the kernel receives it whole
in VMEM and reads scalars per (statically unrolled) surface:
  [radius_inv, conic, pos_z, n1, n2, is_plane, is_reflective, alpha_abs]
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..system.model import OpticModel, positions_from_params

__all__ = ["pack_surface_constants", "pack_asphere_coeffs",
           "pallas_trace_conic", "pallas_gen_trace_conic",
           "supports_model", "model_flags"]

_EPS = 1e-14


_NEWTON_ITERS = 8  # fixed in-kernel Newton refinements for aspheres


def supports_model(model: OpticModel) -> bool:
    """True if every inner surface is a conic or even-asphere refract/reflect
    surface without apertures/coatings/BSDFs (the fast-path contract)."""
    for spec in model.surfaces[1:]:
        if spec.geometry.kind not in ("standard", "plane", "even_asphere"):
            return False
        if spec.interaction != "refract_reflect":
            return False
        if spec.aperture is not None or spec.coating is not None \
                or spec.bsdf is not None:
            return False
    return model.polarization == "ignore"


def pack_surface_constants(model: OpticModel, params, wavelength) -> jnp.ndarray:
    """[S, 8] per-surface scalars for the kernel (positions, curvature, conic,
    indices, absorption)."""
    pos = positions_from_params(params)
    rows = []
    S = model.num_surfaces
    for k in range(1, S):
        spec = model.surfaces[k]
        sp = params["surfaces"][k]
        radius = sp["geom"].get("radius", jnp.asarray(jnp.inf))
        conic = sp["geom"].get("conic", jnp.asarray(0.0))
        is_plane = jnp.isinf(radius)
        radius_inv = jnp.where(is_plane, 0.0, 1.0 / radius)

        pre = model.surfaces[k - 1]
        mat1 = model.surfaces[pre.material_src].material
        mp1 = params["surfaces"][pre.material_src]["material"]
        n1 = mat1.n(mp1, jnp.asarray(wavelength))
        if spec.is_reflective:
            n2 = n1
        else:
            mat2 = model.surfaces[spec.material_src].material
            mp2 = params["surfaces"][spec.material_src]["material"]
            n2 = mat2.n(mp2, jnp.asarray(wavelength))
        alpha = jnp.asarray(0.0)
        if mat1.absorbing:
            kext = mat1.k(mp1, jnp.asarray(wavelength))
            alpha = 4.0 * jnp.pi * kext / jnp.asarray(wavelength)
        rows.append(jnp.stack([
            jnp.reshape(radius_inv, ()), jnp.reshape(conic, ()),
            jnp.reshape(pos[k], ()), jnp.reshape(n1, ()),
            jnp.reshape(n2, ()), jnp.reshape(is_plane.astype(radius.dtype), ()),
            jnp.asarray(1.0 if spec.is_reflective else 0.0, radius.dtype),
            jnp.reshape(alpha, ()),
        ]))
    return jnp.stack(rows).astype(jnp.float32)


def pack_asphere_coeffs(model: OpticModel, params) -> jnp.ndarray:
    """[S-1, Cmax] even-asphere coefficients, zero-padded; a [S-1, 8]-aligned
    dummy when the system is all-conic (Pallas wants a real operand)."""
    cmax = 1
    for spec in model.surfaces[1:]:
        if spec.geometry.kind == "even_asphere":
            cmax = max(cmax, spec.geometry.num_terms)
    cmax = max(8, ((cmax + 7) // 8) * 8)  # lane-friendly width
    rows = []
    for k in range(1, model.num_surfaces):
        spec = model.surfaces[k]
        row = jnp.zeros((cmax,), jnp.float32)
        if spec.geometry.kind == "even_asphere" and spec.geometry.num_terms:
            c = jnp.asarray(params["surfaces"][k]["geom"]["coefficients"],
                            jnp.float32)
            row = row.at[:c.shape[0]].set(c)
        rows.append(row)
    return jnp.stack(rows)


def _asphere_sag_grad(radius_inv, conic, acoef, n_terms: int, xx, yy):
    """Even-asphere sag + gradient (geometry/aspheres.py EvenAsphere):
    z = r^2 ci / (1 + sqrt(1-(1+k) ci^2 r^2)) + sum C_i r^(2(i+1))."""
    r2 = xx * xx + yy * yy
    arg = 1.0 - (1.0 + conic) * radius_inv * radius_inv * r2
    argc = jnp.where(arg > _EPS, arg, _EPS)
    sq = jnp.sqrt(argc)
    s = r2 * radius_inv / (1.0 + sq)
    inv_sq = 1.0 / sq
    gx = xx * radius_inv * inv_sq
    gy = yy * radius_inv * inv_sq
    term = r2
    gterm = jnp.ones_like(r2)
    for i in range(n_terms):
        ci = acoef[i]
        s = s + ci * term
        kk = 2.0 * (i + 1)
        gx = gx + kk * xx * ci * gterm
        gy = gy + kk * yy * ci * gterm
        term = term * r2
        gterm = gterm * r2
    return s, gx, gy


def _surface_step(c, x, y, z, L, M, N, inten, opd, *, is_plane: bool,
                  is_refl: bool, absorbing: bool, acoef=None,
                  n_terms: int = 0):
    """One conic surface interaction; all elementwise VPU ops.

    is_plane/is_refl/absorbing are STATIC (baked from the model at build):
    the unrolled loop emits only the ops each surface actually needs.

    Op-count notes (this kernel is VPU-compute-bound, not HBM-bound):
    - reflection R = d - 2(d.n)n is invariant under n -> -n, so the
      normal-alignment pass (sign + 3 muls) is skipped entirely;
    - refraction folds the alignment sign into a single multiply:
      with s = sign(d.n), w = s*sqrt(disc) - u*(d.n) reproduces the
      aligned-normal update u*d + n*w exactly;
    - the quadratic uses the half-b form (disc/4), saving the 2x/4x scales;
    - normals use one rsqrt instead of sqrt + guarded reciprocal.
    """
    radius_inv, conic, pos_z, n1, n2, _, _, alpha = (
        c[0], c[1], c[2], c[3], c[4], c[5], c[6], c[7])

    z = z - pos_z

    # ---- intersection (reference geometries/standard.py:89-140, with the
    # curvature form: multiply through by radius_inv to avoid inf radius) ----
    if is_plane:
        t = -z / N
    else:
        a = (conic * N * N + 1.0) * radius_inv
        bh = (conic * N * z + L * x + M * y + N * z) * radius_inv - N
        cc = (conic * z * z + x * x + y * y + z * z) * radius_inv - 2.0 * z
        disc = bh * bh - a * cc
        ok = disc >= 0
        sq = jnp.sqrt(jnp.where(ok, disc, 1.0))
        inv_a = 1.0 / jnp.where(jnp.abs(a) > _EPS, a, _EPS)
        t1 = (sq - bh) * inv_a
        t2 = (-sq - bh) * inv_a
        z1 = z + t1 * N
        z2 = z + t2 * N
        t = jnp.where(jnp.abs(z1) <= jnp.abs(z2), t1, t2)
        t = jnp.where(ok, t, jnp.nan)

    if n_terms > 0:
        # ---- even asphere: conic warm start + fixed Newton refinement
        # (geometry/base.py newton_distance, statically unrolled) ----------
        for _ in range(_NEWTON_ITERS):
            xx = x + t * L
            yy = y + t * M
            zz = z + t * N
            s, gx, gy = _asphere_sag_grad(radius_inv, conic, acoef,
                                          n_terms, xx, yy)
            f = s - zz
            dfdt = gx * L + gy * M - N
            dfdt = jnp.where(jnp.abs(dfdt) > _EPS, dfdt,
                             jnp.where(dfdt >= 0, _EPS, -_EPS))
            t = t - f / dfdt

    # ---- propagate + OPD + absorption -----------------------------------
    x = x + t * L
    y = y + t * M
    z = z + t * N
    opd = opd + jnp.abs(t * n1)
    if absorbing:
        inten = inten * jnp.exp(-alpha * t * 1e3)

    if n_terms > 0:
        # ---- asphere normal + refract/reflect -----------------------------
        _, gx, gy = _asphere_sag_grad(radius_inv, conic, acoef, n_terms, x, y)
        inv_mag = jax.lax.rsqrt(gx * gx + gy * gy + 1.0)
        nx = gx * inv_mag
        ny = gy * inv_mag
        nz = -inv_mag
        dot = L * nx + M * ny + N * nz
        if is_refl:
            two_dot = 2.0 * dot
            L = L - two_dot * nx
            M = M - two_dot * ny
            N = N - two_dot * nz
        else:
            u = n1 / n2
            disc_r = 1.0 - u * u * (1.0 - dot * dot)
            ok_r = disc_r >= 0
            root_r = jnp.where(ok_r, jnp.sqrt(jnp.where(ok_r, disc_r, 1.0)),
                               jnp.nan)
            w = jnp.sign(dot) * root_r - u * dot
            L = u * L + nx * w
            M = u * M + ny * w
            N = u * N + nz * w
    elif is_plane and is_refl:
        # flat mirror, normal (0, 0, -1): d -> d - 2(d.n)n flips N only
        N = -N
    elif is_plane:
        # flat interface: Snell with normal (0, 0, 1)
        u = n1 / n2
        disc_r = 1.0 - u * u * (1.0 - N * N)
        ok_r = disc_r >= 0
        root_r = jnp.where(ok_r, jnp.sqrt(jnp.where(ok_r, disc_r, 1.0)),
                           jnp.nan)
        L = u * L
        M = u * M
        N = jnp.sign(N) * root_r
    else:
        # ---- normal (dfdx = x * ci / sqrt(1-(1+k) ci^2 r^2)) -------------
        r2 = x * x + y * y
        arg = 1.0 - (1.0 + conic) * radius_inv * radius_inv * r2
        inv_root = jax.lax.rsqrt(jnp.where(arg > _EPS, arg, 1.0))
        dfdx = x * radius_inv * inv_root
        dfdy = y * radius_inv * inv_root
        inv_mag = jax.lax.rsqrt(dfdx * dfdx + dfdy * dfdy + 1.0)
        nx = dfdx * inv_mag
        ny = dfdy * inv_mag
        nz = -inv_mag

        # ---- refract/reflect, alignment-free (rays/real_rays.py:141-181)
        dot = L * nx + M * ny + N * nz
        if is_refl:
            two_dot = 2.0 * dot
            L = L - two_dot * nx
            M = M - two_dot * ny
            N = N - two_dot * nz
        else:
            u = n1 / n2
            disc_r = 1.0 - u * u * (1.0 - dot * dot)
            ok_r = disc_r >= 0
            root_r = jnp.where(ok_r, jnp.sqrt(jnp.where(ok_r, disc_r, 1.0)),
                               jnp.nan)
            w = jnp.sign(dot) * root_r - u * dot
            L = u * L + nx * w
            M = u * M + ny * w
            N = u * N + nz * w

    z = z + pos_z
    return x, y, z, L, M, N, inten, opd


def _kernel(consts_ref, acoef_ref, x_ref, y_ref, z_ref, l_ref, m_ref, n_ref,
            i_ref, o_ref, xo, yo, zo, lo, mo, no, io, oo, *, flags: tuple):
    x = x_ref[:]
    y = y_ref[:]
    z = z_ref[:]
    L = l_ref[:]
    M = m_ref[:]
    N = n_ref[:]
    inten = i_ref[:]
    opd = o_ref[:]
    for k, (is_plane, is_refl, absorbing, n_terms) in enumerate(flags):
        c = consts_ref[k, :]
        a = acoef_ref[k, :]
        x, y, z, L, M, N, inten, opd = _surface_step(
            c, x, y, z, L, M, N, inten, opd, is_plane=is_plane,
            is_refl=is_refl, absorbing=absorbing, acoef=a, n_terms=n_terms)
    xo[:] = x
    yo[:] = y
    zo[:] = z
    lo[:] = L
    mo[:] = M
    no[:] = N
    io[:] = inten
    oo[:] = opd


def model_flags(model: OpticModel, params) -> tuple:
    """Static per-surface (is_plane, is_reflective, absorbing, n_terms)
    flags (n_terms > 0 selects the in-kernel asphere Newton path)."""
    import numpy as np
    flags = []
    for k in range(1, model.num_surfaces):
        spec = model.surfaces[k]
        sp = params["surfaces"][k]
        is_plane = bool(np.isinf(np.asarray(sp["geom"].get("radius",
                                                           np.inf))))
        pre = model.surfaces[k - 1]
        absorbing = model.surfaces[pre.material_src].material.absorbing
        n_terms = (spec.geometry.num_terms
                   if spec.geometry.kind == "even_asphere" else 0)
        flags.append((is_plane, spec.is_reflective, absorbing, n_terms))
    return tuple(flags)


@functools.partial(jax.jit, static_argnames=("flags", "block_rows"))
def _pallas_call_2d(consts, acoef, x, y, z, L, M, N, inten, opd,
                    flags: tuple, block_rows: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rows, lanes = x.shape
    grid = (rows // block_rows,)
    ray_spec = pl.BlockSpec((block_rows, lanes), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    const_spec = pl.BlockSpec((len(flags), 8), lambda i: (0, 0),
                              memory_space=pltpu.VMEM)
    acoef_spec = pl.BlockSpec(acoef.shape, lambda i: (0, 0),
                              memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct(x.shape, x.dtype)] * 8
    kernel = functools.partial(_kernel, flags=flags)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[const_spec, acoef_spec] + [ray_spec] * 8,
        out_specs=[ray_spec] * 8,
        out_shape=out_shape,
    )(consts, acoef, x, y, z, L, M, N, inten, opd)


def _gen_kernel(gen_ref, consts_ref, acoef_ref, px_ref, py_ref,
                xo, yo, zo, lo, mo, no, io, oo, *, flags: tuple,
                final_prop: bool = False):
    """Fused ray-generation + trace: inputs are just the pupil samples.

    gen_ref row: [half_epd_vx, half_epd_vy, x_field, y_field, z0, epl, t_img]
    (infinite-object angle-field aiming, reference rays/ray_generator.py:70-90).
    With ``final_prop``, the post-image-surface propagation by the image
    thickness (raytrace/real_ray_tracer.py:85-92) is fused in as well, so the
    whole reference trace() pipeline is one kernel.
    """
    Px = px_ref[:]
    Py = py_ref[:]
    half_epd_x = gen_ref[0, 0]
    half_epd_y = gen_ref[0, 1]
    x_field = gen_ref[0, 2]
    y_field = gen_ref[0, 3]
    z0s = gen_ref[0, 4]
    epl = gen_ref[0, 5]

    x = Px * half_epd_x + x_field
    y = Py * half_epd_y + y_field
    z = jnp.full_like(Px, z0s)
    x1 = Px * half_epd_x
    y1 = Py * half_epd_y
    dxr = x1 - x
    dyr = y1 - y
    dzr = epl - z
    inv_mag = jax.lax.rsqrt(dxr * dxr + dyr * dyr + dzr * dzr)
    L = dxr * inv_mag
    M = dyr * inv_mag
    N = dzr * inv_mag
    inten = jnp.ones_like(Px)
    opd = jnp.zeros_like(Px)

    for k, (is_plane, is_refl, absorbing, n_terms) in enumerate(flags):
        c = consts_ref[k, :]
        a = acoef_ref[k, :]
        x, y, z, L, M, N, inten, opd = _surface_step(
            c, x, y, z, L, M, N, inten, opd, is_plane=is_plane,
            is_refl=is_refl, absorbing=absorbing, acoef=a, n_terms=n_terms)
    if final_prop:
        t_img = gen_ref[0, 6]
        x = x + t_img * L
        y = y + t_img * M
        z = z + t_img * N
    xo[:] = x
    yo[:] = y
    zo[:] = z
    lo[:] = L
    mo[:] = M
    no[:] = N
    io[:] = inten
    oo[:] = opd


@functools.partial(jax.jit,
                   static_argnames=("flags", "block_rows", "final_prop"))
def _pallas_gen_trace_2d(gen, consts, acoef, Px, Py, flags: tuple,
                         block_rows: int, final_prop: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rows, lanes = Px.shape
    grid = (rows // block_rows,)
    ray_spec = pl.BlockSpec((block_rows, lanes), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    gen_spec = pl.BlockSpec((1, 8), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    const_spec = pl.BlockSpec((len(flags), 8), lambda i: (0, 0),
                              memory_space=pltpu.VMEM)
    acoef_spec = pl.BlockSpec(acoef.shape, lambda i: (0, 0),
                              memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct(Px.shape, Px.dtype)] * 8
    kernel = functools.partial(_gen_kernel, flags=flags,
                               final_prop=final_prop)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[gen_spec, const_spec, acoef_spec, ray_spec, ray_spec],
        out_specs=[ray_spec] * 8,
        out_shape=out_shape,
    )(gen, consts, acoef, Px, Py)


def pallas_gen_trace_conic(model: OpticModel, params, Px, Py, wavelength,
                           Hx: float = 0.0, Hy: float = 0.0,
                           block_rows: int = 128, flags: tuple | None = None,
                           final_prop: bool = False):
    """Fused generation + trace for infinite-object angle-field systems: the
    kernel's only array inputs are the normalized pupil samples (8 bytes/ray
    HBM read), everything else lives in VMEM. ``final_prop`` fuses the
    image-thickness propagation too (the full reference trace() pipeline)."""
    from ..trace.paraxial import Paraxial
    from ..system.model import positions_from_params
    from ..core.rays import Rays

    assert supports_model(model)
    assert model.field_type == "angle" and model._object_infinite
    if flags is None:
        flags = model_flags(model, params)
    consts = pack_surface_constants(model, params, wavelength)

    par = Paraxial(model, params)
    pos = positions_from_params(params)
    EPL = par.EPL()
    EPD = par.EPD()
    offset = EPD - jnp.min(pos[1:-1])
    fields = params["fields"]
    max_field = jnp.max(jnp.sqrt(jnp.sum(fields**2, axis=1)))
    fx = jnp.deg2rad(max_field * Hx)
    fy = jnp.deg2rad(max_field * Hy)
    xf = -jnp.tan(fx) * (offset + EPL)
    yf = -jnp.tan(fy) * (offset + EPL)
    z0s = pos[1] - offset
    t_img = jnp.reshape(params["surfaces"][-1]["thickness"], ())
    gen = jnp.stack([EPD / 2, EPD / 2, xf, yf, z0s, EPL,
                     t_img, jnp.zeros(())]).astype(jnp.float32)
    gen = gen.reshape(1, 8)

    n = Px.shape[-1]
    lanes = 128
    per_block = block_rows * lanes
    n_pad = ((n + per_block - 1) // per_block) * per_block
    rows = n_pad // lanes

    def shape(a):
        a = jnp.asarray(a, jnp.float32)
        a = jnp.pad(a, (0, n_pad - n))
        return a.reshape(rows, lanes)

    acoef = pack_asphere_coeffs(model, params)
    out = _pallas_gen_trace_2d(gen, consts, acoef, shape(Px), shape(Py),
                               flags=flags, block_rows=block_rows,
                               final_prop=final_prop)
    x, y, z, L, M, N, inten, opd = [o.reshape(-1)[:n] for o in out]
    wl = jnp.full_like(x, jnp.asarray(wavelength, jnp.float32))
    return Rays(x=x, y=y, z=z, L=L, M=M, N=N, intensity=inten,
                wavelength=wl, opd=opd, p=None)


def pallas_trace_conic(model: OpticModel, params, rays, wavelength,
                       block_rows: int = 128, flags: tuple | None = None):
    """Trace a ray bundle through an all-conic system with the fused kernel.

    Returns a Rays pytree with the final state (positions at the image
    surface, before the final image-thickness propagation).

    ``flags``: static per-surface specialization (from ``model_flags``). Must
    be precomputed (outside jit) when this function is called under jit.
    """
    assert supports_model(model), "model not supported by the fused kernel"
    consts = pack_surface_constants(model, params, wavelength)
    if flags is None:
        flags = model_flags(model, params)

    n = rays.x.shape[-1]
    lanes = 128
    per_block = block_rows * lanes
    n_pad = ((n + per_block - 1) // per_block) * per_block
    rows = n_pad // lanes

    def shape(a):
        a = jnp.asarray(a, jnp.float32)
        a = jnp.pad(a, (0, n_pad - n))
        return a.reshape(rows, lanes)

    args = [shape(v) for v in (rays.x, rays.y, rays.z, rays.L, rays.M,
                               rays.N, rays.intensity, rays.opd)]
    acoef = pack_asphere_coeffs(model, params)
    out = _pallas_call_2d(consts, acoef, *args, flags=flags,
                          block_rows=block_rows)
    x, y, z, L, M, N, inten, opd = [o.reshape(-1)[:n] for o in out]
    return rays.replace(x=x, y=y, z=z, L=L, M=M, N=N, intensity=inten,
                        opd=opd)
