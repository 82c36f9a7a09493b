"""Real-ray trace engine — the hot path.

TPU-first rebuild of the reference call stack (SURVEY.md §3.1:
optic.trace -> RealRayTracer.trace -> SurfaceGroup.trace -> Surface.trace,
optiland/surfaces/standard_surface.py:186-287). Differences by design:

- the per-surface Python loop *unrolls inside jit* over the static surface
  list: every step is branch-free array code over the ray axis, XLA fuses the
  whole stack into one kernel (no per-surface host dispatch, no `_record`
  copies unless history is requested),
- surfaces with no tilt/decenter skip the 3x3 rotation entirely (static flag),
- ray validity is carried by intensity masking + NaN-safe math, never by
  dropping rays (shapes stay static).

The returned history (optional) matches the reference's recorded per-surface
state: stacked [S, n_rays] arrays including the launch state at index 0.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core import rays as R
from ..core.transforms import localize, globalize, rotation_matrix
from ..system.model import OpticModel, positions_from_params
from .raygen import generate_rays, vig_factor

__all__ = ["trace_surface", "trace_system", "trace", "trace_generic"]


def _pre_material(model: OpticModel, params, k: int):
    spec = model.surfaces[k - 1]
    return model.surfaces[spec.material_src].material, \
        params["surfaces"][spec.material_src]["material"]


def _post_material(model: OpticModel, params, k: int):
    spec = model.surfaces[k]
    return model.surfaces[spec.material_src].material, \
        params["surfaces"][spec.material_src]["material"]


def trace_surface(model: OpticModel, params, k: int, rays: R.Rays,
                  positions, key=None, wl_scalar=None, valid=None):
    """Trace rays through surface k (reference standard_surface.py:186-233).

    ``wl_scalar``: when the whole bundle shares one wavelength, material
    dispersion evaluates on the scalar (hoisted by XLA to one constant per
    surface) instead of per-ray — per-ray table interpolation means gather
    ops, which are slow on TPU.

    Returns (rays, valid). Lost rays (missed surface / TIR / evanescent
    order) keep *finite* placeholder values and are flagged in ``valid``;
    trace_system injects NaN once at the end for reference parity
    (real_rays.py leaves NaN in place). Keeping every intermediate finite
    is what keeps reverse-mode gradients NaN-free when rays are lost:
    a cotangent of zero times a NaN partial is still NaN, so NaN must
    never enter multiplicative arithmetic mid-trace.
    """
    spec = model.surfaces[k]
    sp = params["surfaces"][k]
    wl = rays.wavelength if wl_scalar is None else wl_scalar

    # ---- localize --------------------------------------------------------
    tz = positions[k]
    if spec.has_tilt_decenter:
        cs = sp["cs"]
        Rm = rotation_matrix(cs["rx"], cs["ry"], cs["rz"])
        x, y, z, L, M, N = localize(Rm, cs["dx"], cs["dy"], tz + cs["dz"],
                                    rays.x, rays.y, rays.z,
                                    rays.L, rays.M, rays.N)
        rays = rays.replace(x=x, y=y, z=z, L=L, M=M, N=N)
    else:
        rays = rays.replace(z=rays.z - tz)

    mat1, mp1 = _pre_material(model, params, k)
    if getattr(mat1, "is_grin", False):
        # ---- GRIN gap: RK4 march replaces intersect+propagate+OPD --------
        # (the reference's unimplemented propagation/grin.py extension point)
        from .grin import grin_march
        dz_entry = positions[k] - positions[k - 1]
        rays, ok_g, n1 = grin_march(spec.geometry, sp["geom"], mat1, mp1,
                                    rays, wl, dz_entry)
        valid = ok_g if valid is None else (valid & ok_g)
    else:
        # ---- intersect ---------------------------------------------------
        t = spec.geometry.distance(sp["geom"], rays.x, rays.y, rays.z,
                                   rays.L, rays.M, rays.N)
        ok_t = jnp.isfinite(t)
        t = jnp.where(ok_t, t, 0.0)
        valid = ok_t if valid is None else (valid & ok_t)

        # ---- propagate through pre-material ------------------------------
        n1 = mat1.n(mp1, wl)
        alpha = None
        if mat1.absorbing:
            kext = mat1.k(mp1, wl)
            alpha = 4.0 * jnp.pi * kext / wl
        rays = R.propagate(rays, t, alpha=alpha)

        # ---- OPD ----------------------------------------------------------
        rays = rays.replace(opd=rays.opd + jnp.abs(t * n1))

    # ---- physical aperture ----------------------------------------------
    if spec.aperture is not None:
        inside = spec.aperture.contains(sp["aperture"], rays.x, rays.y)
        rays = R.clip(rays, ~inside)

    # ---- interact --------------------------------------------------------
    if spec.interaction == "refract_reflect":
        nx, ny, nz = spec.geometry.normal(sp["geom"], rays.x, rays.y)
        L0, M0, N0 = rays.L, rays.M, rays.N  # pre-interaction directions
        if spec.is_reflective:
            rays, ok_i = R.reflect(rays, nx, ny, nz)
            n2 = n1
        else:
            mat2, mp2 = _post_material(model, params, k)
            n2 = mat2.n(mp2, wl)
            rays, ok_i = R.refract(rays, nx, ny, nz, n1, n2)
        valid = valid & ok_i

        coating = spec.coating
        # scalar-intensity coating (reference coatings.py SimpleCoating)
        if coating is not None and not coating.polarization_dependent:
            factor = coating.intensity_factor(sp.get("coating", {}),
                                              spec.is_reflective)
            rays = rays.replace(intensity=rays.intensity * factor)

        # polarization chain update (reference interactions/base.py:111-127:
        # coating.interact -> rays.update(jones), or rays.update() bare)
        if rays.p is not None:
            jones = None
            if coating is not None and coating.polarization_dependent:
                _, _, _, cosi = R.align_normal(L0, M0, N0, nx, ny, nz)
                aoi = jnp.arccos(jnp.clip(cosi, -1.0, 1.0))
                jones = coating.jones(n1, n2, aoi, spec.is_reflective)
            from ..core.polarization import apply_polarization_update
            p_new = apply_polarization_update(rays.p, L0, M0, N0,
                                              rays.L, rays.M, rays.N, jones,
                                              normal=(nx, ny, nz))
            rays = rays.replace(p=p_new)

        if spec.bsdf is not None:
            if key is None:
                raise ValueError("BSDF surfaces require a PRNG key: "
                                 "trace_system(..., key=...)")
            rays = spec.bsdf.scatter(sp.get("bsdf", {}), rays, nx, ny, nz,
                                     key)
    elif spec.interaction == "thin_lens":
        # ideal lens: bend toward paraxial focus f (reference
        # interactions/thin_lens_interaction_model.py)
        f = sp["f"]
        mat2, mp2 = _post_material(model, params, k)
        n2 = mat2.n(mp2, wl)
        ux = rays.L / rays.N
        uy = rays.M / rays.N
        ux2 = (n1 * ux - rays.x / f) / n2
        uy2 = (n1 * uy - rays.y / f) / n2
        norm = jnp.sqrt(ux2**2 + uy2**2 + 1.0)
        rays = rays.replace(L=ux2 / norm, M=uy2 / norm, N=1.0 / norm)
    elif spec.interaction == "grating":
        # reference interactions/diffractive_model.py: grating vector from the
        # geometry, period corrected for the surface-projection factor
        nx, ny, nz = spec.geometry.normal(sp["geom"], rays.x, rays.y)
        mat2, mp2 = _post_material(model, params, k)
        n2 = mat2.n(mp2, wl)
        gp = sp["geom"]
        fx, fy, fz = spec.geometry.grating_vector(gp, rays.x, rays.y)
        period = gp["grating_period"] / jnp.sqrt(fx**2 + fy**2)
        rays, ok_i = R.grating_diffract(rays, nx, ny, nz, fx, fy, fz,
                                        gp["grating_order"], period, n1, n2,
                                        spec.is_reflective)
        valid = valid & ok_i
    elif spec.interaction == "phase":
        # reference interactions/phase_interaction_model.py: tangential
        # wavevector + surface-projected phase gradient; normal component
        # rebuilt from |k_out| = n2 k0; OPD -= phase/k0
        nx, ny, nz = spec.geometry.normal(sp["geom"], rays.x, rays.y)
        mat2, mp2 = _post_material(model, params, k)
        n2 = n1 if spec.is_reflective else mat2.n(mp2, wl)
        k0 = 2 * jnp.pi / wl
        pp = sp["phase"]
        prof = spec.phase_profile
        phase_val = prof.phase(pp, rays.x, rays.y)
        gx, gy, gz = prof.gradient(pp, rays.x, rays.y)
        g_dot_n = gx * nx + gy * ny + gz * nz
        Gx, Gy, Gz = gx - g_dot_n * nx, gy - g_dot_n * ny, gz - g_dot_n * nz
        kix, kiy, kiz = n1 * k0 * rays.L, n1 * k0 * rays.M, n1 * k0 * rays.N
        ki_dot_n = kix * nx + kiy * ny + kiz * nz
        kpx = kix - ki_dot_n * nx + Gx
        kpy = kiy - ki_dot_n * ny + Gy
        kpz = kiz - ki_dot_n * nz + Gz
        R_sq = (n2 * k0) ** 2 - (kpx**2 + kpy**2 + kpz**2)
        evanescent = R_sq < 0
        rays = R.clip(rays, evanescent)
        # double-where: sqrt'(0)=inf would poison grads at the clamp
        alpha = jnp.sqrt(jnp.where(evanescent, 1.0, jnp.maximum(R_sq, 0.0)))
        alpha = jnp.where(evanescent, 0.0, alpha)
        if spec.is_reflective:
            alpha = -alpha
        kox = kpx + alpha * nx
        koy = kpy + alpha * ny
        koz = kpz + alpha * nz
        mag = jnp.sqrt(kox**2 + koy**2 + koz**2)
        rays = rays.replace(L=kox / mag, M=koy / mag, N=koz / mag,
                            opd=rays.opd - phase_val / k0,
                            intensity=rays.intensity * prof.efficiency)
    else:
        raise ValueError(f"unknown interaction {spec.interaction}")

    # ---- globalize -------------------------------------------------------
    if spec.has_tilt_decenter:
        cs = sp["cs"]
        Rm = rotation_matrix(cs["rx"], cs["ry"], cs["rz"])
        x, y, z, L, M, N = globalize(Rm, cs["dx"], cs["dy"], tz + cs["dz"],
                                     rays.x, rays.y, rays.z,
                                     rays.L, rays.M, rays.N)
        rays = rays.replace(x=x, y=y, z=z, L=L, M=M, N=N)
    else:
        rays = rays.replace(z=rays.z + tz)

    return rays, valid


def _nanify(rays: R.Rays, valid) -> R.Rays:
    """Inject NaN into the kinematic state of invalid (lost) rays, matching
    the reference's NaN-in-place convention (rays/real_rays.py sqrt of
    negative discriminants). Done ONCE at the end of the trace: the NaN is a
    where-selected constant, so the cotangent to the finite branch is cleanly
    masked and parameter gradients stay finite."""
    def m(v):
        return jnp.where(valid, v, jnp.nan)
    return rays.replace(x=m(rays.x), y=m(rays.y), z=m(rays.z),
                        L=m(rays.L), M=m(rays.M), N=m(rays.N),
                        opd=m(rays.opd))


def trace_system(model: OpticModel, params, rays: R.Rays, record: bool = False,
                 skip: int = 0, key=None, wl_scalar=None):
    """Sequentially trace rays through all surfaces
    (reference surfaces/surface_group.py:232-244).

    Returns (rays, history) where history stacks per-surface recorded state
    [num_surfaces, n_rays] per field (None when record=False). Lost rays
    (missed surface / TIR) come back with NaN state, as in the reference;
    internally they are traced with finite placeholders so gradients of the
    surviving rays stay NaN-free (see trace_surface).
    """
    positions = positions_from_params(params)
    valid = jnp.ones_like(rays.x, dtype=bool)
    snaps = [(rays, valid)] if record else None
    needs_key = any(s.bsdf is not None for s in model.surfaces)
    if needs_key and key is None:
        import jax
        key = jax.random.PRNGKey(0)
    keys = None
    if needs_key:
        import jax
        keys = jax.random.split(key, model.num_surfaces)
    for k in range(max(1, skip), model.num_surfaces):
        rays, valid = trace_surface(model, params, k, rays, positions,
                                    key=None if keys is None else keys[k],
                                    wl_scalar=wl_scalar, valid=valid)
        if record:
            snaps.append((rays, valid))
    history = None
    if record:
        import jax
        nanified = [_nanify(r, v) for r, v in snaps]
        history = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *nanified)
    return _nanify(rays, valid), history


def _final_image_propagation(model, params, rays):
    """Propagate past the image surface by its thickness (reference
    raytrace/real_ray_tracer.py:85-92); a no-op for thickness 0.

    Lost rays arrive here with NaN direction; the multiplicand is sanitized
    so d(x)/d(t_img) never mixes NaN into the (shared, reduced-over-rays)
    thickness gradient. Positions stay NaN via the additive term."""
    t_img = params["surfaces"][-1]["thickness"]
    ok = jnp.isfinite(rays.L) & jnp.isfinite(rays.M) & jnp.isfinite(rays.N)
    Ls = jnp.where(ok, rays.L, 0.0)
    Ms = jnp.where(ok, rays.M, 0.0)
    Ns = jnp.where(ok, rays.N, 0.0)
    return rays.replace(x=rays.x + t_img * Ls,
                        y=rays.y + t_img * Ms,
                        z=rays.z + t_img * Ns)


def trace(model: OpticModel, params, Hx, Hy, wavelength, Px, Py,
          record: bool = False, apodization=None):
    """Full real-ray pipeline: expand fields x pupil, aim, trace, final
    propagation (reference raytrace/real_ray_tracer.py:37-97).

    Hx/Hy are scalars or [F] arrays; Px/Py are [P] pupil samples. Rays are
    ordered field-major: ray i*P+j is field i, pupil point j.
    """
    Hx = jnp.atleast_1d(jnp.asarray(Hx))
    Hy = jnp.atleast_1d(jnp.asarray(Hy))
    P = Px.shape[0]
    F = Hx.shape[0]
    Hx_full = jnp.repeat(Hx, P)
    Hy_full = jnp.repeat(Hy, P)
    Px_full = jnp.tile(Px, F)
    Py_full = jnp.tile(Py, F)

    rays = generate_rays(model, params, Hx_full, Hy_full, Px_full, Py_full,
                         wavelength, apodization=apodization,
                         polarized=(model.polarization != "ignore"))
    launch = rays
    wl_scalar = wavelength if jnp.ndim(wavelength) == 0 else None
    rays, history = trace_system(model, params, rays, record=record,
                                 wl_scalar=wl_scalar)
    rays = _final_image_propagation(model, params, rays)
    rays = _finalize_polarization(model, rays, launch)
    return (rays, history) if record else rays


def _finalize_polarization(model, rays, launch):
    """Update intensity from the accumulated polarization chain (reference
    raytrace/real_ray_tracer.py:93-95 -> polarized_rays.update_intensity)."""
    if rays.p is None or model.polarization == "ignore":
        return rays
    from ..core.polarization import update_intensity
    state = model.polarization if not isinstance(model.polarization, str) \
        else None
    i_new = update_intensity(rays.p, state, launch.intensity,
                             launch.L, launch.M, launch.N)
    return rays.replace(intensity=i_new)


def trace_generic(model: OpticModel, params, Hx, Hy, Px, Py, wavelength,
                  record: bool = False):
    """Trace explicitly-specified (field, pupil) coordinate arrays
    (reference raytrace/real_ray_tracer.py:99-133), with vignetting scaling."""
    Hx, Hy, Px, Py = jnp.broadcast_arrays(
        jnp.atleast_1d(jnp.asarray(Hx)), jnp.atleast_1d(jnp.asarray(Hy)),
        jnp.atleast_1d(jnp.asarray(Px)), jnp.atleast_1d(jnp.asarray(Py)))
    vx, vy = vig_factor(model, params, Hx, Hy)
    Px = Px * (1 - vx)
    Py = Py * (1 - vy)
    rays = generate_rays(model, params, Hx, Hy, Px, Py, wavelength,
                         polarized=(model.polarization != "ignore"))
    launch = rays
    wl_scalar = wavelength if jnp.ndim(wavelength) == 0 else None
    rays, history = trace_system(model, params, rays, record=record,
                                 wl_scalar=wl_scalar)
    rays = _final_image_propagation(model, params, rays)
    rays = _finalize_polarization(model, rays, launch)
    return (rays, history) if record else rays
