"""Fused Pallas trace kernel for conic/asphere/freeform surface stacks.

The XLA path executes the unrolled surface chain as fused elementwise ops, but
intermediate ray state still round-trips HBM between fusion boundaries. This
kernel keeps the ENTIRE surface stack's ray state in VMEM: the grid tiles the
ray axis; each tile loads launch state once, loops over all surfaces in
registers/VMEM, and writes final state once (SURVEY.md §7 stage 7).

Scope (the fast-path contract, reference hot path
surfaces/standard_surface.py:186-287):
- conic / plane / even+odd asphere / XY-polynomial / Chebyshev / biconic /
  toroidal geometries, refract or reflect,
- per-surface tilt/decenter (fold mirrors): localize/globalize with a packed
  3x3 rotation, statically skipped for untitled surfaces,
- radial / offset-radial apertures (e.g. Hubble's central obscuration):
  intensity masking in the local frame, exactly like the XLA clip,
- scalar (Simple) coatings: per-surface intensity factor,
- absorption in the pre-material (Beer-Lambert),
- polychromatic bundles: the grid gains a wavelength axis; each block is
  monochromatic with its own per-surface index/absorption constants, so no
  per-ray gathers ever happen.
Non-conic geometries intersect in-kernel: conic warm start + _NEWTON_ITERS
fixed Newton steps on the statically-dispatched freeform sag (value path
only; gradients use the XLA trace with implicit-diff Newton). The general
path (Zernike/Forbes/NURBS/grid sags, gratings, phase surfaces, polarization,
GRIN, BSDFs) stays on XLA.

Surface constants are packed into a [S, 32] array (or [W, S, 32] for W
wavelengths); the kernel receives it whole in VMEM and reads scalars per
(statically unrolled) surface:
  0 radius_inv  1 conic  2 pos_z  3 n1  4 n2  5 alpha_abs  6 coat_factor
  8..16 rotation row-major r00..r22   17 tx  18 ty  19 tz
  20 ap_rmin2  21 ap_rmax2  22 ap_ox  23 ap_oy
  24/25 per-kind geometry extras (cheb norm_x/norm_y, biconic x-curvature/
  x-conic, toroidal rotation radius)                     (rest padding)
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

_CONST_W = 32  # per-surface constant row width (lane-friendly)

_NEWTON_ITERS = 8  # fixed in-kernel Newton refinements for aspheres


def supports_model(model: OpticModel) -> bool:
    """True if every inner surface is a conic/plane/asphere/XY-polynomial/
    Chebyshev/biconic/toroidal refract/reflect surface whose extras the
    kernel can fuse: tilt/decenter, radial or offset-radial apertures,
    scalar (simple) coatings. BSDFs, polarization-dependent coatings, GRIN
    media and non-refractive interactions stay on the XLA path."""
    for spec in model.surfaces[1:]:
        if spec.geometry.kind not in ("standard", "plane", "even_asphere",
                                      "odd_asphere", "polynomial_xy",
                                      "chebyshev", "biconic", "toroidal"):
            return False
        if spec.interaction != "refract_reflect":
            return False
        if spec.bsdf is not None:
            return False
        if spec.aperture is not None and spec.aperture.kind not in (
                "radial", "offset_radial"):
            return False
        if spec.coating is not None and spec.coating.kind != "simple":
            return False
    for spec in model.surfaces:
        if getattr(spec.material, "is_grin", False):
            return False
    return model.polarization == "ignore"


def _pack_rows(model: OpticModel, params, wavelength) -> jnp.ndarray:
    """[S-1, 32] per-surface scalars for one (traced) wavelength."""
    from ..core.transforms import rotation_matrix

    pos = positions_from_params(params)
    wl = jnp.asarray(wavelength)
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
        n1 = mat1.n(mp1, wl)
        if spec.is_reflective:
            n2 = n1
        else:
            mat2 = model.surfaces[spec.material_src].material
            mp2 = params["surfaces"][spec.material_src]["material"]
            n2 = mat2.n(mp2, wl)
        alpha = jnp.asarray(0.0)
        if mat1.absorbing:
            kext = mat1.k(mp1, wl)
            alpha = 4.0 * jnp.pi * kext / wl

        coat = jnp.asarray(1.0)
        if spec.coating is not None and spec.coating.kind == "simple":
            coat = spec.coating.intensity_factor(sp.get("coating", {}),
                                                 spec.is_reflective)

        zeros3 = jnp.zeros(3)
        if spec.has_tilt_decenter:
            cs = sp["cs"]
            Rm = rotation_matrix(cs["rx"], cs["ry"], cs["rz"]).reshape(-1)
            tvec = jnp.stack([cs["dx"], cs["dy"], pos[k] + cs["dz"]])
        else:
            Rm = jnp.zeros(9)
            tvec = zeros3

        if spec.aperture is not None:
            ap = sp["aperture"]
            rmin2 = ap["r_min"] ** 2
            rmax2 = ap["r_max"] ** 2
            aox = ap.get("offset_x", jnp.asarray(0.0))
            aoy = ap.get("offset_y", jnp.asarray(0.0))
        else:
            rmin2 = jnp.asarray(0.0)
            rmax2 = jnp.asarray(jnp.inf)
            aox = aoy = jnp.asarray(0.0)

        # ---- per-kind extra geometry scalars (slots 24, 25) ----------------
        gx24 = jnp.asarray(0.0)
        gx25 = jnp.asarray(0.0)
        gk = spec.geometry.kind
        if gk == "chebyshev":
            gx24 = sp["geom"]["norm_x"]
            gx25 = sp["geom"]["norm_y"]
        elif gk == "biconic":
            rx = sp["geom"]["radius_x"]
            gx24 = jnp.where(jnp.isinf(rx), 0.0, 1.0 / rx)
            gx25 = sp["geom"]["conic_x"]
        elif gk == "toroidal":
            rr = sp["geom"]["radius_rot"]
            gx24 = jnp.where(jnp.isinf(rr), 1.0, rr)

        head = jnp.stack([
            jnp.reshape(radius_inv, ()), jnp.reshape(conic, ()),
            jnp.reshape(pos[k], ()), jnp.reshape(n1, ()),
            jnp.reshape(n2, ()), jnp.reshape(alpha, ()),
            jnp.reshape(coat, ()), jnp.zeros(()),
        ])
        apr = jnp.stack([jnp.reshape(rmin2, ()), jnp.reshape(rmax2, ()),
                         jnp.reshape(aox, ()), jnp.reshape(aoy, ()),
                         jnp.reshape(gx24, ()), jnp.reshape(gx25, ())])
        row = jnp.concatenate([head, Rm, tvec, apr,
                               jnp.zeros(_CONST_W - 26)])
        rows.append(row)
    return jnp.stack(rows).astype(jnp.float32)


def pack_surface_constants(model: OpticModel, params, wavelength) -> jnp.ndarray:
    """[S-1, 32] per-surface scalars for a scalar wavelength, or
    [W, S-1, 32] for a 1-D array of W wavelengths (one constant set per
    wavelength — the polychromatic grid axis)."""
    wl = jnp.asarray(wavelength)
    if wl.ndim == 0:
        return _pack_rows(model, params, wl)
    return jax.vmap(lambda w: _pack_rows(model, params, w))(wl)


def _geom_coeff_vector(spec, gp):
    """Flattened per-surface geometry coefficient vector for the kernel, or
    None for coefficient-free kinds (conic/plane/biconic)."""
    gk = spec.geometry.kind
    if gk in ("even_asphere", "odd_asphere") and spec.geometry.num_terms:
        return jnp.asarray(gp["coefficients"], jnp.float32)
    if gk in ("polynomial_xy", "chebyshev"):
        return jnp.asarray(gp["coefficients"], jnp.float32).reshape(-1)
    if gk == "toroidal" and spec.geometry.num_terms:
        return jnp.asarray(gp["coeffs_poly_y"], jnp.float32)
    return None


def pack_asphere_coeffs(model: OpticModel, params) -> jnp.ndarray:
    """[S-1, Cmax] per-surface geometry coefficients (even/odd asphere
    polynomial, row-major XY/Chebyshev grids, toroidal y-polynomial),
    zero-padded; a [S-1, 8]-aligned dummy when the system is all-conic
    (Pallas wants a real operand)."""
    vecs = []
    cmax = 1
    for k in range(1, model.num_surfaces):
        v = _geom_coeff_vector(model.surfaces[k],
                               params["surfaces"][k]["geom"])
        vecs.append(v)
        if v is not None:
            cmax = max(cmax, int(v.shape[0]))
    cmax = max(8, ((cmax + 7) // 8) * 8)  # lane-friendly width
    rows = []
    for v in vecs:
        row = jnp.zeros((cmax,), jnp.float32)
        if v is not None:
            row = row.at[:v.shape[0]].set(v)
        rows.append(row)
    return jnp.stack(rows)


def _asphere_sag_grad(radius_inv, conic, acoef, n_terms: int, xx, yy,
                      odd: bool = False):
    """Asphere sag + gradient (geometry/aspheres.py EvenAsphere/OddAsphere):
    conic base + sum C_i r^(2(i+1)) (even) or sum C_i r^(i+1) (odd)."""
    r2 = xx * xx + yy * yy
    arg = 1.0 - (1.0 + conic) * radius_inv * radius_inv * r2
    argc = jnp.where(arg > _EPS, arg, _EPS)
    sq = jnp.sqrt(argc)
    s = r2 * radius_inv / (1.0 + sq)
    inv_sq = 1.0 / sq
    gx = xx * radius_inv * inv_sq
    gy = yy * radius_inv * inv_sq
    if odd:
        # powers of r; d(C r^(i+1))/dx = (i+1) C x r^(i-1), clamped at axis
        r = jnp.sqrt(jnp.maximum(r2, 1e-24))
        term = r
        gterm = 1.0 / r
        for i in range(n_terms):
            ci = acoef[i]
            s = s + ci * term
            kk = float(i + 1)
            gx = gx + kk * xx * ci * gterm
            gy = gy + kk * yy * ci * gterm
            term = term * r
            gterm = gterm * r
        return s, gx, gy
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


def _conic_base(radius_inv, conic, xx, yy):
    """Conic sag + gradient in curvature form (geometry/standard.py)."""
    r2 = xx * xx + yy * yy
    arg = 1.0 - (1.0 + conic) * radius_inv * radius_inv * r2
    argc = jnp.where(arg > _EPS, arg, _EPS)
    sq = jnp.sqrt(argc)
    s = r2 * radius_inv / (1.0 + sq)
    inv_sq = 1.0 / sq
    return s, xx * radius_inv * inv_sq, yy * radius_inv * inv_sq


def _axis_conic(cv, k, v):
    """1-D conic section sag + derivative in curvature form
    (geometry/aspheres.py Biconic._axis_sag/_axis_grad)."""
    arg = 1.0 - (1.0 + k) * cv * cv * v * v
    argc = jnp.where(arg > _EPS, arg, _EPS)
    sq = jnp.sqrt(argc)
    s = cv * v * v / (1.0 + sq)
    return s, cv * v / sq


def _freeform_sag_grad(gkind: str, nu: int, nv: int, c, acoef, xx, yy):
    """Static per-kind sag + gradient dispatch for the in-kernel Newton
    solve and exit normal. Mirrors geometry/aspheres.py exactly (including
    the Chebyshev missing-1/norm derivative quirk)."""
    radius_inv, conic = c[0], c[1]
    if gkind in ("even", "odd"):
        return _asphere_sag_grad(radius_inv, conic, acoef, nu, xx, yy,
                                 odd=(gkind == "odd"))
    if gkind == "poly":
        # z = conic + sum_ij C[i,j] x^i y^j  (row-major acoef[i*nv+j])
        s, gx, gy = _conic_base(radius_inv, conic, xx, yy)
        xp = [jnp.ones_like(xx)]
        for _ in range(nu - 1):
            xp.append(xp[-1] * xx)
        yp = [jnp.ones_like(yy)]
        for _ in range(nv - 1):
            yp.append(yp[-1] * yy)
        for i in range(nu):
            for j in range(nv):
                cij = acoef[i * nv + j]
                s = s + cij * xp[i] * yp[j]
                if i > 0:
                    gx = gx + float(i) * cij * xp[i - 1] * yp[j]
                if j > 0:
                    gy = gy + float(j) * cij * xp[i] * yp[j - 1]
        return s, gx, gy
    if gkind == "cheb":
        # z = conic + sum_ij C[i,j] T_i(x/nx) T_j(y/ny); derivative at the
        # NORMALIZED coordinate without the 1/norm chain factor (the
        # reference quirk, geometries/chebyshev.py _surface_normal)
        s, gx, gy = _conic_base(radius_inv, conic, xx, yy)
        u = xx / c[24]
        v = yy / c[25]

        def cheb_tu(n, w):
            ts = [jnp.ones_like(w)]
            if n > 1:
                ts.append(w)
            for _ in range(2, n):
                ts.append(2.0 * w * ts[-1] - ts[-2])
            us = [jnp.ones_like(w)]
            if n > 2:
                us.append(2.0 * w)
            for _ in range(3, n):
                us.append(2.0 * w * us[-1] - us[-2])
            dts = [jnp.zeros_like(w)]
            for kk in range(1, n):
                dts.append(float(kk) * us[kk - 1])
            return ts, dts

        tx, dtx = cheb_tu(nu, u)
        ty, dty = cheb_tu(nv, v)
        for i in range(nu):
            for j in range(nv):
                cij = acoef[i * nv + j]
                s = s + cij * tx[i] * ty[j]
                if i > 0:
                    gx = gx + cij * dtx[i] * ty[j]
                if j > 0:
                    gy = gy + cij * tx[i] * dty[j]
        return s, gx, gy
    if gkind == "biconic":
        # c[0]/c[1]: y-curve (radius_inv, conic); c[24]/c[25]: x-curve
        sy, gy = _axis_conic(radius_inv, conic, yy)
        sx, gx = _axis_conic(c[24], c[25], xx)
        return sx + sy, gx, gy
    if gkind in ("toroidal", "toroidal_inf"):
        # y-z conic curve + even y-polynomial, swept about x with radius
        # c[24] (geometry/aspheres.py Toroidal). toroidal_inf (infinite
        # rotation radius) degenerates to the plain y-curve (a cylinder).
        zy, dzy = _axis_conic(radius_inv, conic, yy)
        y2 = yy * yy
        term = y2
        dterm = yy
        for i in range(nu):
            ci = acoef[i]
            zy = zy + ci * term
            dzy = dzy + 2.0 * float(i + 1) * ci * dterm
            term = term * y2
            dterm = dterm * y2
        if gkind == "toroidal_inf":
            return zy, jnp.zeros_like(xx), dzy
        R = c[24]
        dz = R - zy
        inside = dz * dz - xx * xx
        ok = inside > _EPS
        root = jnp.sqrt(jnp.where(ok, inside, _EPS))
        sgn = jnp.where(dz >= 0, 1.0, -1.0)
        s = R - sgn * root
        sgnR = jnp.where(R >= 0, 1.0, -1.0)
        inv_root = 1.0 / root
        gx = jnp.where(ok, sgnR * xx * inv_root, 0.0)
        gyt = jnp.where(ok, sgnR * dz * dzy * inv_root, 0.0)
        return s, gx, gyt
    raise ValueError(f"unknown kernel geometry kind {gkind!r}")


def _surface_step(c, x, y, z, L, M, N, inten, opd, *, is_plane: bool,
                  is_refl: bool, absorbing: bool, acoef=None,
                  gkind: str = "conic", nu: int = 0, nv: int = 0,
                  has_cs: bool = False, has_ap: bool = False,
                  has_coat: bool = False):
    """One surface interaction; all elementwise VPU ops.

    is_plane/is_refl/absorbing/has_cs/has_ap/has_coat are STATIC (baked from
    the model at build): the unrolled loop emits only the ops each surface
    actually needs.

    Op-count notes (this kernel is VPU-compute-bound, not HBM-bound):
    - reflection R = d - 2(d.n)n is invariant under n -> -n, so the
      normal-alignment pass (sign + 3 muls) is skipped entirely;
    - refraction folds the alignment sign into a single multiply:
      with s = sign(d.n), w = s*sqrt(disc) - u*(d.n) reproduces the
      aligned-normal update u*d + n*w exactly;
    - the quadratic uses the half-b form (disc/4), saving the 2x/4x scales;
    - normals use one rsqrt instead of sqrt + guarded reciprocal.
    """
    radius_inv, conic, pos_z, n1, n2, alpha, coat = (
        c[0], c[1], c[2], c[3], c[4], c[5], c[6])

    # ---- localize (core/transforms.py: v_local = R^T (v - t)) -------------
    if has_cs:
        r00, r01, r02 = c[8], c[9], c[10]
        r10, r11, r12 = c[11], c[12], c[13]
        r20, r21, r22 = c[14], c[15], c[16]
        tx, ty, tz = c[17], c[18], c[19]
        dx0 = x - tx
        dy0 = y - ty
        dz0 = z - tz
        x = r00 * dx0 + r10 * dy0 + r20 * dz0
        y = r01 * dx0 + r11 * dy0 + r21 * dz0
        z = r02 * dx0 + r12 * dy0 + r22 * dz0
        Ln = r00 * L + r10 * M + r20 * N
        Mn = r01 * L + r11 * M + r21 * N
        Nn = r02 * L + r12 * M + r22 * N
        L, M, N = Ln, Mn, Nn
    else:
        z = z - pos_z

    # ---- intersection (reference geometries/standard.py:89-140, curvature
    # form). Two f32 conditioning fixes over the naive quadratic, both exact
    # algebraically (tests pin parity vs the XLA path on telescope scales):
    # 1. pre-shift the ray to the vertex plane (z=0) so the coefficients are
    #    sag-scale, not z^2-scale (Hubble: z~5e3 mm would lose ~4 digits);
    # 2. citardauq pairing: the near root is cc/q with q = -(bh + sign(bh)sq),
    #    stable when a -> 0 (near-parabolic mirrors make the quadratic
    #    degenerate: a = (k N^2 + 1)/R ~ 0 when k ~ -1). ----------------------
    if is_plane:
        t = -z / N
    else:
        t0 = -z / N
        x0 = x + t0 * L
        y0 = y + t0 * M
        a = (conic * N * N + 1.0) * radius_inv
        bh = (L * x0 + M * y0) * radius_inv - N
        cc = (x0 * x0 + y0 * y0) * radius_inv
        disc = bh * bh - a * cc
        ok = disc >= 0
        sq = jnp.sqrt(jnp.where(ok, disc, 1.0))
        # sign(0) := 1 (jnp.sign(0)=0 would zero q)
        q = -(bh + jnp.where(bh >= 0, 1.0, -1.0) * sq)
        t_far = q / jnp.where(jnp.abs(a) > _EPS,
                              a, jnp.where(a >= 0, _EPS, -_EPS))
        t_near = cc / jnp.where(jnp.abs(q) > _EPS,
                                q, jnp.where(q >= 0, _EPS, -_EPS))
        tq = jnp.where(jnp.abs(t_near) <= jnp.abs(t_far), t_near, t_far)
        t = t0 + jnp.where(ok, tq, jnp.nan)

    if gkind != "conic":
        # ---- freeform: conic warm start + fixed Newton refinement
        # (geometry/base.py newton_distance, statically unrolled) ----------
        for _ in range(_NEWTON_ITERS):
            xx = x + t * L
            yy = y + t * M
            zz = z + t * N
            s, gx, gy = _freeform_sag_grad(gkind, nu, nv, c, acoef, xx, yy)
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

    # ---- physical aperture (local frame, intensity masking like the XLA
    # R.clip path; system/apertures.py RadialAperture/OffsetRadialAperture) --
    if has_ap:
        xa = x - c[22]
        ya = y - c[23]
        r2a = xa * xa + ya * ya
        inside = (r2a >= c[20]) & (r2a <= c[21])
        inten = inten * inside.astype(inten.dtype)

    if gkind != "conic":
        # ---- freeform normal + refract/reflect ----------------------------
        _, gx, gy = _freeform_sag_grad(gkind, nu, nv, c, acoef, x, y)
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

    # ---- scalar coating intensity factor (system/coatings.py SimpleCoating,
    # applied post-interaction like trace/real.py:121-126) ------------------
    if has_coat:
        inten = inten * coat

    # ---- globalize ---------------------------------------------------------
    if has_cs:
        xg = r00 * x + r01 * y + r02 * z + tx
        yg = r10 * x + r11 * y + r12 * z + ty
        zg = r20 * x + r21 * y + r22 * z + tz
        Lg = r00 * L + r01 * M + r02 * N
        Mg = r10 * L + r11 * M + r12 * N
        Ng = r20 * L + r21 * M + r22 * N
        x, y, z, L, M, N = xg, yg, zg, Lg, Mg, Ng
    else:
        z = z + pos_z
    return x, y, z, L, M, N, inten, opd


def _step_kwargs(flag):
    (is_plane, is_refl, absorbing, gkind, nu, nv, has_cs, has_ap,
     has_coat) = flag
    return dict(is_plane=is_plane, is_refl=is_refl, absorbing=absorbing,
                gkind=gkind, nu=nu, nv=nv, has_cs=has_cs, has_ap=has_ap,
                has_coat=has_coat)


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
    for k, flag in enumerate(flags):
        c = consts_ref[k, :]
        a = acoef_ref[k, :]
        x, y, z, L, M, N, inten, opd = _surface_step(
            c, x, y, z, L, M, N, inten, opd, acoef=a, **_step_kwargs(flag))
    xo[:] = x
    yo[:] = y
    zo[:] = z
    lo[:] = L
    mo[:] = M
    no[:] = N
    io[:] = inten
    oo[:] = opd


_KERNEL_KINDS = {"standard": "conic", "plane": "conic",
                 "even_asphere": "even", "odd_asphere": "odd",
                 "polynomial_xy": "poly", "chebyshev": "cheb",
                 "biconic": "biconic", "toroidal": "toroidal"}


def model_flags(model: OpticModel, params) -> tuple:
    """Static per-surface specialization flags:
    (is_plane, is_reflective, absorbing, gkind, nu, nv, has_cs, has_ap,
    has_coat). ``gkind`` != "conic" selects the in-kernel Newton path with
    the matching freeform sag; nu/nv are the static coefficient counts
    (polynomial term count, or the XY/Chebyshev grid shape)."""
    flags = []
    for k in range(1, model.num_surfaces):
        spec = model.surfaces[k]
        sp = params["surfaces"][k]
        is_plane = bool(np.isinf(np.asarray(sp["geom"].get("radius",
                                                           np.inf))))
        pre = model.surfaces[k - 1]
        absorbing = model.surfaces[pre.material_src].material.absorbing
        gk = spec.geometry.kind
        gkind = _KERNEL_KINDS[gk]
        nu = nv = 0
        if gk in ("even_asphere", "odd_asphere", "toroidal"):
            nu = spec.geometry.num_terms
        elif gk in ("polynomial_xy", "chebyshev"):
            nu, nv = spec.geometry.num_x, spec.geometry.num_y
        if gk == "toroidal" and bool(np.isinf(
                np.asarray(sp["geom"]["radius_rot"]))):
            gkind = "toroidal_inf"
        flags.append((is_plane, spec.is_reflective, absorbing, gkind, nu, nv,
                      spec.has_tilt_decenter, spec.aperture is not None,
                      spec.coating is not None))
    return tuple(flags)


@functools.partial(jax.jit,
                   static_argnames=("flags", "block_rows", "interpret"))
def _pallas_call_2d(consts, acoef, x, y, z, L, M, N, inten, opd,
                    flags: tuple, block_rows: int, interpret: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rows, lanes = x.shape
    grid = (rows // block_rows,)
    ray_spec = pl.BlockSpec((block_rows, lanes), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    const_spec = pl.BlockSpec((len(flags), _CONST_W), lambda i: (0, 0),
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
        interpret=interpret,
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

    consts_ref block is [1, S, 32]: the leading grid axis is the wavelength —
    each block is monochromatic with its own per-surface constants.
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

    for k, flag in enumerate(flags):
        c = consts_ref[0, k, :]
        a = acoef_ref[k, :]
        x, y, z, L, M, N, inten, opd = _surface_step(
            c, x, y, z, L, M, N, inten, opd, acoef=a, **_step_kwargs(flag))
    if final_prop:
        t_img = gen_ref[0, 6]
        x = x + t_img * L
        y = y + t_img * M
        z = z + t_img * N
    xo[0, :, :] = x
    yo[0, :, :] = y
    zo[0, :, :] = z
    lo[0, :, :] = L
    mo[0, :, :] = M
    no[0, :, :] = N
    io[0, :, :] = inten
    oo[0, :, :] = opd


@functools.partial(jax.jit, static_argnames=("flags", "block_rows",
                                             "final_prop", "interpret"))
def _pallas_gen_trace_2d(gen, consts, acoef, Px, Py, flags: tuple,
                         block_rows: int, final_prop: bool = False,
                         interpret: bool = False):
    """Grid is (W, ray blocks): axis 0 selects the per-wavelength constant
    set; every block reuses the same pupil samples (the reference traces the
    same pupil distribution per wavelength)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    W = consts.shape[0]
    S = len(flags)
    rows, lanes = Px.shape
    grid = (W, rows // block_rows)
    ray_in_spec = pl.BlockSpec((block_rows, lanes), lambda w, i: (i, 0),
                               memory_space=pltpu.VMEM)
    ray_out_spec = pl.BlockSpec((1, block_rows, lanes),
                                lambda w, i: (w, i, 0),
                                memory_space=pltpu.VMEM)
    gen_spec = pl.BlockSpec((1, 8), lambda w, i: (0, 0),
                            memory_space=pltpu.VMEM)
    const_spec = pl.BlockSpec((1, S, _CONST_W), lambda w, i: (w, 0, 0),
                              memory_space=pltpu.VMEM)
    acoef_spec = pl.BlockSpec(acoef.shape, lambda w, i: (0, 0),
                              memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct((W, rows, lanes), Px.dtype)] * 8
    kernel = functools.partial(_gen_kernel, flags=flags,
                               final_prop=final_prop)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[gen_spec, const_spec, acoef_spec, ray_in_spec, ray_in_spec],
        out_specs=[ray_out_spec] * 8,
        out_shape=out_shape,
        interpret=interpret,
    )(gen, consts, acoef, Px, Py)


def pallas_gen_trace_conic(model: OpticModel, params, Px, Py, wavelength,
                           Hx: float = 0.0, Hy: float = 0.0,
                           block_rows: int = 128, flags: tuple | None = None,
                           final_prop: bool = False,
                           interpret: bool = False):
    """Fused generation + trace for infinite-object angle-field systems: the
    kernel's only array inputs are the normalized pupil samples (8 bytes/ray
    HBM read), everything else lives in VMEM. ``final_prop`` fuses the
    image-thickness propagation too (the full reference trace() pipeline).

    ``wavelength``: a scalar traces one bundle of ``len(Px)`` rays; a 1-D
    array of W wavelengths traces the same pupil samples at every wavelength
    in one kernel launch (grid axis) and returns W*len(Px) rays ordered
    wavelength-major.
    """
    from ..trace.paraxial import Paraxial
    from ..core.rays import Rays

    assert supports_model(model)
    assert model.field_type == "angle" and model._object_infinite
    if flags is None:
        flags = model_flags(model, params)
    wl = jnp.asarray(wavelength)
    wls = jnp.atleast_1d(wl)
    consts = pack_surface_constants(model, params, wls)  # [W, S-1, 32]

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
                               final_prop=final_prop, interpret=interpret)
    W = wls.shape[0]
    x, y, z, L, M, N, inten, opd = [
        o.reshape(W, -1)[:, :n] for o in out]
    wl_col = jnp.broadcast_to(wls.astype(jnp.float32)[:, None], (W, n))
    if wl.ndim == 0:
        x, y, z, L, M, N, inten, opd, wl_col = [
            v[0] for v in (x, y, z, L, M, N, inten, opd, wl_col)]
    else:
        x, y, z, L, M, N, inten, opd, wl_col = [
            v.reshape(-1) for v in (x, y, z, L, M, N, inten, opd, wl_col)]
    return Rays(x=x, y=y, z=z, L=L, M=M, N=N, intensity=inten,
                wavelength=wl_col, opd=opd, p=None)


def pallas_trace_conic(model: OpticModel, params, rays, wavelength,
                       block_rows: int = 128, flags: tuple | None = None,
                       interpret: bool = False):
    """Trace a ray bundle through a supported system with the fused kernel.

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
                          block_rows=block_rows, interpret=interpret)
    x, y, z, L, M, N, inten, opd = [o.reshape(-1)[:n] for o in out]
    return rays.replace(x=x, y=y, z=z, L=L, M=M, N=N, intensity=inten,
                        opd=opd)
