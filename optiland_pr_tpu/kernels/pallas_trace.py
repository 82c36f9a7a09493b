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
  per-ray gathers ever happen,
- freeform sags (even/odd asphere, XY-polynomial, Chebyshev, biconic,
  toroidal, Zernike, Forbes Qbfs/Q2D, Fresnel zone/designed): conic warm
  start + _NEWTON_ITERS fixed Newton steps on the statically-dispatched sag,
  with one final differentiable IFT step,
- polarization: the full Jones chain runs in-kernel as a rank-structured
  real update on the propagating E-vectors (none/simple/fresnel coatings),
- DOE interactions (round 4): linear-grating diffraction on conic/plane
  substrates and constant/radial/linear-grating phase surfaces,
- meter-scale OPD (round 4): ``opd_split`` keeps only sag-scale,
  cancellation-free deviations in the per-ray accumulator,
- gradients: the whole pipeline is differentiable via the custom_vjp
  backward kernel in pallas_grad.py (``differentiable=True``).
Only NURBS/grid sags, grid phase profiles, GRIN media, BSDF scatter and
thin-lens interactions stay on the XLA path (see supports_model).

Surface constants are packed into a [S, 32] array (or [W, S, 32] for W
wavelengths); the kernel receives it whole in VMEM and reads scalars per
(statically unrolled) surface:
  0 radius_inv  1 conic  2 pos_z  3 n1  4 n2  5 alpha_abs  6 coat_factor
  8..16 rotation row-major r00..r22   17 tx  18 ty  19 tz
  20 ap_rmin2  21 ap_rmax2  22 ap_ox  23 ap_oy
  24/25 per-kind geometry extras (cheb norm_x/norm_y, biconic x-curvature/
  x-conic, toroidal rotation radius)
  27 signed vertex gap (split modes)  28 radius_inv low word (coord_split
  two-float curvature)                                   (rest padding)
"""
from __future__ import annotations

import contextlib
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..system.model import OpticModel, positions_from_params

__all__ = ["pack_surface_constants", "pack_asphere_coeffs",
           "pallas_trace_conic", "pallas_gen_trace_conic",
           "supports_model", "supports_split_opd", "supports_split_xy", "gen_eligible",
           "model_flags"]

_EPS = 1e-14

_CONST_W = 32  # per-surface constant row width (lane-friendly)

_NEWTON_ITERS = 8  # fixed in-kernel Newton refinements for aspheres


_SUPPORTED_KINDS = ("standard", "plane", "even_asphere", "odd_asphere",
                    "polynomial_xy", "chebyshev", "biconic", "toroidal",
                    "zernike", "forbes_qbfs", "forbes_q2d", "fresnel_zone",
                    "fresnel_designed", "standard_grating", "plane_grating")

# phase profiles whose evaluation is branch-free VPU math (grid profiles
# need searchsorted gathers -> XLA path)
_SUPPORTED_PHASE = ("constant", "radial", "linear_grating")


def supports_model(model: OpticModel) -> bool:
    """True if every inner surface is fusable: a conic/plane/asphere/
    XY-polynomial/Chebyshev/Zernike/Forbes/Fresnel/biconic/toroidal
    refract/reflect surface, a conic/plane linear GRATING surface, or a
    conic/plane PHASE surface with a constant/radial/linear-grating profile;
    extras limited to tilt/decenter, radial or offset-radial apertures,
    scalar (simple) or fresnel coatings. BSDFs, grid sags/profiles, NURBS,
    GRIN media and thin-lens interactions stay on the XLA path."""
    for spec in model.surfaces[1:]:
        if spec.interaction == "refract_reflect":
            if spec.geometry.kind not in _SUPPORTED_KINDS:
                return False
        elif spec.interaction == "grating":
            # closed-form in-kernel diffraction needs the conic groove
            # tangent (reference geometries/standard_grating.py:25)
            if spec.geometry.kind not in ("standard_grating",
                                          "plane_grating"):
                return False
            if spec.coating is not None:
                return False
        elif spec.interaction == "phase":
            if spec.geometry.kind not in ("standard", "plane"):
                return False
            prof = spec.phase_profile
            if prof is None or prof.kind not in _SUPPORTED_PHASE:
                return False
            if spec.coating is not None:
                return False
        else:
            return False
        if spec.bsdf is not None:
            return False
        if spec.aperture is not None and spec.aperture.kind not in (
                "radial", "offset_radial"):
            return False
        if spec.coating is not None and spec.coating.kind not in ("simple",
                                                                  "fresnel"):
            return False
    for spec in model.surfaces:
        if getattr(spec.material, "is_grin", False):
            return False
    # polarized chains run in-kernel as an all-real 3x3 Jones composition
    # (Fresnel s/p coefficients are real in the refract/mirror regime; TIR
    # rays are invalid anyway; complex LAUNCH states decompose into two real
    # projections at the final intensity)
    return True


def gen_eligible(model: OpticModel) -> bool:
    """Field/object configurations the fused generation stage covers: every
    launch reduces to origin x0 = Px*A + xf with aim x1 = Px*B at the
    entrance pupil plane (round 4: finite conjugates and object-height /
    paraxial-image-height fields) or the telecentric aim x1 = Px*B + x0 at
    the constant axial distance sqrt(1-sin_u^2)/sin_u (round 5 — the last
    launch mode off the fast path, trace/raygen.py generate_rays)."""
    if model.obj_space_telecentric and model._object_infinite:
        return False
    if model.field_type == "angle":
        return True
    if model.field_type == "object_height":
        return not model._object_infinite
    return model.field_type == "paraxial_image_height"


def supports_split_opd(model: OpticModel) -> bool:
    """True when the meter-scale split-OPD accumulation applies: an
    untilted conic/plane refract/reflect stack (the gap-path decomposition
    assumes per-surface z-frames and axial propagation signs)."""
    for spec in model.surfaces[1:]:
        if spec.geometry.kind not in ("standard", "plane"):
            return False
        if spec.interaction != "refract_reflect":
            return False
        if spec.has_tilt_decenter:
            return False
    return True


def supports_split_xy(model: OpticModel) -> bool:
    """True when the deviation-transport (coord_split) mode applies: the
    split-OPD surface scope, unpolarized, simple-or-no coatings (the xy
    step's Fresnel chain is not implemented — polarization carries its own
    basis state)."""
    if not supports_split_opd(model):
        return False
    if model.polarization != "ignore":
        return False
    for spec in model.surfaces[1:]:
        if spec.coating is not None and spec.coating.kind != "simple":
            return False
    return True


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
        # col 28: low word of 1/R against the f32-rounded hi word. The f32
        # rounding of radius_inv ALONE (rel ~3e-8) shifts a conic's focal
        # length by ~ulp(focal); at meter scale the near-focus V-shaped
        # spot merit amplifies that evaluation-point shift into a coherent
        # ~0.7x gradient attenuation on every focus-coupled leaf (round-5
        # bisection, BENCHMARKS.md). The deviation-transport chain consumes
        # (hi, lo) as a two-float pair. The residual is symbolically zero,
        # so AD contributes nothing here and d/d(radius) rides the hi word.
        rih = radius_inv.astype(jnp.float32).astype(radius_inv.dtype)
        rsafe = jnp.where(is_plane, 1.0, radius)
        p_ri, pe_ri = _two_prod(rih, rsafe)
        radius_inv_lo = jnp.where(is_plane, 0.0,
                                  ((1.0 - p_ri) - pe_ri) / rsafe)

        pre = model.surfaces[k - 1]
        mat1 = model.surfaces[pre.material_src].material
        mp1 = params["surfaces"][pre.material_src]["material"]
        n1 = mat1.n(mp1, wl)
        if spec.is_reflective and spec.interaction != "grating":
            n2 = n1
        else:
            # grating surfaces always read the post material, even when
            # reflective (trace/real.py:163-165 convention; a mirror grating's
            # post material aliases the pre material anyway)
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
            # double-where: an unbounded r_max (inf) squared would put
            # 0 * inf = NaN into the aperture-radius cotangent
            rmn, rmx = ap["r_min"], ap["r_max"]
            fmn, fmx = jnp.isfinite(rmn), jnp.isfinite(rmx)
            rmin2 = jnp.where(fmn, jnp.where(fmn, rmn, 1.0) ** 2, jnp.inf)
            rmax2 = jnp.where(fmx, jnp.where(fmx, rmx, 1.0) ** 2, jnp.inf)
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
        elif gk in ("zernike", "forbes_qbfs", "forbes_q2d"):
            gx24 = sp["geom"]["norm_radius"]
        elif gk == "fresnel_designed":
            gx24 = sp["geom"]["focal_length"]
            gx25 = sp["geom"]["n_design"]
        elif gk in ("standard_grating", "plane_grating"):
            # per-wavelength grating strength g0 = m*lambda/period (both um;
            # trace/real.py:166-170) + groove-orientation tangent
            gx24 = sp["geom"]["grating_order"] * wl / sp["geom"][
                "grating_period"]
            gx25 = jnp.tan(sp["geom"]["groove_angle"])
        if spec.interaction == "phase":
            pp = sp["phase"]
            pk = spec.phase_profile.kind
            if pk == "constant":
                gx24 = pp["phase"]
            elif pk == "linear_grating":
                Kx, Ky = spec.phase_profile._K(pp)
                gx24, gx25 = Kx, Ky
            # radial coefficients ride the acoef row (pack_asphere_coeffs)

        head = jnp.stack([
            jnp.reshape(radius_inv, ()), jnp.reshape(conic, ()),
            jnp.reshape(pos[k], ()), jnp.reshape(n1, ()),
            jnp.reshape(n2, ()), jnp.reshape(alpha, ()),
            jnp.reshape(coat, ()), jnp.reshape(wl, ()),
        ])
        apr = jnp.stack([jnp.reshape(rmin2, ()), jnp.reshape(rmax2, ()),
                         jnp.reshape(aox, ()), jnp.reshape(aoy, ()),
                         jnp.reshape(gx24, ()), jnp.reshape(gx25, ())])
        # slot 27: signed vertex gap pos[k] - pos[k-1] (split-OPD mode);
        # k=1's gap to the LAUNCH plane is overridden by the gen caller
        # (pos[0] is -inf for infinite objects)
        dz_gap = jnp.reshape(pos[k] - pos[k - 1], ())
        dz_gap = jnp.where(jnp.isfinite(dz_gap), dz_gap, 0.0)
        row = jnp.concatenate([head, Rm, tvec, apr, jnp.zeros(1),
                               dz_gap[None],
                               jnp.reshape(radius_inv_lo, (1,)),
                               jnp.zeros(_CONST_W - 29)])
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


def _geom_coeff_vector(spec, sp):
    """Flattened per-surface geometry (or radial-phase-profile) coefficient
    vector for the kernel, or None for coefficient-free kinds
    (conic/plane/biconic/fresnel/grating).

    Forbes coefficients are pre-multiplied through the (static, linear)
    Qbfs/Q2D basis-change matrices here — outside the kernel — so the
    in-kernel Clenshaw works directly on the Pn/Pnm expansion; the map is
    differentiable, so coefficient gradients ride through it."""
    gp = sp["geom"]
    if spec.interaction == "phase" and spec.phase_profile is not None \
            and spec.phase_profile.kind == "radial":
        # radial phase coefficients share the acoef row (phase surfaces in
        # the kernel carry a coefficient-free conic/plane geometry)
        return jnp.asarray(sp["phase"]["coefficients"], jnp.float32)
    gk = spec.geometry.kind
    if gk in ("even_asphere", "odd_asphere") and spec.geometry.num_terms:
        return jnp.asarray(gp["coefficients"], jnp.float32)
    if gk in ("polynomial_xy", "chebyshev"):
        return jnp.asarray(gp["coefficients"], jnp.float32).reshape(-1)
    if gk == "toroidal" and spec.geometry.num_terms:
        return jnp.asarray(gp["coeffs_poly_y"], jnp.float32)
    if gk == "zernike" and spec.geometry.num_terms:
        return jnp.asarray(gp["coefficients"], jnp.float32)
    if gk == "forbes_qbfs" and spec.geometry.num_terms:
        from ..geometry.forbes import qbfs_basis_matrix
        M = jnp.asarray(qbfs_basis_matrix(spec.geometry.num_terms),
                        jnp.float32)
        c = jnp.asarray(gp["coefficients"], jnp.float32)
        return M @ c[: spec.geometry.num_terms]
    if gk == "forbes_q2d" and spec.geometry.terms:
        return _q2d_packed_coeffs(spec.geometry, gp)
    return None


def _q2d_packed_coeffs(geom, gp):
    """Concatenated basis-changed Q2D coefficient groups:
    [bs_m0 | ds_a(m=1) | ds_b(m=1) | ... | ds_a(max_m) | ds_b(max_m)],
    the layout the kernel reconstructs statically from the terms tuple."""
    from ..geometry.forbes import qbfs_basis_matrix, q2d_basis_matrix
    c = jnp.asarray(gp["coefficients"], jnp.float32)
    cm0, ams, bms = geom._grouped(c)
    parts = []
    if cm0:
        Mb = jnp.asarray(qbfs_basis_matrix(len(cm0)), jnp.float32)
        parts.append(Mb @ jnp.stack(cm0))
    for m in range(1, geom.max_m + 1):
        for coefs in (ams[m], bms[m]):
            if coefs:
                Mq = jnp.asarray(q2d_basis_matrix(len(coefs), m), jnp.float32)
                parts.append(Mq @ jnp.stack(coefs))
    if not parts:
        return None
    return jnp.concatenate(parts)


def pack_asphere_coeffs(model: OpticModel, params) -> jnp.ndarray:
    """[S-1, Cmax] per-surface geometry coefficients (even/odd asphere
    polynomial, row-major XY/Chebyshev grids, toroidal y-polynomial),
    zero-padded; a [S-1, 8]-aligned dummy when the system is all-conic
    (Pallas wants a real operand)."""
    vecs = []
    cmax = 1
    for k in range(1, model.num_surfaces):
        v = _geom_coeff_vector(model.surfaces[k],
                               params["surfaces"][k])
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


def _cos_sin_multiples(cost, sint, max_m: int):
    """cos(m*phi), sin(m*phi) for m = 0..max_m via the Chebyshev multiple-
    angle recurrence on (cos, sin) — no arctan2/cos/sin transcendentals in
    the kernel (algebraically exact vs the reference's cos(m*arctan2))."""
    cs = [jnp.ones_like(cost), cost]
    sn = [jnp.zeros_like(sint), sint]
    for m in range(2, max_m + 1):
        cs.append(2.0 * cost * cs[m - 1] - cs[m - 2])
        sn.append(2.0 * cost * sn[m - 1] - sn[m - 2])
    return cs[: max_m + 1], sn[: max_m + 1]


def _zernike_sag_grad(c, acoef, nu: int, ztype: str, xx, yy):
    """conic + sum c_i Z_i(rho/nr, phi): geometry/extras.py ZernikeSag
    (reference geometries/zernike.py:55-200), with static (n, m) term lists
    and radial-coefficient tables unrolled in the kernel."""
    from ..core.zernike import _norm_factor, _radial_coeffs, zernike_terms

    s, gx, gy = _conic_base(c[0], c[1], xx, yy)
    if nu == 0:
        return s, gx, gy
    nr = c[24]
    r2 = xx * xx + yy * yy
    r = jnp.sqrt(r2)
    r_safe = jnp.maximum(r, 1e-12)
    rho = r / nr
    cost = xx / r_safe
    sint = yy / r_safe
    terms = zernike_terms(ztype, nu)
    max_n = max(n for n, m in terms)
    max_m = max((abs(m) for n, m in terms), default=0)
    # rho powers 0..max_n
    rp = [jnp.ones_like(rho)]
    for _ in range(max_n):
        rp.append(rp[-1] * rho)
    cs, sn = _cos_sin_multiples(cost, sint, max_m)
    dz_drho = jnp.zeros_like(rho)
    dz_dphi = jnp.zeros_like(rho)
    for j, (n, m) in enumerate(terms):
        norm = _norm_factor(ztype, n, m)
        Rnm = jnp.zeros_like(rho)
        dR = jnp.zeros_like(rho)
        for p, coef in _radial_coeffs(n, m):
            Rnm = Rnm + coef * rp[p]
            if p > 0:
                dR = dR + float(p) * coef * rp[p - 1]
        if m > 0:
            ang, dang = cs[m], -float(m) * sn[m]
        elif m < 0:
            ang, dang = sn[-m], float(-m) * cs[-m]
        else:
            ang, dang = 1.0, 0.0
        cj = acoef[j] * norm
        s = s + cj * Rnm * ang
        dz_drho = dz_drho + cj * dR * ang
        dz_dphi = dz_dphi + cj * Rnm * dang
    inv_rs = 1.0 / r_safe
    gx = gx + dz_drho * xx * inv_rs / nr - dz_dphi * yy * inv_rs * inv_rs
    gy = gy + dz_drho * yy * inv_rs / nr + dz_dphi * xx * inv_rs * inv_rs
    return s, gx, gy


def _forbes_sigma(c, r2, rho):
    """sigma^-1 projection factor + rho-derivative in curvature form
    (geometry/forbes.py _conic_correction; c2 = radius_inv^2 makes the
    plane case exact with no branch)."""
    c2 = c[0] * c[0]
    k = c[1]
    num_arg = 1.0 - k * c2 * r2
    den_arg = 1.0 - (k + 1.0) * c2 * r2
    Nf = jnp.sqrt(jnp.where(num_arg > 0, num_arg, 1e-12))
    Df = jnp.sqrt(jnp.where(den_arg > 0, den_arg, 1e-12))
    factor = Nf / Df
    deriv = (c2 * rho) / (Nf * Df * Df * Df)
    return factor, deriv


def _qbfs_sag_grad(c, acoef, nu: int, xx, yy):
    """Forbes Qbfs (geometry/forbes.py ForbesQbfs.sag/sag_grad); acoef holds
    the PRE-basis-changed bs coefficients (see _geom_coeff_vector)."""
    from ..geometry.forbes import _clenshaw_qbfs, _clenshaw_qbfs_der

    r2 = xx * xx + yy * yy
    z_base, bx, by = _conic_base(c[0], c[1], xx, yy)
    if nu == 0:
        return z_base, bx, by
    nr = c[24]
    rho = jnp.sqrt(r2 + 1e-12)
    u = rho / nr
    usq_sag = r2 / (nr * nr)      # sag uses r2/nr^2 (no eps), grad uses u^2
    usq = u * u

    bs_list = [acoef[i] for i in range(nu)]

    def poly(us):
        al0 = _clenshaw_qbfs(bs_list, us)
        if nu > 1:
            sm = 2.0 * (al0[0] + al0[1])
            a1 = _clenshaw_qbfs_der(bs_list, us, al0)
            dsm = 2.0 * (a1[0] + a1[1])
        else:
            sm = 2.0 * al0[0]
            dsm = jnp.zeros_like(us)
        return sm, dsm

    poly_s, _ = poly(usq_sag)
    factor_s, _ = _forbes_sigma(c, r2, rho)
    departure = usq_sag * (1.0 - usq_sag) * factor_s * poly_s
    s = z_base + jnp.where(usq_sag > 1, 0.0, departure)

    poly_g, dpoly_dusq = poly(usq)
    ds_du = dpoly_dusq * 2.0 * u
    factor, dfactor_drho = _forbes_sigma(c, r2, rho)
    dpref_drho = (2.0 * u - 4.0 * u * usq) / nr
    dpoly_drho = ds_du / nr
    dS = (dpref_drho * factor * poly_g
          + (usq - usq * usq) * dfactor_drho * poly_g
          + (usq - usq * usq) * factor * dpoly_drho)
    dS = jnp.where(u >= 1, 0.0, dS)
    inv_rho = 1.0 / rho
    return s, bx + dS * xx * inv_rho, by + dS * yy * inv_rho


def _q2d_layout(terms: tuple):
    """(n_m0, len_a, len_b) static grouping of a Q2D terms tuple (mirrors
    geometry/forbes.py ForbesQ2d.__init__)."""
    n_m0 = max([n for n, m in terms if m == 0], default=-1) + 1
    max_m = max([abs(m) for n, m in terms if m != 0], default=0)
    len_a = [0] * (max_m + 1)
    len_b = [0] * (max_m + 1)
    for n, m in terms:
        if m > 0:
            len_a[m] = max(len_a[m], n + 1)
        elif m < 0:
            len_b[-m] = max(len_b[-m], n + 1)
    return n_m0, len_a, len_b


def _q2d_sag_grad(c, acoef, terms: tuple, xx, yy):
    """Forbes Q2D freeform (geometry/forbes.py ForbesQ2d); acoef holds the
    concatenated pre-basis-changed groups (_q2d_packed_coeffs layout)."""
    from ..geometry.forbes import (_clenshaw_q2d, _clenshaw_q2d_der,
                                   _clenshaw_qbfs, _clenshaw_qbfs_der,
                                   _q2d_sum)

    n_m0, len_a, len_b = _q2d_layout(terms)
    max_m = len(len_a) - 1

    r2 = xx * xx + yy * yy
    z_base, bx, by = _conic_base(c[0], c[1], xx, yy)
    nr = c[24]
    rho = jnp.sqrt(r2 + 1e-12)
    u = rho / nr
    usq = u * u
    # theta = arctan2(y, x') with the reference's center tweak; only
    # cos/sin(m*theta) are needed, built by recurrence
    small = rho < 1e-12
    xprime = jnp.where(small, xx + 1e-12, xx)
    rho2 = jnp.sqrt(xprime * xprime + yy * yy)
    cost = xprime / rho2
    sint = yy / rho2
    cs, sn = _cos_sin_multiples(cost, sint, max_m)

    zero = jnp.zeros_like(u)
    off = 0
    # m = 0 part (Qbfs machinery)
    if n_m0:
        bs_list = [acoef[off + i] for i in range(n_m0)]
        off += n_m0
        al0 = _clenshaw_qbfs(bs_list, usq)
        if n_m0 > 1:
            s_m0 = 2.0 * (al0[0] + al0[1])
            a1 = _clenshaw_qbfs_der(bs_list, usq, al0)
            ds_dusq = 2.0 * (a1[0] + a1[1])
        else:
            s_m0 = 2.0 * al0[0]
            ds_dusq = zero
        d_m0_du = ds_dusq * 2.0 * u
    else:
        s_m0, d_m0_du = zero, zero

    # u powers up to max_m
    up = [jnp.ones_like(u)]
    for _ in range(max_m):
        up.append(up[-1] * u)

    poly_mgt0 = zero
    dr_mgt0 = zero
    dt_mgt0 = zero
    for m in range(1, max_m + 1):
        s_a = s_b = sp_a = sp_b = zero
        for ln, is_a in ((len_a[m], True), (len_b[m], False)):
            if not ln:
                continue
            ds_list = [acoef[off + i] for i in range(ln)]
            off += ln
            al0 = _clenshaw_q2d(ds_list, m, usq)
            al1 = _clenshaw_q2d_der(ds_list, m, usq, al0)
            sv = _q2d_sum(al0, m, ln)
            spv = _q2d_sum(al1, m, ln)
            if is_a:
                s_a, sp_a = sv, spv
            else:
                s_b, sp_b = sv, spv
        um = up[m]
        umm1 = up[m - 1]
        poly_mgt0 = poly_mgt0 + um * (cs[m] * s_a + sn[m] * s_b)
        aterm = cs[m] * (2.0 * usq * sp_a + m * s_a)
        bterm = sn[m] * (2.0 * usq * sp_b + m * s_b)
        dr_mgt0 = dr_mgt0 + umm1 * (aterm + bterm)
        dt_mgt0 = dt_mgt0 + m * um * (-s_a * sn[m] + s_b * cs[m])

    factor, dfactor_drho = _forbes_sigma(c, r2, rho)
    departure = usq * (1.0 - usq) * factor * s_m0 + factor * poly_mgt0
    s = z_base + jnp.where(u > 1, 0.0, departure)

    dpref_drho = (2.0 * u - 4.0 * u * usq) / nr
    dpoly_drho = d_m0_du / nr
    dS0 = (dpref_drho * factor * s_m0
           + (usq - usq * usq) * dfactor_drho * s_m0
           + (usq - usq * usq) * factor * dpoly_drho)
    dSg = dfactor_drho * poly_mgt0 + factor * dr_mgt0 / nr
    dS_drho = jnp.where(u >= 1, 0.0, dS0 + dSg)
    dS_dtheta = jnp.where(u >= 1, 0.0, factor * dt_mgt0)
    inv_rho = 1.0 / rho
    gx = bx + dS_drho * xx * inv_rho - dS_dtheta * yy * inv_rho * inv_rho
    gy = by + dS_drho * yy * inv_rho + dS_dtheta * xx * inv_rho * inv_rho
    return s, gx, gy


def _polar_update(evecs, L0, M0, N0, L1, M1, N1, diag=None,
                  refract_only: bool = False, normal=None):
    """Real Jones-chain update (core/polarization.py
    polarization_update_matrix; reference rays/polarized_rays.py:115-153)
    applied DIRECTLY to the propagating E-field vectors: the surface matrix
    is rank-structured, M = js s s^T + jp p1 p0^T + j3 k1 k0^T, so instead
    of composing a per-ray 3x3 chain (81 FMA/surface) each E vector updates
    as E' = js (s.E) s + jp (p0.E) p1 + j3 (k0.E) k1 (~20 FMA) — the final
    intensity only ever needs the chain applied to the (at most two) launch
    field vectors, and matrix-chain and vector-propagation orderings are
    algebraically identical."""
    if diag is None and refract_only:
        # Bare-surface update is the pure rotation about u = k0 x k1 taking
        # k0 -> k1; Rodrigues with UNNORMALIZED u needs no rsqrt, no s/p
        # basis and no normal-incidence fallback:
        #   E' = cos(t) E + u x E + u (u.E)/(1 + cos(t)).
        # Refraction never deflects >= 90 deg, so 1 + cos(t) >= 1; mirrors
        # (possible 180-deg normal-incidence reflection) keep the s/p path.
        ux = M0 * N1 - N0 * M1
        uy = N0 * L1 - L0 * N1
        uz = L0 * M1 - M0 * L1
        ct = L0 * L1 + M0 * M1 + N0 * N1
        inv1c = 1.0 / (1.0 + ct)
        out = []
        for (ex, ey, ez) in evecs:
            ue = (ux * ex + uy * ey + uz * ez) * inv1c
            out.append((ct * ex + (uy * ez - uz * ey) + ux * ue,
                        ct * ey + (uz * ex - ux * ez) + uy * ue,
                        ct * ez + (ux * ey - uy * ex) + uz * ue))
        return tuple(out)
    if normal == "plane":
        # untilted flat surface, n = (0, 0, +-1): s ~ k0 x n collapses to
        # (-+M0, +-L0, 0) with |s|^2 = L0^2 + M0^2 — no cross products at
        # all (the sign is irrelevant: every s term in M is s-sign-even)
        sx = -M0
        sy = L0
        sz = jnp.zeros_like(L0)
        mag2 = L0 * L0 + M0 * M0
    elif normal is not None:
        # s ~ k0 x n: k1 always lies in span{k0, n}, so k0 x k1 = w (k0 x n)
        # and the s DIRECTION is identical — without the near-normal-
        # incidence cancellation that makes the k0 x k1 form's f32 direction
        # %-level noisy (w -> 0 faster than sin theta). The magnitude must
        # come from the components: 1 - (k0.n)^2 is itself a cancellation
        # at small theta (measured 1e-2 normalization error).
        nx, ny, nz = normal
        sx = M0 * nz - N0 * ny
        sy = N0 * nx - L0 * nz
        sz = L0 * ny - M0 * nx
        mag2 = sx * sx + sy * sy + sz * sz
    else:
        sx = M0 * N1 - N0 * M1
        sy = N0 * L1 - L0 * N1
        sz = L0 * M1 - M0 * L1
        mag2 = sx * sx + sy * sy + sz * sz
    # normal incidence: fall back to k0 x [1,0,0] = (0, N0, -M0); the
    # threshold (not ==0) guards against FMA residuals of a bit-identical
    # k0 == k1 being normalized into a garbage basis (core/polarization.py)
    fb = mag2 < 1e-12
    sx = jnp.where(fb, 0.0, sx)
    sy = jnp.where(fb, N0, sy)
    sz = jnp.where(fb, -M0, sz)
    mag2 = jnp.where(fb, N0 * N0 + M0 * M0, mag2)
    inv = jax.lax.rsqrt(jnp.where(mag2 > 0, mag2, 1.0))
    sx, sy, sz = sx * inv, sy * inv, sz * inv
    # p0 = k0 x s, p1 = k1 x s
    p0x = M0 * sz - N0 * sy
    p0y = N0 * sx - L0 * sz
    p0z = L0 * sy - M0 * sx
    p1x = M1 * sz - N1 * sy
    p1y = N1 * sx - L1 * sz
    p1z = L1 * sy - M1 * sx
    if diag is None:
        js = jp = j3 = 1.0
    else:
        js, jp, j3 = diag
    out = []
    for (ex, ey, ez) in evecs:
        ds = js * (sx * ex + sy * ey + sz * ez)
        dp = jp * (p0x * ex + p0y * ey + p0z * ez)
        dk = j3 * (L0 * ex + M0 * ey + N0 * ez)
        out.append((ds * sx + dp * p1x + dk * L1,
                    ds * sy + dp * p1y + dk * M1,
                    ds * sz + dp * p1z + dk * N1))
    return tuple(out)


def _fresnel_diag(n1, n2, cos_i, is_refl: bool):
    """Real Fresnel s/p coefficients (core/polarization.py fresnel_jones;
    reference jones.py JonesFresnel). Valid below TIR — evanescent rays are
    already masked invalid by the refraction discriminant."""
    n = n2 / n1
    sin2 = 1.0 - cos_i * cos_i
    rad = n * n - sin2
    root = jnp.sqrt(jnp.where(rad > _EPS, rad, _EPS))
    # one shared reciprocal instead of two per-ray divides (divides are
    # multi-op on the VPU; n, n*n are per-surface scalars)
    n2c = n * n * cos_i
    da = cos_i + root
    db = n2c + root
    inv = 1.0 / (da * db)
    if is_refl:
        js = (cos_i - root) * db * inv
        jp = (n2c - root) * da * inv
        return js, -jp, -1.0
    js = 2.0 * cos_i * db * inv
    jp = 2.0 * n * cos_i * da * inv
    return js, jp, 1.0


def _polar_init(state, L0, M0, N0):
    """Launch E-field vectors for the propagated-vector chain (reference
    polarized_rays._get_3d_electric_field): returns (evecs, scale) where the
    final intensity is scale * sum |E_final|^2. A complex launch state
    decomposes into real + imaginary projections (the chain is real); a
    LINEAR state needs only one vector, the unpolarized average two."""
    # launch basis: p = cross(k, x)/|.| = (0, N0, -M0)/|.|, s = cross(p, k)
    pxv = jnp.zeros_like(L0)
    pyv = N0
    pzv = -M0
    m2 = pyv * pyv + pzv * pzv
    inv = jax.lax.rsqrt(jnp.where(m2 > 0, m2, 1.0))
    pxv, pyv, pzv = pxv * inv, pyv * inv, pzv * inv
    sxv = pyv * N0 - pzv * M0
    syv = pzv * L0 - pxv * N0
    szv = pxv * M0 - pyv * L0

    def vec(ex_s, ey_p):
        return (ex_s * sxv + ey_p * pxv,
                ex_s * syv + ey_p * pyv,
                ex_s * szv + ey_p * pzv)

    if state is None or isinstance(state, str) or not state.is_polarized:
        return (vec(1.0, 0.0), vec(0.0, 1.0)), 0.5
    import math
    exr = state.Ex * math.cos(state.phase_x)
    exi = state.Ex * math.sin(state.phase_x)
    eyr = state.Ey * math.cos(state.phase_y)
    eyi = state.Ey * math.sin(state.phase_y)
    if exi == 0.0 and eyi == 0.0:
        return (vec(exr, eyr),), 1.0
    return (vec(exr, eyr), vec(exi, eyi)), 1.0


def _polar_intensity(evecs, scale):
    """Final intensity from the propagated field vectors (reference
    polarized_rays.update_intensity — overwrites from the chain and the
    LAUNCH intensity, which is 1 on this path)."""
    total = None
    for (ex, ey, ez) in evecs:
        sq = ex * ex + ey * ey + ez * ez
        total = sq if total is None else total + sq
    return total * scale


def _freeform_sag_grad(gkind: str, nu: int, nv: int, c, acoef, xx, yy,
                       gextra=None):
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
        sgn = _sign_pm(dz >= 0, dz)
        s = R - sgn * root
        sgnR = _sign_pm(R >= 0, R)
        inv_root = 1.0 / root
        gx = jnp.where(ok, sgnR * xx * inv_root, 0.0)
        gyt = jnp.where(ok, sgnR * dz * dzy * inv_root, 0.0)
        return s, gx, gyt
    if gkind == "zernike":
        return _zernike_sag_grad(c, acoef, nu, gextra, xx, yy)
    if gkind == "qbfs":
        return _qbfs_sag_grad(c, acoef, nu, xx, yy)
    if gkind == "q2d":
        return _q2d_sag_grad(c, acoef, gextra, xx, yy)
    raise ValueError(f"unknown kernel geometry kind {gkind!r}")


def _delta_rsqrt(d_arg, inv_c, inv_f):
    """rsqrt(a) - rsqrt(ac) given d_arg = a - ac, cancellation-free:
    = -(a - ac) * inv * inv_c / (sqrt(a) + sqrt(ac))."""
    s_f = 1.0 / inv_f
    s_c = 1.0 / inv_c
    return -d_arg * inv_f * inv_c / (s_f + s_c)


# ---- two-float (double-f32) helpers for the deviation-transport mode ------
# The focusing cancellation x_img = dx + t*dL subtracts APERTURE-scale
# quantities down to spot scale; Hubble's spot is ~1 ulp of its 1200-mm
# semi-aperture, so the aperture-scale position chain must carry more than
# one f32 significand. Dekker splitting (no FMA dependence — TPU VPU f32
# multiply-add rounding is not IEEE-FMA) gives exact products; Knuth
# TwoSum gives exact sums. AD note: every error term is algebraically zero
# (err = (a - (s - bv)) + (b - bv) with s = a + b), so its derivative is
# exactly zero and gradients flow through the hi chain only.

def _sign_pm(pred, ref):
    """+-1 in ``ref``'s dtype. A literal ``jnp.where(pred, 1.0, -1.0)``
    promotes to f64 under x64 (CPU test runs) and drags downstream tf
    arithmetic with it — the kernel must compute in f32 on CPU exactly as
    it does on TPU, or the test suite measures a different machine."""
    one = jnp.ones_like(ref)
    return jnp.where(pred, one, -one)


# ---- error-free transforms (EFT) vs the XLA algebraic simplifier -----------
# Jitted XLA (CPU test runs, and every TPU path that is NOT a compiled
# Mosaic kernel: packing, the chief-ray reference chain) applies
# real-arithmetic rewrites across fused graphs — e.g. x - (x - a) -> a,
# (s + e) - s -> e — that are exact over the reals but delete the lo-word
# corrections these transforms exist to capture. Measured (round 5): the
# jitted launch+mirror chain loses pe-level terms and lands 2e-5 mm off the
# eager result at Hubble scale, vs 2.4e-10 eager. `lax.optimization_barrier`
# on each EFT pivot blocks the pattern match (identity at runtime).
# Compiled Mosaic kernels run no XLA simplifier AND have no lowering rule
# for the barrier, so kernel tracing flips `_EFT_OPAQUE` off (see
# `_mosaic_trace`); interpret-mode kernels execute under XLA and keep it on.
_EFT_OPAQUE = [True]


def _ob(x):
    """Simplifier shield for an EFT pivot value (see note above)."""
    if _EFT_OPAQUE[0]:
        return jax.lax.optimization_barrier(x)
    return x


@contextlib.contextmanager
def _mosaic_trace(interpret: bool):
    """Trace a pallas kernel body: barriers stay on under interpret (XLA
    executes the body) and turn off for compiled Mosaic (no simplifier, no
    barrier lowering rule)."""
    prev = _EFT_OPAQUE[0]
    _EFT_OPAQUE[0] = bool(interpret)
    try:
        yield
    finally:
        _EFT_OPAQUE[0] = prev


def _two_sum(a, b):
    s = _ob(a + b)
    bv = _ob(s - a)
    err = (a - (s - bv)) + (b - bv)
    return s, err


def _split12(a):
    """Veltkamp split by mantissa masking: hi keeps the top half of the
    significand (12 bits f32 / 27 bits f64), lo = a - hi is exact
    (Sterbenz), and every cross product hi*hi', hi*lo', lo*lo' is exactly
    representable. The classic multiply form ``c = a*4097; hi = c-(c-a)``
    is NOT safe under jit: LLVM (XLA:CPU backend) contracts `a*4097 - x`
    into an FMA, which computes the product exactly and deletes the
    rounding error the split depends on — measured round 5 as every lo
    word downstream silently zeroed (5.9e-8 rel on tf_mul, plain-f32
    noise at Hubble scale). FMA contraction happens at codegen, AFTER
    optimization_barriers are expanded, so no barrier placement can guard
    it; the bitmask form has no multiply to contract."""
    a = jnp.asarray(a)
    if a.dtype == jnp.float64:
        # uneven 26/27 split: ah*bh (52b), ah*bl / al*bh (53b) stay exact;
        # only al*bl rounds, at 2^-106 relative — far below the pair's use
        bits = jax.lax.bitcast_convert_type(a, jnp.int64)
        hi = jax.lax.bitcast_convert_type(
            jnp.bitwise_and(bits, jnp.int64(-1 << 27)), jnp.float64)
    else:
        bits = jax.lax.bitcast_convert_type(a, jnp.int32)
        hi = jax.lax.bitcast_convert_type(
            jnp.bitwise_and(bits, jnp.int32(-1 << 12)), jnp.float32)
    return hi, a - hi


def _two_prod(a, b):
    """Error-free product from exact partial products (Dekker mul12,
    restructured): ah*bh, ah*bl, al*bh, al*bl are each exactly
    representable, so the only rounding happens in ADDS, and the error
    extraction rides _two_sum (adds/subs only). The textbook form
    ``err = (ah*bh - p) + ...`` with p = round(a*b) is FMA-contraction
    bait: `mul - p` contracted to an FMA computes a*b exactly and the
    extracted rounding error collapses to zero (see _split12). Returns a
    tf pair whose hi may differ from round(a*b) by 1 ulp — callers treat
    it as an opaque (hi, lo) value, never as the plain product."""
    # python-scalar operands (e.g. _tf_scale(x, 2.0)) must not drag the
    # bitcast split to f64 under x64: resolve via jax weak-type promotion
    dt = jnp.result_type(a, b)
    a = jnp.asarray(a, dt)
    b = jnp.asarray(b, dt)
    ah, al = _split12(a)
    bh, bl = _split12(b)
    u = ah * bh
    s1, e1 = _two_sum(ah * bl, al * bh)   # same-scale pair: exact
    p, e2 = _two_sum(u, s1)               # exact
    lo = (e1 + e2) + al * bl              # rounds at 2^-48 relative
    hi = _ob(p + lo)
    err = lo - (hi - p)
    return hi, err


def _tf_add(x, y):
    """Two-float + two-float (Dekker add22, ~7 flops); tf = (hi, lo)."""
    s, e = _two_sum(x[0], y[0])
    e = e + (x[1] + y[1])
    hi = _ob(s + e)
    lo = e - (hi - s)
    return hi, lo


def _tf_sum(*xs):
    acc = xs[0]
    for x in xs[1:]:
        acc = _tf_add(acc, x)
    return acc


def _tf_neg(x):
    return (-x[0], -x[1])


def _tf_prod(a, b):
    """single x single -> tf, exact."""
    return _two_prod(a, b)


def _tf_scale(x, s):
    """tf x single -> tf (exact product on the hi part)."""
    p, pe = _two_prod(x[0], s)
    return _tf_add((p, pe), (x[1] * s, jnp.zeros_like(pe)))


def _tf_mul(x, y):
    """tf x tf -> tf (mul22; drops the l*l term)."""
    p, pe = _two_prod(x[0], y[0])
    pe = pe + (x[0] * y[1] + x[1] * y[0])
    hi = _ob(p + pe)
    lo = pe - (hi - p)
    return hi, lo


def _tf_div1(x, den):
    """tf / single -> tf (one Newton refinement of the quotient)."""
    q1 = x[0] / den
    p, pe = _two_prod(q1, den)
    r = ((x[0] - p) - pe) + x[1]
    q2 = r / den
    return _two_sum(q1, q2)


def _tf_val(x):
    return x[0] + x[1]


def _tf_zero_like(a):
    z = jnp.zeros_like(a)
    return (z, z)


def _tf_div(x, y):
    """tf / tf with one quotient refinement (~1e-14 relative)."""
    q0 = x[0] / y[0]
    r = _tf_add(x, _tf_neg(_tf_scale(y, q0)))
    q1 = (r[0] + r[1]) / y[0]
    return _two_sum(q0, q1)


def _tf_sqrt(x):
    """tf sqrt via one Newton correction on the f32 seed (~1e-14 rel).
    Negative-clamped on the hi part (caller guards validity)."""
    xs = jnp.maximum(x[0], _EPS)
    s0 = jnp.sqrt(xs)
    p, pe = _two_prod(s0, s0)
    r = _tf_add(x, (-p, -pe))
    corr = (r[0] + r[1]) / (2.0 * s0)
    return _two_sum(s0, corr)


def _tf_rsqrt(x):
    """tf rsqrt via one Newton correction on the f32 seed."""
    r0 = jax.lax.rsqrt(jnp.maximum(x[0], _EPS))
    p, pe = _two_prod(r0, r0)
    xp = _tf_mul(x, (p, pe))
    e = (1.0 - xp[0]) - xp[1]
    corr = 0.5 * r0 * e
    return _two_sum(r0, corr)


def _df32_chain(c, x, y, z, L, M, N, opd, *, is_plane: bool, is_refl: bool):
    """One conic/plane refract/reflect surface in double-f32 (tf) arithmetic.
    Every kinematic input/output is a tf pair; ~47-bit effective significand
    makes both the gap-scale intersection cancellation AND the
    aperture-scale focusing cancellation (Hubble's spot is ~1 ulp of its
    1200-mm semi-aperture in single f32) numerically benign. Same math as
    _surface_step's conic branch (pre-advance + citardauq pairing kept for
    the chief-free validity test). Returns (x, y, z, L, M, N, opd, ok)."""
    one = jnp.ones_like(x[0])
    radius_inv, conic, n1, n2 = c[0], c[1], c[3], c[4]
    # two-float reciprocal radius (hi = c[0], lo = c[28]): the f32 rounding
    # of 1/R alone moves a conic's focus by ~ulp(focal), which at meter
    # scale coherently attenuates every focus-coupled merit gradient ~0.7x
    # (round-5 bisection) — the pair restores the evaluation point to ~47
    # bits; its lo word is AD-inert so gradients ride the hi word.
    ci_tf = (radius_inv, c[28])
    # shift into this surface's local frame (split convention: z arrives
    # local to the previous vertex)
    z = _tf_add(z, (-c[27] * one, jnp.zeros_like(one)))

    if is_plane:
        t = _tf_div(_tf_neg(z), N)
        ok = jnp.ones_like(x[0], bool)
    else:
        t0 = _tf_div(_tf_neg(z), N)
        x0 = _tf_add(x, _tf_mul(t0, L))
        y0 = _tf_add(y, _tf_mul(t0, M))
        n2_sq = _tf_mul(N, N)
        a = _tf_mul(_tf_add(_tf_scale(n2_sq, conic),
                            (one, jnp.zeros_like(one))), ci_tf)
        bh = _tf_add(_tf_mul(_tf_add(_tf_mul(L, x0), _tf_mul(M, y0)), ci_tf),
                     _tf_neg(N))
        cc = _tf_mul(_tf_add(_tf_mul(x0, x0), _tf_mul(y0, y0)), ci_tf)
        disc = _tf_add(_tf_mul(bh, bh), _tf_neg(_tf_mul(a, cc)))
        ok = disc[0] >= 0
        sq = _tf_sqrt(disc)
        sgn = _sign_pm(bh[0] >= 0, bh[0])
        q = _tf_neg(_tf_add(bh, _tf_scale(sq, sgn)))
        q_safe = (jnp.where(jnp.abs(q[0]) > _EPS, q[0],
                            jnp.where(q[0] >= 0, _EPS, -_EPS)), q[1])
        a_safe = (jnp.where(jnp.abs(a[0]) > _EPS, a[0],
                            jnp.where(a[0] >= 0, _EPS, -_EPS)), a[1])
        t_near = _tf_div(cc, q_safe)
        t_far = _tf_div(q_safe, a_safe)
        near = jnp.abs(t_near[0]) <= jnp.abs(t_far[0])
        tq = (jnp.where(near, t_near[0], t_far[0]),
              jnp.where(near, t_near[1], t_far[1]))
        okf = ok.astype(x[0].dtype)
        t = _tf_add(t0, (tq[0] * okf, tq[1] * okf))

    x = _tf_add(x, _tf_mul(t, L))
    y = _tf_add(y, _tf_mul(t, M))
    z = _tf_add(z, _tf_mul(t, N))
    opd = _tf_add(opd, _tf_scale(t, n1))

    # ---- normal + interaction (all tf) ------------------------------------
    if is_plane:
        if is_refl:
            L2, M2, N2 = L, M, _tf_neg(N)
        else:
            u = n1 / n2
            nsq = _tf_mul(N, N)
            disc_r = _tf_add((one, jnp.zeros_like(one)),
                             _tf_scale(_tf_add((one, jnp.zeros_like(one)),
                                               _tf_neg(nsq)), -u * u))
            ok = ok & (disc_r[0] >= 0)
            root = _tf_sqrt(disc_r)
            sN = _sign_pm(N[0] >= 0, N[0])
            L2 = _tf_scale(L, u)
            M2 = _tf_scale(M, u)
            N2 = _tf_scale(root, sN)
    else:
        r2 = _tf_add(_tf_mul(x, x), _tf_mul(y, y))
        ci2 = _tf_mul(ci_tf, ci_tf)
        arg = _tf_add((one, jnp.zeros_like(one)),
                      _tf_scale(_tf_mul(r2, ci2), -(1.0 + conic)))
        ir = _tf_rsqrt(arg)
        dfdx = _tf_mul(_tf_mul(x, ir), ci_tf)
        dfdy = _tf_mul(_tf_mul(y, ir), ci_tf)
        g2 = _tf_add(_tf_add(_tf_mul(dfdx, dfdx), _tf_mul(dfdy, dfdy)),
                     (one, jnp.zeros_like(one)))
        im = _tf_rsqrt(g2)
        nx = _tf_mul(dfdx, im)
        ny = _tf_mul(dfdy, im)
        nz = _tf_neg(im)
        dot = _tf_add(_tf_add(_tf_mul(L, nx), _tf_mul(M, ny)),
                      _tf_mul(N, nz))
        if is_refl:
            td = _tf_scale(dot, 2.0)
            L2 = _tf_add(L, _tf_neg(_tf_mul(td, nx)))
            M2 = _tf_add(M, _tf_neg(_tf_mul(td, ny)))
            N2 = _tf_add(N, _tf_neg(_tf_mul(td, nz)))
        else:
            u = n1 / n2
            dsq = _tf_mul(dot, dot)
            disc_r = _tf_add((one, jnp.zeros_like(one)),
                             _tf_scale(_tf_add((one, jnp.zeros_like(one)),
                                               _tf_neg(dsq)), -u * u))
            ok = ok & (disc_r[0] >= 0)
            root = _tf_sqrt(disc_r)
            sgn_d = _sign_pm(dot[0] >= 0, dot[0])
            w = _tf_add(_tf_scale(root, sgn_d), _tf_scale(dot, -u))
            L2 = _tf_add(_tf_scale(L, u), _tf_mul(nx, w))
            M2 = _tf_add(_tf_scale(M, u), _tf_mul(ny, w))
            N2 = _tf_add(_tf_scale(N, u), _tf_mul(nz, w))
    return x, y, z, L2, M2, N2, opd, ok, t


def _surface_step_xy(c, st, *, is_plane: bool, is_refl: bool,
                     absorbing: bool, has_ap: bool, has_coat: bool):
    """Double-f32 surface step (meter-scale f32 coordinates, SURVEY §7 hard
    part; VERDICT r4 item 8 — the coordinate analogue of the split-OPD
    mode). Scope: untilted conic/plane refract/reflect stacks, unpolarized.

    The whole kinematic state — per-ray AND a ()-shaped chief used only to
    reference the OPD output — rides two-float (hi, lo) double-f32
    arithmetic (_df32_chain): Dekker products need no FMA (the TPU VPU's
    f32 multiply-add rounding is not IEEE-FMA), and the ~47-bit effective
    significand puts full-scale-Hubble per-ray position noise at the
    1e-11-mm class instead of single-f32's 1.3e-3 mm (> the 2.2e-4-mm
    on-axis spot). Outputs round once to f32 at the very end: positions at
    ulp(|coordinate|), OPD as the deviation from the chief's tf OPD.
    """
    (xh, xl, yh, yl, zh, zl, Lh, Ll, Mh, Ml, Nh, Nl,
     inten, opdh, opdl, validf,
     cxh, cxl, cyh, cyl, czh, czl, cLh, cLl, cMh, cMl, cNh, cNl,
     coh, col) = st
    valid = validf > 0.5

    x, y, z, L, M, N, opd, ok, t = _df32_chain(
        c, (xh, xl), (yh, yl), (zh, zl), (Lh, Ll), (Mh, Ml), (Nh, Nl),
        (opdh, opdl), is_plane=is_plane, is_refl=is_refl)
    valid = valid & ok
    cx, cy, cz, cL, cM, cN, copd, _cok, _ct = _df32_chain(
        c, (cxh, cxl), (cyh, cyl), (czh, czl), (cLh, cLl), (cMh, cMl),
        (cNh, cNl), (coh, col), is_plane=is_plane, is_refl=is_refl)

    if absorbing:
        inten = inten * jnp.exp(-c[5] * (t[0] + t[1]) * 1e3)
    if has_ap:
        xa = x[0] - c[22]
        ya = y[0] - c[23]
        r2a = xa * xa + ya * ya
        inside = (r2a >= c[20]) & (r2a <= c[21])
        inten = inten * inside.astype(inten.dtype)
    if has_coat:
        inten = inten * c[6]

    return (x[0], x[1], y[0], y[1], z[0], z[1], L[0], L[1], M[0], M[1],
            N[0], N[1], inten, opd[0], opd[1], valid.astype(inten.dtype),
            cx[0], cx[1], cy[0], cy[1], cz[0], cz[1], cL[0], cL[1],
            cM[0], cM[1], cN[0], cN[1], copd[0], copd[1])



def _surface_step(c, x, y, z, L, M, N, inten, opd, valid=None, opd_c=None,
                  evecs=None, *,
                  is_plane: bool, is_refl: bool, absorbing: bool, acoef=None,
                  gkind: str = "conic", nu: int = 0, nv: int = 0,
                  has_cs: bool = False, has_ap: bool = False,
                  has_coat: bool = False, fresnel_coat: bool = False,
                  gextra=None, inter=None, split: bool = False,
                  sigma: float = 1.0):
    """One surface interaction; all elementwise VPU ops.

    is_plane/is_refl/absorbing/has_cs/has_ap/has_coat are STATIC (baked from
    the model at build): the unrolled loop emits only the ops each surface
    actually needs.

    Lost rays (conic miss / TIR) are carried with FINITE placeholder state and
    flagged in ``valid``; the caller injects NaN once at the end of the stack
    (same discipline as trace/real.py — keeping every intermediate finite is
    what keeps reverse-mode gradients NaN-free through lost rays).

    ``opd_c``: optional Kahan compensation accumulator — when not None, OPD
    accumulates with a compensated (two-sum) update so the f32 sum of large
    path lengths keeps full precision (SURVEY §7 OPD-cancellation hard part).

    Op-count notes (this kernel is VPU-compute-bound, not HBM-bound):
    - reflection R = d - 2(d.n)n is invariant under n -> -n, so the
      normal-alignment pass (sign + 3 muls) is skipped entirely;
    - refraction folds the alignment sign into a single multiply:
      with s = sign(d.n), w = s*sqrt(disc) - u*(d.n) reproduces the
      aligned-normal update u*d + n*w exactly;
    - the quadratic uses the half-b form (disc/4), saving the 2x/4x scales;
    - normals use one rsqrt instead of sqrt + guarded reciprocal.
    """
    if valid is None:
        valid = jnp.ones(x.shape, dtype=bool)
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
    elif split:
        # split-OPD frame convention: z arrives LOCAL to the previous
        # surface's vertex (sag-scale, f32-precise); shift by the vertex
        # gap for the intersection geometry. zp is kept for the exact
        # gap-path decomposition below.
        zp = z
        z = z - c[27]
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
    fresnel = gkind in ("fresnel_zone", "fresnel_designed")
    newton_geom = gkind != "conic" and not fresnel
    if is_plane or fresnel:
        # thin-Fresnel surfaces intersect at their base plane regardless of
        # the (finite) parent radius (geometry/extras.py FresnelZoneSag)
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
        q = -(bh + _sign_pm(bh >= 0, bh) * sq)
        t_far = q / jnp.where(jnp.abs(a) > _EPS,
                              a, jnp.where(a >= 0, _EPS, -_EPS))
        t_near = cc / jnp.where(jnp.abs(q) > _EPS,
                                q, jnp.where(q >= 0, _EPS, -_EPS))
        tq = jnp.where(jnp.abs(t_near) <= jnp.abs(t_far), t_near, t_far)
        tq = jnp.where(ok, tq, 0.0)
        t = t0 + tq
        valid = valid & ok

    if newton_geom:
        # ---- freeform: conic warm start + fixed Newton refinement
        # (geometry/base.py newton_distance): the iteration runs on
        # stop_gradient values, then ONE differentiable Newton step at the
        # converged root recovers exact implicit-function-theorem gradients
        # with O(1) AD residuals (no tape through the iterations). ----------
        sg = jax.lax.stop_gradient
        t_it = sg(t)
        x_s, y_s, z_s = sg(x), sg(y), sg(z)
        L_s, M_s, N_s = sg(L), sg(M), sg(N)
        c_s = sg(c)
        a_s = sg(acoef) if acoef is not None else None
        for _ in range(_NEWTON_ITERS):
            xx = x_s + t_it * L_s
            yy = y_s + t_it * M_s
            zz = z_s + t_it * N_s
            s, gx, gy = _freeform_sag_grad(gkind, nu, nv, c_s, a_s, xx, yy,
                                           gextra)
            f = s - zz
            dfdt = gx * L_s + gy * M_s - N_s
            dfdt = jnp.where(jnp.abs(dfdt) > _EPS, dfdt,
                             jnp.where(dfdt >= 0, _EPS, -_EPS))
            t_it = t_it - f / dfdt
        # final differentiable step (primal unchanged to O(f^2); the
        # tangent/cotangent is the exact IFT derivative -f_theta / f_t)
        xx = x + t_it * L
        yy = y + t_it * M
        zz = z + t_it * N
        s, gx, gy = _freeform_sag_grad(gkind, nu, nv, c, acoef, xx, yy,
                                       gextra)
        f = s - zz
        dfdt = gx * L + gy * M - N
        dfdt = jnp.where(jnp.abs(dfdt) > _EPS, dfdt,
                         jnp.where(dfdt >= 0, _EPS, -_EPS))
        t = t_it - f / dfdt

    # ---- propagate + OPD + absorption -----------------------------------
    x = x + t * L
    y = y + t * M
    z = z + t * N
    if split:
        # Meter-scale f32 OPD (SURVEY §7 hard part): never form n*t at gap
        # magnitude. With sigma = static propagation sign (so |N| = sigma*N)
        # and zp the entry z local to the previous vertex (sag-scale):
        #   n*t0 = n*(dz - zp)/N
        #        = n*|dz|                        [axial base: summed by the
        #                                         caller from the constants,
        #                                         identical for every ray]
        #        + n*|dz| * (1-|N|)/|N|          [B: (1-|N|) = (L^2+M^2)/(1+|N|)
        #                                         -- cancellation-free]
        #        - sigma*n*zp/|N|                [C: sag-scale]
        #   n*tq                                 [D: relative-precise root]
        # Only B+C+D (wavefront-relevant deviations) enter the per-ray
        # accumulator, Kahan-compensated; the f32 floor drops from
        # intersection roundoff (~ulp(gap)) to ~ulp(sag).
        aN = sigma * N
        onem = (L * L + M * M) / (1.0 + aN)
        dev = (n1 * sigma * c[27]) * (onem / aN) - (sigma * n1) * zp / aN
        if not (is_plane or fresnel) and not newton_geom:
            dev = dev + n1 * tq
        yk = dev - opd_c
        tk = opd + yk
        opd_c = (tk - opd) - yk
        opd = tk
    else:
        path = jnp.abs(t * n1)
        if opd_c is None:
            opd = opd + path
        else:
            # Kahan compensated accumulation (SURVEY §7): recovers the
            # low-order bits the plain f32 sum of ~1e3-mm path lengths
            # throws away
            yk = path - opd_c
            tk = opd + yk
            opd_c = (tk - opd) - yk
            opd = tk
    if split:
        # refresh z from the EXACT sag at the landed (x, y): the additive
        # z + t*N carries the absorbed gap-scale roundoff, the sag is
        # relative-precise
        if is_plane or fresnel:
            z = jnp.zeros_like(z)
        else:
            z = _conic_base(radius_inv, conic, x, y)[0]
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

    def _interact(nx, ny, nz, L, M, N, valid):
        # refract/reflect, alignment-free (rays/real_rays.py:141-181)
        dot = L * nx + M * ny + N * nz
        if is_refl:
            two_dot = 2.0 * dot
            return (L - two_dot * nx, M - two_dot * ny, N - two_dot * nz,
                    valid)
        u = n1 / n2
        disc_r = 1.0 - u * u * (1.0 - dot * dot)
        ok_r = disc_r >= 0
        root_r = jnp.sqrt(jnp.where(ok_r, disc_r, 1.0))
        w = jnp.sign(dot) * root_r - u * dot
        return (u * L + nx * w, u * M + ny * w, u * N + nz * w,
                valid & ok_r)

    # local-frame pre-interaction directions feed the polarization chain
    # (trace/real.py: apply_polarization_update BEFORE globalize, matching
    # the reference's frame-mixing convention)
    if evecs is not None:
        L_pre, M_pre, N_pre = L, M, N
    cos_i = None
    pol_normal = None

    # ---- conic/plane slope + unit normal (shared by the diffractive
    # branches; the refract/reflect branches below build their own) ---------
    if inter is not None:
        if is_plane:
            zero = jnp.zeros_like(x)
            dfdx = zero
            dfdy = zero
            nx, ny, nz = zero, zero, -jnp.ones_like(x)
        else:
            r2 = x * x + y * y
            arg = 1.0 - (1.0 + conic) * radius_inv * radius_inv * r2
            inv_root = jax.lax.rsqrt(jnp.where(arg > _EPS, arg, 1.0))
            dfdx = x * radius_inv * inv_root
            dfdy = y * radius_inv * inv_root
            inv_mag = jax.lax.rsqrt(dfdx * dfdx + dfdy * dfdy + 1.0)
            nx, ny, nz = dfdx * inv_mag, dfdy * inv_mag, -inv_mag

    if inter is not None and inter[0] == "grating":
        # ---- linear-grating diffraction, closed form (trace/real.py:159-171
        # -> core/rays.py grating_diffract; reference rays/real_rays.py:
        # 183-498 + geometries/standard_grating.py grating_vector) ----------
        # groove tangent t = normalize(1, tan a, dfdx + tan a * dfdy); the
        # grating vector f = -normalize(n x t) lies in the tangent plane
        ta = c[25]
        one = jnp.ones_like(x)
        tgx = one
        tgy = ta * one
        tgz = dfdx + ta * dfdy
        tinv = jax.lax.rsqrt(tgx * tgx + tgy * tgy + tgz * tgz)
        tgx, tgy, tgz = tgx * tinv, tgy * tinv, tgz * tinv
        fxv = ny * tgz - nz * tgy
        fyv = nz * tgx - nx * tgz
        fzv = nx * tgy - ny * tgx
        finv = jax.lax.rsqrt(fxv * fxv + fyv * fyv + fzv * fzv)
        fxv, fyv, fzv = -fxv * finv, -fyv * finv, -fzv * finv
        # period projection (trace/real.py:167): the effective period is the
        # nominal one divided by the xy-plane projection of f, so the
        # per-wavelength strength c[24] = m*lambda/period scales by it
        g = c[24] * jnp.sqrt(fxv * fxv + fyv * fyv)
        # align the normal along the ray (core/rays.py align_normal)
        dtn = L * nx + M * ny + N * nz
        sgn = _sign_pm(dtn >= 0, dtn)
        nxa, nya, nza = nx * sgn, ny * sgn, nz * sgn
        kx, ky, kz = n1 * L, n1 * M, n1 * N
        kdn = kx * nxa + ky * nya + kz * nza
        tx2 = kx - kdn * nxa + g * fxv
        ty2 = ky - kdn * nya + g * fyv
        tz2 = kz - kdn * nza + g * fzv
        disc_g = n2 * n2 - (tx2 * tx2 + ty2 * ty2 + tz2 * tz2)
        ok_g = disc_g >= 0
        kn = jnp.sqrt(jnp.where(ok_g, disc_g, 1.0))
        if is_refl:
            kn = -kn
            den = -n2
        else:
            den = n2
        Lo = (tx2 + kn * nxa) / den
        Mo = (ty2 + kn * nya) / den
        No = (tz2 + kn * nza) / den
        oinv = jax.lax.rsqrt(Lo * Lo + Mo * Mo + No * No)
        L, M, N = Lo * oinv, Mo * oinv, No * oinv
        valid = valid & ok_g
    elif inter is not None and inter[0] == "phase":
        # ---- phase/metasurface update (trace/real.py:172-205; reference
        # interactions/phase_interaction_model.py:45-127) -------------------
        _, pkind, plane_cls, eff = inter
        if plane_cls:
            # the Plane geometry CLASS reports a +z normal (reference
            # geometries/plane.py:79-92), unlike a standard surface at
            # radius=inf whose conic normal is -z; the alpha*n term makes
            # the update sign-sensitive, so reproduce the class's normal
            nx = jnp.zeros_like(x)
            ny = jnp.zeros_like(x)
            nz = jnp.ones_like(x)
        # profile phase + tangential gradient (system/phase.py; grid
        # profiles are XLA-only)
        if pkind == "constant":
            phase_val = c[24] * jnp.ones_like(x)
            pgx = jnp.zeros_like(x)
            pgy = jnp.zeros_like(x)
        elif pkind == "radial":
            r2p = x * x + y * y
            rp_ = jnp.sqrt(r2p)
            phase_val = jnp.zeros_like(x)
            d_dr = jnp.zeros_like(x)
            term = r2p
            rpow = rp_
            for i in range(nu):
                ci = acoef[i]
                phase_val = phase_val + ci * term
                d_dr = d_dr + ci * (2.0 * (i + 1.0)) * rpow
                term = term * r2p
                rpow = rpow * r2p
            safe_r = jnp.where(rp_ == 0, 1.0, rp_)
            pgx = (d_dr / safe_r) * x
            pgy = (d_dr / safe_r) * y
        else:  # linear_grating
            phase_val = c[24] * x + c[25] * y
            pgx = c[24] * jnp.ones_like(x)
            pgy = c[25] * jnp.ones_like(x)
        # surface-projected gradient G = pg - (pg.n)n (pg has no z part)
        gdn = pgx * nx + pgy * ny
        Gx = pgx - gdn * nx
        Gy = pgy - gdn * ny
        Gz = -gdn * nz
        k0 = 2.0 * jnp.pi / c[7]
        kix, kiy, kiz = n1 * k0 * L, n1 * k0 * M, n1 * k0 * N
        kdn = kix * nx + kiy * ny + kiz * nz
        kpx = kix - kdn * nx + Gx
        kpy = kiy - kdn * ny + Gy
        kpz = kiz - kdn * nz + Gz
        Rsq = (n2 * k0) ** 2 - (kpx * kpx + kpy * kpy + kpz * kpz)
        evan = Rsq < 0
        # evanescent orders are intensity-clipped, not invalidated
        # (trace/real.py:193 R.clip semantics)
        inten = inten * jnp.logical_not(evan).astype(inten.dtype)
        # double-where: sqrt'(0)=inf would poison grads at the clamp
        alpha_p = jnp.sqrt(jnp.where(evan, 1.0, jnp.maximum(Rsq, 0.0)))
        alpha_p = jnp.where(evan, 0.0, alpha_p)
        if is_refl:
            alpha_p = -alpha_p
        kox = kpx + alpha_p * nx
        koy = kpy + alpha_p * ny
        koz = kpz + alpha_p * nz
        minv = jax.lax.rsqrt(kox * kox + koy * koy + koz * koz)
        L, M, N = kox * minv, koy * minv, koz * minv
        # OPD -= phase/k0 (reference quirk: phase/k0 is um-scale while OPD
        # accumulates mm path lengths; reproduced exactly for parity)
        shift = -phase_val / k0
        if opd_c is None:
            opd = opd + shift
        else:
            yk = shift - opd_c
            tk = opd + yk
            opd_c = (tk - opd) - yk
            opd = tk
        if eff != 1.0:
            inten = inten * eff
    elif newton_geom:
        # ---- freeform normal + refract/reflect ----------------------------
        _, gx, gy = _freeform_sag_grad(gkind, nu, nv, c, acoef, x, y, gextra)
        inv_mag = jax.lax.rsqrt(gx * gx + gy * gy + 1.0)
        nx, ny, nz = gx * inv_mag, gy * inv_mag, -inv_mag
        if evecs is not None:
            cos_i = jnp.abs(L * nx + M * ny + N * nz)
            pol_normal = (nx, ny, nz)
        L, M, N, valid = _interact(nx, ny, nz, L, M, N, valid)
    elif gkind == "fresnel_designed":
        # designed facet slope m = -sin/(n_design - cos), tan = r/f
        # (geometry/extras.py FresnelDesignedSag._slope)
        r2 = x * x + y * y
        r = jnp.sqrt(r2)
        r_safe = jnp.maximum(r, 1e-12)
        f_len = c[24]
        hyp = jnp.sqrt(r2 + f_len * f_len)
        mslope = -(r / hyp) / (c[25] - f_len / hyp)
        dfdx = mslope * x / r_safe
        dfdy = mslope * y / r_safe
        inv_mag = jax.lax.rsqrt(dfdx * dfdx + dfdy * dfdy + 1.0)
        nx, ny, nz = dfdx * inv_mag, dfdy * inv_mag, -inv_mag
        if evecs is not None:
            cos_i = jnp.abs(L * nx + M * ny + N * nz)
            pol_normal = (nx, ny, nz)
        L, M, N, valid = _interact(nx, ny, nz, L, M, N, valid)
    elif is_plane and is_refl:
        # flat mirror, normal (0, 0, -1): d -> d - 2(d.n)n flips N only
        if evecs is not None:
            cos_i = jnp.abs(N)
            pol_normal = "plane"
        N = -N
    elif is_plane:
        # flat interface: Snell with normal (0, 0, 1)
        if evecs is not None:
            cos_i = jnp.abs(N)
            pol_normal = "plane"
        u = n1 / n2
        disc_r = 1.0 - u * u * (1.0 - N * N)
        ok_r = disc_r >= 0
        root_r = jnp.sqrt(jnp.where(ok_r, disc_r, 1.0))
        valid = valid & ok_r
        L = u * L
        M = u * M
        N = jnp.sign(N) * root_r
    else:
        # ---- conic normal (dfdx = x * ci / sqrt(1-(1+k) ci^2 r^2)); also
        # the fresnel_zone parent-profile slope (extras.py FresnelZoneSag:
        # the molded facets realize the parent conic's slope) ---------------
        r2 = x * x + y * y
        arg = 1.0 - (1.0 + conic) * radius_inv * radius_inv * r2
        inv_root = jax.lax.rsqrt(jnp.where(arg > _EPS, arg, 1.0))
        dfdx = x * radius_inv * inv_root
        dfdy = y * radius_inv * inv_root
        inv_mag = jax.lax.rsqrt(dfdx * dfdx + dfdy * dfdy + 1.0)
        nx, ny, nz = dfdx * inv_mag, dfdy * inv_mag, -inv_mag
        if evecs is not None:
            cos_i = jnp.abs(L * nx + M * ny + N * nz)
            pol_normal = (nx, ny, nz)
        L, M, N, valid = _interact(nx, ny, nz, L, M, N, valid)

    # ---- polarization chain (reference interactions/base.py:111-127:
    # coating.interact -> rays.update(jones), or rays.update() bare).
    # Grating/phase interactions do NOT update the chain (trace/real.py
    # only updates rays.p in the refract_reflect branch) --------------------
    if evecs is not None and inter is None:
        diag = _fresnel_diag(n1, n2, cos_i, is_refl) if fresnel_coat else None
        evecs = _polar_update(evecs, L_pre, M_pre, N_pre, L, M, N, diag,
                              refract_only=not is_refl, normal=pol_normal)

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
    elif not split:
        z = z + pos_z
    ret = [x, y, z, L, M, N, inten, opd, valid]
    if opd_c is not None:
        ret.append(opd_c)
    if evecs is not None:
        ret.append(evecs)
    return tuple(ret)


def _step_kwargs(flag):
    (is_plane, is_refl, absorbing, gkind, nu, nv, has_cs, has_ap,
     coat) = flag[:9]
    gextra = flag[9] if len(flag) > 9 else None
    inter = flag[10] if len(flag) > 10 else None
    if coat is True:     # legacy boolean flag form (hand-built test flags)
        coat = "simple"
    elif coat is False:
        coat = "none"
    return dict(is_plane=is_plane, is_refl=is_refl, absorbing=absorbing,
                gkind=gkind, nu=nu, nv=nv, has_cs=has_cs, has_ap=has_ap,
                has_coat=(coat == "simple"), fresnel_coat=(coat == "fresnel"),
                gextra=gextra, inter=inter)


def _nanify8(x, y, z, L, M, N, inten, opd, valid):
    """Inject NaN into the kinematic state of lost rays ONCE at the end of
    the stack (trace/real.py _nanify convention; intensity untouched). The
    where transposes to a clean cotangent mask, so parameter gradients stay
    finite through lost rays."""
    def m(v):
        return jnp.where(valid, v, jnp.nan)
    return m(x), m(y), m(z), m(L), m(M), m(N), inten, m(opd)


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
    valid = jnp.ones(x.shape, dtype=bool)
    for k, flag in enumerate(flags):
        c = consts_ref[k, :]
        a = acoef_ref[k, :]
        x, y, z, L, M, N, inten, opd, valid = _surface_step(
            c, x, y, z, L, M, N, inten, opd, valid, acoef=a,
            **_step_kwargs(flag))
    x, y, z, L, M, N, inten, opd = _nanify8(x, y, z, L, M, N, inten, opd,
                                            valid)
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
                 "biconic": "biconic", "toroidal": "toroidal",
                 "zernike": "zernike", "forbes_qbfs": "qbfs",
                 "forbes_q2d": "q2d", "fresnel_zone": "fresnel_zone",
                 "fresnel_designed": "fresnel_designed",
                 "standard_grating": "conic", "plane_grating": "conic"}


def model_flags(model: OpticModel, params) -> tuple:
    """Static per-surface specialization flags:
    (is_plane, is_reflective, absorbing, gkind, nu, nv, has_cs, has_ap,
    has_coat, gextra). ``gkind`` != "conic" selects the in-kernel Newton path
    with the matching freeform sag; nu/nv are the static coefficient counts
    (polynomial term count, or the XY/Chebyshev grid shape); ``gextra``
    carries per-kind static structure (the Zernike basis name, the Forbes
    Q2D (n, m) terms tuple)."""
    def _concrete_isinf(v, default):
        """Static inf check that stays safe under tracing (flags computed
        inside a jitted merit): the conic math handles radius_inv == 0
        exactly, so a tracer radius falls back to the general path."""
        try:
            return bool(np.isinf(np.asarray(v)))
        except (jax.errors.TracerArrayConversionError,
                jax.errors.ConcretizationTypeError):
            return default

    def _radius_isinf(spec, sp, key, default):
        """Prefer the host-side hint Optic.build() stamps on the geometry —
        a concrete check on device params is a device->host readback, which
        permanently degrades the axon dispatch path (utils/hostvals.py)."""
        hint = getattr(spec.geometry, "radius_is_inf" if key == "radius"
                       else "radius_rot_is_inf", None)
        if hint is not None:
            return hint
        return _concrete_isinf(sp["geom"].get(key, np.inf), default)

    flags = []
    for k in range(1, model.num_surfaces):
        spec = model.surfaces[k]
        sp = params["surfaces"][k]
        is_plane = _radius_isinf(spec, sp, "radius", False)
        pre = model.surfaces[k - 1]
        absorbing = model.surfaces[pre.material_src].material.absorbing
        gk = spec.geometry.kind
        gkind = _KERNEL_KINDS[gk]
        nu = nv = 0
        gextra = None
        if gk in ("even_asphere", "odd_asphere", "toroidal"):
            nu = spec.geometry.num_terms
        elif gk in ("polynomial_xy", "chebyshev"):
            nu, nv = spec.geometry.num_x, spec.geometry.num_y
        elif gk in ("zernike", "forbes_qbfs"):
            nu = spec.geometry.num_terms
            if gk == "zernike":
                gextra = spec.geometry.zernike_type
        elif gk == "forbes_q2d":
            gextra = spec.geometry.terms
            nu = len(spec.geometry.terms)
        if gk == "toroidal" and _radius_isinf(spec, sp, "radius_rot", False):
            gkind = "toroidal_inf"
        coat = "none" if spec.coating is None else spec.coating.kind
        # static interaction descriptor (None = refract/reflect):
        #   ("grating",)  or  ("phase", profile_kind, plane_class, efficiency)
        inter = None
        if spec.interaction == "grating":
            inter = ("grating",)
        elif spec.interaction == "phase":
            prof = spec.phase_profile
            if prof.kind == "radial":
                nu = prof.num_terms
            # the Plane geometry CLASS has a +z normal while a standard
            # surface at radius=inf has the conic -z normal — the phase
            # update's alpha*n term needs the real class (trace/real.py:176)
            inter = ("phase", prof.kind, gk == "plane",
                     float(prof.efficiency))
        flags.append((is_plane, spec.is_reflective, absorbing, gkind, nu, nv,
                      spec.has_tilt_decenter, spec.aperture is not None,
                      coat, gextra, inter))
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
    with _mosaic_trace(interpret):
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[const_spec, acoef_spec] + [ray_spec] * 8,
            out_specs=[ray_spec] * 8,
            out_shape=out_shape,
            interpret=interpret,
        )(consts, acoef, x, y, z, L, M, N, inten, opd)


def _polar_layout(polar_state):
    """(n_evecs, scale): static layout of the propagated E-vector state for a
    launch polarization (mirrors _polar_init's branching)."""
    if polar_state is None:
        return 0, 1.0
    if isinstance(polar_state, str) or not polar_state.is_polarized:
        return 2, 0.5
    import math
    exi = polar_state.Ex * math.sin(polar_state.phase_x)
    eyi = polar_state.Ey * math.sin(polar_state.phase_y)
    if exi == 0.0 and eyi == 0.0:
        return 1, 1.0
    return 2, 1.0


def _gen_prologue(gen, Px, Py, *, kahan: bool, polar_state,
                  split: bool = False, telecentric: bool = False,
                  apod=None):
    """Launch-state construction (generalized aiming,
    reference rays/ray_generator.py:28-107) -> flat state tuple:
    (x, y, z, L, M, N, inten, opd, validf[, opd_c][, ev0x, ev0y, ev0z, ...])
    with validity carried as f32 so every state leaf is a float (the manual
    per-surface reverse sweep in pallas_grad.py threads cotangents through
    the state, and bool leaves would need float0 plumbing).

    ``telecentric``: object-space telecentric aiming (trace/raygen.py
    generate_rays telecentric branch): x1 = Px*bx + x0 so the chief
    direction is field-independent; gen[5] carries the constant axial aim
    distance sqrt(1 - sin_u^2)/sin_u instead of EPL.
    ``apod``: static closed-form pupil apodization (system/apodization.py);
    evaluated IN-KERNEL on the pupil samples — scales the launch intensity,
    and for polarized launches scales the E vectors by sqrt(w) so the
    chain-overwritten final intensity still carries the launch weight
    (reference polarized_rays.update_intensity uses launch.intensity)."""
    # generalized launch: origin x0 = Px*A + xf (A = B for infinite-object
    # angle/paraxial-image fields, A = 0 for finite-object constant origins),
    # aim x1 = Px*B at the entrance pupil plane (reference
    # rays/ray_generator.py:28-107 across field_types.py)
    ax = gen[0]
    ay = gen[1]
    x_field = gen[2]
    y_field = gen[3]
    z0s = gen[4]
    epl = gen[5]
    bx = gen[8]
    by = gen[9]

    if split == "xy":
        # double-f32 launch: per-ray state AND the ()-shaped chief (OPD
        # reference) start as exact tf values; the whole normalize chain
        # rides tf so direction quantization (ulp(f32) x gap would be
        # ~1e-4 mm at telescope scale) never enters
        def launch(px, py):
            zero = jnp.zeros_like(px)
            xf_tf = (jnp.reshape(x_field, ()).astype(Px.dtype) + zero, zero)
            yf_tf = (jnp.reshape(y_field, ()).astype(Px.dtype) + zero, zero)
            x = _tf_add(_tf_prod(px, ax), xf_tf)
            y = _tf_add(_tf_prod(py, ay), yf_tf)
            if telecentric:
                dxr = _tf_prod(px, bx)
                dyr = _tf_prod(py, by)
                dzr = (jnp.reshape(epl, ()).astype(Px.dtype) + zero, zero)
            else:
                dxr = _tf_add(_tf_prod(px, bx), _tf_neg(x))
                dyr = _tf_add(_tf_prod(py, by), _tf_neg(y))
                dzr = (jnp.reshape(epl - z0s, ()).astype(Px.dtype) + zero,
                       zero)
            mag2 = _tf_add(_tf_add(_tf_mul(dxr, dxr), _tf_mul(dyr, dyr)),
                           _tf_mul(dzr, dzr))
            im = _tf_rsqrt(mag2)
            return x, y, (zero, zero), _tf_mul(dxr, im), \
                _tf_mul(dyr, im), _tf_mul(dzr, im)

        x, y, z, L, M, N = launch(Px, Py)
        zs = jnp.zeros((), Px.dtype)
        cx, cy, cz, cL, cM, cN = launch(zs, zs)
        if apod is not None:
            inten = apod(Px, Py) * jnp.ones_like(Px)
        else:
            inten = jnp.ones_like(Px)
        zero = jnp.zeros_like(Px)
        return (x[0], x[1], y[0], y[1], z[0], z[1], L[0], L[1], M[0], M[1],
                N[0], N[1], inten, zero, zero, jnp.ones_like(Px),
                cx[0], cx[1], cy[0], cy[1], cz[0], cz[1], cL[0], cL[1],
                cM[0], cM[1], cN[0], cN[1], zs, zs)

    x = Px * ax + x_field
    y = Py * ay + y_field
    z = jnp.full_like(Px, 1.0) * z0s
    if telecentric:
        # x1 = Px*bx + x0  ->  dxr = Px*bx; dzr = gen[5] = sqrt(1-s^2)/s
        dxr = Px * bx
        dyr = Py * by
        dzr = jnp.full_like(Px, 1.0) * epl
    else:
        x1 = Px * bx
        y1 = Py * by
        dxr = x1 - x
        dyr = y1 - y
        dzr = epl - z
    inv_mag = jax.lax.rsqrt(dxr * dxr + dyr * dyr + dzr * dzr)
    L = dxr * inv_mag
    M = dyr * inv_mag
    N = dzr * inv_mag
    if apod is not None:
        w_apod = apod(Px, Py)
        inten = w_apod * jnp.ones_like(Px)
    else:
        inten = jnp.ones_like(Px)
    opd = jnp.zeros_like(Px)
    if split:
        # split-OPD frame: the state's z is LOCAL to the launch plane
        # (zero there); aiming above used the true z
        z = jnp.zeros_like(Px)
    st = [x, y, z, L, M, N, inten, opd, jnp.ones_like(Px)]
    if kahan or split:
        st.append(jnp.zeros_like(Px))
    if polar_state is not None:
        # launch field vectors, propagated through every surface's
        # rank-structured Jones update (cheaper than composing the 3x3
        # chain; the final intensity is just sum |E|^2)
        evecs, _ = _polar_init(polar_state, L, M, N)
        if apod is not None:
            # double-where sqrt guard: apodization weights hit exactly 0
            # outside their support and sqrt'(0) = inf would NaN the Px
            # cotangent through the discarded branch
            pos = w_apod > 0
            s_apod = jnp.where(pos,
                               jnp.sqrt(jnp.where(pos, w_apod, 1.0)), 0.0)
            evecs = tuple(tuple(c * s_apod for c in v) for v in evecs)
        for v in evecs:
            st.extend(v)
    return tuple(st)


def _state_step(flag, kahan: bool, n_ev: int, split=False,
                sigma: float = 1.0):
    """One-surface step on the flat state tuple; positional array args only,
    so the backward kernel can jax.vjp it per surface (manual remat).
    ``split``: False | True (split-OPD) | "xy" (deviation transport)."""
    kw = _step_kwargs(flag)
    if split == "xy":
        kw_xy = dict(is_plane=kw["is_plane"], is_refl=kw["is_refl"],
                     absorbing=kw["absorbing"], has_ap=kw["has_ap"],
                     has_coat=kw["has_coat"])

        def step_xy(c, a, st):
            return _surface_step_xy(c, st, **kw_xy)
        return step_xy
    has_c = kahan or split

    def step(c, a, st):
        x, y, z, L, M, N, inten, opd, validf = st[:9]
        idx = 9
        opd_c = None
        if has_c:
            opd_c = st[idx]
            idx += 1
        evecs = None
        if n_ev:
            flat = st[idx:idx + 3 * n_ev]
            evecs = tuple(tuple(flat[3 * i:3 * i + 3]) for i in range(n_ev))
        out = _surface_step(c, x, y, z, L, M, N, inten, opd, validf > 0.5,
                            opd_c, evecs, acoef=a, split=split, sigma=sigma,
                            **kw)
        x, y, z, L, M, N, inten, opd, valid = out[:9]
        rest = out[9:]
        new = [x, y, z, L, M, N, inten, opd, valid.astype(inten.dtype)]
        if has_c:
            new.append(rest[0])
            rest = rest[1:]
        if n_ev:
            for v in rest[0]:
                new.extend(v)
        return tuple(new)
    return step


def _gen_epilogue(st, gen, *, kahan: bool, n_ev: int, pol_scale,
                  final_prop: bool, split=False):
    """Final intensity (polarized chains), image propagation, NaN injection."""
    if split == "xy":
        (xh, xl, yh, yl, zh, zl, Lh, Ll, Mh, Ml, Nh, Nl,
         inten, opdh, opdl, validf,
         _cx0, _cx1, _cy0, _cy1, _cz0, _cz1, _cl0, _cl1, _cm0, _cm1,
         _cn0, _cn1, coh, col) = st
        x = (xh, xl)
        y = (yh, yl)
        z = (zh, zl)
        if final_prop:
            t_img = gen[6]
            x = _tf_add(x, _tf_scale((Lh, Ll), t_img))
            y = _tf_add(y, _tf_scale((Mh, Ml), t_img))
            z = _tf_add(z, _tf_scale((Nh, Nl), t_img))
        # one rounding to f32 at the very end: positions at
        # ulp(|coordinate|); OPD as the tf deviation from the chief's tf
        # OPD (the wrapper returns the chief base separately)
        opd_dev = _tf_add((opdh, opdl), (-coh, -col))
        return _nanify8(x[0] + x[1], y[0] + y[1], z[0] + z[1],
                        Lh + Ll, Mh + Ml, Nh + Nl,
                        inten, opd_dev[0] + opd_dev[1], validf > 0.5)
    x, y, z, L, M, N, inten, opd, validf = st[:9]
    # split mode: z stays LOCAL to the last surface's vertex — the wrapper
    # adds the global offset back (or keeps local for precision-sensitive
    # consumers like the split wavefront path)
    idx = 9 + (1 if (kahan or split) else 0)
    if n_ev:
        flat = st[idx:idx + 3 * n_ev]
        evecs = tuple(tuple(flat[3 * i:3 * i + 3]) for i in range(n_ev))
        # reference quirk, kept for parity (polarized_rays.update_intensity):
        # final intensity comes from the chain and the LAUNCH intensity,
        # overwriting per-surface aperture/coating factors
        inten = _polar_intensity(evecs, pol_scale)
    if final_prop:
        t_img = gen[6]
        x = x + t_img * L
        y = y + t_img * M
        z = z + t_img * N
    return _nanify8(x, y, z, L, M, N, inten, opd, validf > 0.5)


def _gen_pipeline(gen, c_all, a_all, Px, Py, *, flags: tuple,
                  final_prop: bool = False, kahan: bool = False,
                  polar_state=None, split: bool = False,
                  telecentric: bool = False, apod=None):
    """Pure generation + trace pipeline over one monochromatic ray tile.

    ``gen``: [16] vector [origin_px_coeff x/y, x_field, y_field, z0, epl,
    t_img, 0, aim_px_coeff x/y, 0...] (generalized aiming, reference
    rays/ray_generator.py:28-107). ``c_all``: [S, 32] per-surface constants;
    ``a_all``: [S, C] geometry coefficients; Px/Py: pupil-sample tile.

    Composed of _gen_prologue -> _state_step per surface -> _gen_epilogue,
    shared verbatim by the forward kernel and the backward kernel's manual
    per-surface reverse sweep (pallas_grad.py), so forward and reverse stay
    one code path. Returns the 8 final arrays with NaN injected for lost
    rays.
    """
    n_ev, pol_scale = _polar_layout(polar_state)
    st = _gen_prologue(gen, Px, Py, kahan=kahan, polar_state=polar_state,
                       split=split, telecentric=telecentric, apod=apod)
    sigma = 1.0
    for k, flag in enumerate(flags):
        st = _state_step(flag, kahan, n_ev, split, sigma)(
            c_all[k, :], a_all[k, :], st)
        if flag[1]:                    # reflective: propagation sign flips
            sigma = -sigma
    return _gen_epilogue(st, gen, kahan=kahan, n_ev=n_ev,
                         pol_scale=pol_scale, final_prop=final_prop,
                         split=split)


def _gen_kernel(gen_ref, consts_ref, acoef_ref, px_ref, py_ref,
                xo, yo, zo, lo, mo, no, io, oo, *, flags: tuple,
                final_prop: bool = False, kahan: bool = False,
                polar_state=None, split: bool = False,
                telecentric: bool = False, apod=None):
    """Fused ray-generation + trace: inputs are just the pupil samples.
    With ``final_prop``, the post-image-surface propagation by the image
    thickness (raytrace/real_ray_tracer.py:85-92) is fused in as well, so the
    whole reference trace() pipeline is one kernel.

    consts_ref block is [1, S, 32] (grid axis 0 = wavelength: each block is
    monochromatic with its own per-surface constants); gen_ref holds the
    whole [F, 16] per-field launch-constant table (grid axis 1 = field —
    VERDICT r4 item 2, same shape of solution as the wavelength axis, zero
    per-ray gathers); the block's row is selected with a one-hot reduction
    (Mosaic requires whole-array or (8,128)-divisible blocks, and F is
    neither).
    """
    from jax.experimental import pallas as pl

    f = pl.program_id(1)
    ohF = jax.lax.broadcasted_iota(jnp.int32, (gen_ref.shape[0], 1), 0) == f
    gen_row = jnp.sum(jnp.where(ohF, gen_ref[...], 0.0), axis=0)
    x, y, z, L, M, N, inten, opd = _gen_pipeline(
        gen_row, consts_ref[0], acoef_ref[:], px_ref[:], py_ref[:],
        flags=flags, final_prop=final_prop, kahan=kahan,
        polar_state=polar_state, split=split, telecentric=telecentric,
        apod=apod)
    xo[0, 0] = x
    yo[0, 0] = y
    zo[0, 0] = z
    lo[0, 0] = L
    mo[0, 0] = M
    no[0, 0] = N
    io[0, 0] = inten
    oo[0, 0] = opd


@functools.partial(jax.jit, static_argnames=("flags", "block_rows",
                                             "final_prop", "interpret",
                                             "kahan", "polar_state",
                                             "split", "telecentric", "apod"))
def _pallas_gen_trace_2d(gen, consts, acoef, Px, Py, flags: tuple,
                         block_rows: int, final_prop: bool = False,
                         interpret: bool = False, kahan: bool = False,
                         polar_state=None, split: bool = False,
                         telecentric: bool = False, apod=None):
    """Grid is (W, F, ray blocks): axis 0 selects the per-wavelength
    constant set, axis 1 the per-field launch constants; every block reuses
    the same pupil samples (the reference traces the same pupil distribution
    per field and wavelength, raytrace/real_ray_tracer.py:74-77)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    W = consts.shape[0]
    F = gen.shape[0]
    S = len(flags)
    rows, lanes = Px.shape
    grid = (W, F, rows // block_rows)
    ray_in_spec = pl.BlockSpec((block_rows, lanes), lambda w, f, i: (i, 0),
                               memory_space=pltpu.VMEM)
    ray_out_spec = pl.BlockSpec((1, 1, block_rows, lanes),
                                lambda w, f, i: (w, f, i, 0),
                                memory_space=pltpu.VMEM)
    gen_spec = pl.BlockSpec((F, 16), lambda w, f, i: (0, 0),
                            memory_space=pltpu.VMEM)
    const_spec = pl.BlockSpec((1, S, _CONST_W), lambda w, f, i: (w, 0, 0),
                              memory_space=pltpu.VMEM)
    acoef_spec = pl.BlockSpec(acoef.shape, lambda w, f, i: (0, 0),
                              memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct((W, F, rows, lanes), Px.dtype)] * 8
    kernel = functools.partial(_gen_kernel, flags=flags,
                               final_prop=final_prop, kahan=kahan,
                               polar_state=polar_state, split=split,
                               telecentric=telecentric, apod=apod)
    with _mosaic_trace(interpret):
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[gen_spec, const_spec, acoef_spec, ray_in_spec,
                      ray_in_spec],
            out_specs=[ray_out_spec] * 8,
            out_shape=out_shape,
            interpret=interpret,
        )(gen, consts, acoef, Px, Py)


def pallas_gen_trace_conic(model: OpticModel, params, Px, Py, wavelength,
                           Hx: float = 0.0, Hy: float = 0.0,
                           block_rows: int = 128, flags: tuple | None = None,
                           final_prop: bool = False,
                           interpret: bool = False, kahan: bool = False,
                           differentiable: bool = False,
                           opd_split: bool = False,
                           keep_local_z: bool = False,
                           apodization=None,
                           coord_split: bool = False):
    """Fused generation + trace: the kernel's only array inputs are the
    normalized pupil samples (8 bytes/ray HBM read), everything else lives
    in VMEM. ``final_prop`` fuses the image-thickness propagation too (the
    full reference trace() pipeline).

    ``wavelength``: a scalar traces one bundle of ``len(Px)`` rays; a 1-D
    array of W wavelengths traces the same pupil samples at every wavelength
    in one kernel launch (grid axis), wavelength-major output.
    ``Hx``/``Hy``: scalars, or 1-D arrays of F field points — the grid gains
    a field axis exactly like the wavelength one (per-field launch
    constants, VERDICT r4 item 2); the W*F*len(Px) output rays are ordered
    (wavelength, field, pupil), matching the XLA path's vmap-over-wl of the
    field-major trace().
    ``apodization``: closed-form pupil apodization evaluated in-kernel on
    the launch intensity (system/apodization.py; any kind whose
    get_intensity is branch-free jnp math).

    ``kahan``: compensated OPD accumulation (SURVEY §7 f32 hard part).
    ``differentiable``: route through the custom_vjp core (pallas_grad.py) so
    jax.grad of any function of the returned rays runs a fused Pallas
    backward kernel instead of falling back to (or failing on) XLA AD.
    ``opd_split``: meter-scale f32 OPD (requires supports_split_opd): rays
    come back with opd = DEVIATION from the axial reference path, and the
    function returns ``(rays, opd_base)`` with the per-wavelength scalar
    base (total OPD = base + deviation; wavefront work differences the
    deviations directly, which is where the f32 precision lives).
    ``coord_split``: meter-scale f32 COORDINATES (VERDICT r4 item 8;
    requires supports_split_xy): the whole kinematic state rides the
    deviation-transport step (_surface_step_xy) against an in-kernel chief
    ray, so positions/directions/spot merits — and their custom_vjp
    gradients — keep full relative precision at telescope scale. Returns
    ``(rays, opd_base)`` like opd_split, with opd the deviation from the
    CHIEF path and base the chief's own OPD per (wavelength, field).
    """
    from ..trace.paraxial import Paraxial
    from ..core.rays import Rays

    assert supports_model(model)
    assert gen_eligible(model)
    if flags is None:
        flags = model_flags(model, params)
    wl = jnp.asarray(wavelength)
    wls = jnp.atleast_1d(wl)
    consts = pack_surface_constants(model, params, wls)  # [W, S-1, 32]

    from ..trace.raygen import _ray_origins, vig_factor

    par = Paraxial(model, params)
    pos = positions_from_params(params)
    EPL = par.EPL()
    EPD = par.EPD()
    telecentric = bool(model.obj_space_telecentric)

    field_vec = jnp.ndim(Hx) == 1 or jnp.ndim(Hy) == 1
    Hxa = jnp.atleast_1d(jnp.asarray(Hx, jnp.float32))
    Hya = jnp.atleast_1d(jnp.asarray(Hy, jnp.float32))
    Hxa, Hya = jnp.broadcast_arrays(Hxa, Hya)
    F = Hxa.shape[0]

    def gen_row(hx, hy):
        # vignetting scales the pupil samples (raygen: Px *= 1-vx);
        # eligibility pins vig to 0 numerically, but folding it into the
        # half-EPD keeps d(merit)/d(vig) exact instead of silently zero
        vxf, vyf = vig_factor(model, params, hx, hy)
        vx = 1.0 - jnp.reshape(vxf, ())
        vy = 1.0 - jnp.reshape(vyf, ())
        # constant launch terms from the shared per-field-type origin math
        # (trace/raygen.py _ray_origins at the pupil-center sample — the
        # origin is Px*A + xf, so Px=0 isolates xf; A is EPD/2*(1-v) for the
        # infinite-object aimed-origin field types and 0 for constant
        # origins)
        x0c, y0c, z0c = _ray_origins(model, params, par, hx, hy,
                                     jnp.zeros((1,)), jnp.zeros((1,)),
                                     vx, vy)
        xf = jnp.reshape(x0c[0], ())
        yf = jnp.reshape(y0c[0], ())
        z0s = jnp.reshape(z0c[0], ())
        if model._object_infinite:
            ax = EPD / 2 * vx
            ay = EPD / 2 * vy
        else:
            ax = jnp.zeros(())
            ay = jnp.zeros(())
        if telecentric:
            # telecentric aim (trace/raygen.py generate_rays): x1 = Px*vx
            # + x0; the axial aim distance sqrt(1-sin_u^2)/sin_u rides the
            # EPL slot
            sin_u = jnp.reshape(params["aperture_value"], ())
            aim_z = jnp.sqrt(1.0 - sin_u * sin_u) / sin_u
            bx = vx
            by = vy
            epl_slot = aim_z
        else:
            bx = EPD / 2 * vx
            by = EPD / 2 * vy
            epl_slot = EPL
        t_img = jnp.reshape(params["surfaces"][-1]["thickness"], ())
        return jnp.stack([ax, ay, xf, yf, z0s, epl_slot, t_img,
                          jnp.zeros(()), bx, by] + [jnp.zeros(())] * 6)

    gen = jnp.stack([gen_row(Hxa[f], Hya[f])
                     for f in range(F)]).astype(jnp.float32)

    split_mode = False
    if coord_split:
        assert supports_split_xy(model), \
            "coord_split needs an untilted unpolarized conic/plane stack"
        split_mode = "xy"
    elif opd_split:
        assert supports_split_opd(model), \
            "opd_split needs an untilted conic/plane refract/reflect stack"
        split_mode = True
    if split_mode:
        # surface 1's vertex gap is measured from the LAUNCH plane
        consts = consts.at[:, 0, 27].set(
            (pos[1] - gen[0, 4]).astype(consts.dtype))

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
    polar_state = None if model.polarization == "ignore" \
        else model.polarization
    if differentiable:
        from .pallas_grad import diff_gen_trace
        core = diff_gen_trace(flags, block_rows, final_prop, interpret, kahan,
                              polar_state, split_mode, telecentric,
                              apodization)
        out = core(gen, consts, acoef, shape(Px), shape(Py))
    else:
        out = _pallas_gen_trace_2d(gen, consts, acoef, shape(Px), shape(Py),
                                   flags=flags, block_rows=block_rows,
                                   final_prop=final_prop, interpret=interpret,
                                   kahan=kahan, polar_state=polar_state,
                                   split=split_mode, telecentric=telecentric,
                                   apod=apodization)
    W = wls.shape[0]
    x, y, z, L, M, N, inten, opd = [
        o.reshape(W, F, -1)[:, :, :n] for o in out]
    wl_col = jnp.broadcast_to(wls.astype(jnp.float32)[:, None, None],
                              (W, F, n))
    if wl.ndim == 0 and not field_vec:
        x, y, z, L, M, N, inten, opd, wl_col = [
            v[0, 0] for v in (x, y, z, L, M, N, inten, opd, wl_col)]
    elif wl.ndim == 0:
        x, y, z, L, M, N, inten, opd, wl_col = [
            v[0].reshape(-1) for v in (x, y, z, L, M, N, inten, opd, wl_col)]
    else:
        x, y, z, L, M, N, inten, opd, wl_col = [
            v.reshape(-1) for v in (x, y, z, L, M, N, inten, opd, wl_col)]
    if split_mode and not keep_local_z:
        z = z + pos[-1].astype(z.dtype)
    rays_out = Rays(x=x, y=y, z=z, L=L, M=M, N=N, intensity=inten,
                    wavelength=wl_col, opd=opd, p=None)
    if not split_mode:
        return rays_out
    if coord_split:
        # chief base OPD: run the SAME xy pipeline on the single
        # pupil-center ray in plain XLA (scalar shapes) and read the
        # chief accumulator — the deviation in rays.opd plus this base is
        # the absolute OPD (relative-precise where it matters: across the
        # pupil the base is common)
        def chief_opd(gen_row, consts_w):
            st = _gen_prologue(gen_row, jnp.zeros(()), jnp.zeros(()),
                               kahan=False, polar_state=None, split="xy",
                               telecentric=telecentric, apod=None)
            sigma = 1.0
            for k, flag in enumerate(flags):
                st = _state_step(flag, False, 0, "xy", sigma)(
                    consts_w[k], acoef[k], st)
                if flag[1]:
                    sigma = -sigma
            return st[28] + st[29]   # chief OPD accumulator (tf fold)

        base = jax.vmap(lambda cw: jax.vmap(
            lambda g: chief_opd(g, cw))(gen))(consts)   # [W, F]
        if wl.ndim == 0 and not field_vec:
            base = base[0, 0]
        elif wl.ndim == 0:
            base = base[0]
        elif not field_vec:
            base = base[:, 0]
        return rays_out, base
    # axial reference path: sum_k sigma_k * n1_k * dz_k from the constants
    # (per wavelength; identical for every ray — the deviation in rays.opd
    # plus this base is the absolute OPD)
    sigma = 1.0
    sigmas = []
    for flag in flags:
        sigmas.append(sigma)
        if flag[1]:
            sigma = -sigma
    sig = jnp.asarray(sigmas, consts.dtype)
    base = jnp.sum(sig[None, :] * consts[:, :, 3] * consts[:, :, 27], axis=1)
    if wl.ndim == 0:
        base = base[0]
    return rays_out, base


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
