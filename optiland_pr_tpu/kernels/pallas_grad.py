"""custom_vjp for the fused Pallas gen+trace kernel (VERDICT r2 item 1).

The forward pass is ``pallas_trace._pallas_gen_trace_2d`` (ray state lives in
VMEM for the whole surface stack). The backward pass here is a SECOND Pallas
kernel over the same grid: each tile recomputes the forward pipeline from the
(tiny) primal inputs and reverse-walks it surface by surface (``_manual_vjp``:
boundary-state checkpointing + one ``jax.vjp`` per surface — Mosaic has no
remat2 lowering, so jax.checkpoint is not an option in-kernel) — every
transpose is elementwise VPU code, the per-surface-constant cotangents reduce
over the tile in VMEM, and cross-tile accumulation uses the sequential-grid
revisiting pattern (init at the first visit, += after).

Recompute-in-backward is the right trade here: the primal inputs are ~8 bytes
per ray (the pupil samples) while stashing per-surface ray state would write
32*S bytes/ray of HBM in forward; the freeform Newton solves iterate under
stop_gradient with one differentiable IFT step (pallas_trace._surface_step),
so the AD residuals of a tile stay small enough for VMEM at modest block
sizes.

Gradient semantics match the XLA path (trace/real.py): lost rays carry finite
placeholders and are NaN-masked once at the end, so their cotangents are
zeroed by the transpose of the final ``where`` and parameter gradients stay
finite (reference gradient contract: optiland's torch backend,
optimization/optimizer/torch/base.py:95-154).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .pallas_trace import _CONST_W, _gen_pipeline, _pallas_gen_trace_2d

__all__ = ["diff_gen_trace"]

import os

# Backward tiles: the boundary states plus the compiler's retained buffers
# still cap the tile at rows*S ~ 384 on v5e (measured round 4: Cooke rows
# 32 -> 3.51e8 grad-rays/s, 64 -> 3.72e8, 128 -> VMEM OOM; double-Gauss
# rows 64 -> OOM 18.7M/16M, 32 ok) — the manual per-surface reverse sweep
# matched the round-3 whole-pipeline vjp's throughput, not exceeded it.
_BWD_ROW_SURFACE_BUDGET = 384
_BWD_ENV = os.environ.get("OPTILAND_BWD_BLOCK_ROWS")


def _bwd_rows(num_surfaces: int, block_rows: int) -> int:
    # Never exceed the FORWARD block size: the padded row count is only
    # guaranteed to be a multiple of block_rows, and a larger backward block
    # would make the grid rows // bwd_rows == 0 — an empty launch whose
    # outputs are uninitialized garbage.
    if _BWD_ENV:
        # round DOWN to a power of two <= block_rows: the padded row count is
        # a multiple of block_rows (a power of two), so any non-divisor env
        # value would truncate grid = rows // bwd_rows and silently drop the
        # trailing rows' cotangents
        env = max(1, min(int(_BWD_ENV), block_rows))
        pow2 = 1
        while pow2 * 2 <= env:
            pow2 *= 2
        return pow2
    rows = _BWD_ROW_SURFACE_BUDGET // max(num_surfaces, 1)
    pow2 = 8
    while pow2 * 2 <= rows:
        pow2 *= 2
    return max(1, min(pow2, 64, block_rows))


def _manual_vjp(gen, c, a, Px, Py, cots, *, flags, final_prop, kahan,
                polar_state, split=False, telecentric=False, apod=None):
    """Per-surface reverse sweep with boundary-state checkpointing.

    A single jax.vjp over the whole pipeline keeps EVERY surface's AD
    residuals live in VMEM at once (rows*S budget — the round-3 block-size
    cap), and jax.checkpoint cannot help because Mosaic has no remat2
    lowering. Manual remat instead: the forward sweep stores only each
    surface's ~10-array boundary state; the reverse sweep re-runs ONE
    surface under jax.vjp at a time, so peak liveness is boundary states
    + a single surface's residuals. Same FLOPs as remat, plain primitives.
    """
    from .pallas_trace import (_gen_epilogue, _gen_prologue, _polar_layout,
                               _state_step)
    S = len(flags)
    n_ev, pol_scale = _polar_layout(polar_state)
    st0, vjp_pro = jax.vjp(
        lambda g, px, py: _gen_prologue(g, px, py, kahan=kahan,
                                        polar_state=polar_state, split=split,
                                        telecentric=telecentric, apod=apod),
        gen, Px, Py)
    steps = []
    sigma = 1.0
    for flag in flags:
        steps.append(_state_step(flag, kahan, n_ev, split, sigma))
        if flag[1]:
            sigma = -sigma
    states = [st0]
    st = st0
    for k in range(S):
        st = steps[k](c[k], a[k], st)
        states.append(st)
    _, vjp_epi = jax.vjp(
        lambda s, g: _gen_epilogue(s, g, kahan=kahan, n_ev=n_ev,
                                   pol_scale=pol_scale,
                                   final_prop=final_prop, split=split),
        st, gen)
    cot_st, dgen = vjp_epi(cots)
    dc_rows = [None] * S
    da_rows = [None] * S
    for k in reversed(range(S)):
        _, vjp_k = jax.vjp(steps[k], c[k], a[k], states[k])
        dck, dak, cot_st = vjp_k(cot_st)
        dc_rows[k] = dck
        da_rows[k] = dak
    dgen_p, dPx, dPy = vjp_pro(cot_st)
    dgen = dgen + dgen_p
    return dgen, jnp.stack(dc_rows), jnp.stack(da_rows), dPx, dPy


def _gen_bwd_kernel(gen_ref, consts_ref, acoef_ref, px_ref, py_ref,
                    dxo_ref, dyo_ref, dzo_ref, dlo_ref, dmo_ref, dno_ref,
                    dio_ref, doo_ref,
                    dgen_ref, dconsts_ref, dacoef_ref, dpx_ref, dpy_ref,
                    *, flags: tuple, final_prop: bool, kahan: bool,
                    polar_state=None, split: bool = False,
                    telecentric: bool = False, apod=None):
    from jax.experimental import pallas as pl

    w = pl.program_id(0)
    f = pl.program_id(1)
    i = pl.program_id(2)

    # whole-[F, 16] gen table in VMEM; one-hot row select (Mosaic-friendly)
    ohF = jax.lax.broadcasted_iota(jnp.int32, (gen_ref.shape[0], 1), 0) == f
    gen = jnp.sum(jnp.where(ohF, gen_ref[...], 0.0), axis=0)
    c = consts_ref[0]
    a = acoef_ref[:]
    Px = px_ref[:]
    Py = py_ref[:]
    cots = (dxo_ref[0, 0], dyo_ref[0, 0], dzo_ref[0, 0], dlo_ref[0, 0],
            dmo_ref[0, 0], dno_ref[0, 0], dio_ref[0, 0], doo_ref[0, 0])
    dgen, dc, da, dPx, dPy = _manual_vjp(
        gen, c, a, Px, Py, cots, flags=flags, final_prop=final_prop,
        kahan=kahan, polar_state=polar_state, split=split,
        telecentric=telecentric, apod=apod)

    first = jnp.logical_and(w == 0, jnp.logical_and(f == 0, i == 0))

    # dacoef's block keeps index (0,0) for the WHOLE grid: resident in VMEM,
    # init on the first visit, accumulate after (sequential TPU grid).
    @pl.when(first)
    def _():
        dacoef_ref[...] = da

    @pl.when(jnp.logical_not(first))
    def _():
        dacoef_ref[...] = dacoef_ref[...] + da

    # dgen's [1, F, 16] block is per-w (whole-F — Mosaic block rules), its
    # row placed by one-hot; revisits are consecutive over (f, i); the
    # caller sums the W axis.
    dgen_c = jnp.where(ohF[None, :, :], dgen[None, None, :], 0.0)

    @pl.when(jnp.logical_and(f == 0, i == 0))
    def _():
        dgen_ref[...] = dgen_c

    @pl.when(jnp.logical_or(f != 0, i != 0))
    def _():
        dgen_ref[...] = dgen_ref[...] + dgen_c

    # dconsts is per-wavelength: its block revisits consecutively over
    # (f, i) with w outermost.
    @pl.when(jnp.logical_and(f == 0, i == 0))
    def _():
        dconsts_ref[0] = dc

    @pl.when(jnp.logical_or(f != 0, i != 0))
    def _():
        dconsts_ref[0] = dconsts_ref[0] + dc

    # pupil-sample cotangents are per-(w, f, tile); summed over (w, f) by
    # the caller
    dpx_ref[0, 0] = dPx
    dpy_ref[0, 0] = dPy


@functools.partial(jax.jit, static_argnames=("flags", "block_rows",
                                             "final_prop", "interpret",
                                             "kahan", "polar_state",
                                             "split", "telecentric", "apod"))
def _pallas_gen_bwd_2d(gen, consts, acoef, Px, Py, dx, dy, dz, dl, dm, dn,
                       di, do, flags: tuple, block_rows: int,
                       final_prop: bool = False, interpret: bool = False,
                       kahan: bool = False, polar_state=None,
                       split: bool = False, telecentric: bool = False,
                       apod=None):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    W = consts.shape[0]
    F = gen.shape[0]
    S = len(flags)
    C = acoef.shape[1]
    rows, lanes = Px.shape
    grid = (W, F, rows // block_rows)

    ray_in_spec = pl.BlockSpec((block_rows, lanes), lambda w, f, i: (i, 0),
                               memory_space=pltpu.VMEM)
    cot_spec = pl.BlockSpec((1, 1, block_rows, lanes),
                            lambda w, f, i: (w, f, i, 0),
                            memory_space=pltpu.VMEM)
    gen_spec = pl.BlockSpec((F, 16), lambda w, f, i: (0, 0),
                            memory_space=pltpu.VMEM)
    dgen_spec = pl.BlockSpec((1, F, 16), lambda w, f, i: (w, 0, 0),
                             memory_space=pltpu.VMEM)
    const_spec = pl.BlockSpec((1, S, _CONST_W), lambda w, f, i: (w, 0, 0),
                              memory_space=pltpu.VMEM)
    acoef_spec = pl.BlockSpec((S, C), lambda w, f, i: (0, 0),
                              memory_space=pltpu.VMEM)

    out_shape = [
        jax.ShapeDtypeStruct((W, F, 16), gen.dtype),         # dgen (per w)
        jax.ShapeDtypeStruct((W, S, _CONST_W), consts.dtype),  # dconsts
        jax.ShapeDtypeStruct((S, C), acoef.dtype),           # dacoef
        jax.ShapeDtypeStruct((W, F, rows, lanes), Px.dtype),  # dPx per (w,f)
        jax.ShapeDtypeStruct((W, F, rows, lanes), Px.dtype),  # dPy per (w,f)
    ]
    out_specs = [dgen_spec, const_spec, acoef_spec, cot_spec, cot_spec]
    kernel = functools.partial(_gen_bwd_kernel, flags=flags,
                               final_prop=final_prop, kahan=kahan,
                               polar_state=polar_state, split=split,
                               telecentric=telecentric, apod=apod)
    from .pallas_trace import _mosaic_trace
    with _mosaic_trace(interpret):
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[gen_spec, const_spec, acoef_spec, ray_in_spec,
                      ray_in_spec] + [cot_spec] * 8,
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=interpret,
        )(gen, consts, acoef, Px, Py, dx, dy, dz, dl, dm, dn, di, do)


@functools.lru_cache(maxsize=128)
def diff_gen_trace(flags: tuple, block_rows: int, final_prop: bool,
                   interpret: bool, kahan: bool, polar_state=None,
                   split: bool = False, telecentric: bool = False,
                   apod=None):
    """custom_vjp-wrapped fused gen+trace core for a static surface-stack
    configuration. Signature of the returned function:
    ``f(gen, consts, acoef, Px2d, Py2d) -> (x, y, z, L, M, N, inten, opd)``
    with every output [W, F, rows, lanes]; gradients flow to all five inputs
    (so d(merit)/d(params) rides the packing functions' XLA AD outside)."""

    @jax.custom_vjp
    def f(gen, consts, acoef, Px, Py):
        return tuple(_pallas_gen_trace_2d(
            gen, consts, acoef, Px, Py, flags=flags, block_rows=block_rows,
            final_prop=final_prop, interpret=interpret, kahan=kahan,
            polar_state=polar_state, split=split, telecentric=telecentric,
            apod=apod))

    def fwd(gen, consts, acoef, Px, Py):
        return f(gen, consts, acoef, Px, Py), (gen, consts, acoef, Px, Py)

    def bwd(res, cots):
        # Lost-ray cotangents (possibly NaN from unmasked consumers) are
        # zeroed by the transpose of the in-pipeline nanify where — no
        # blanket filtering here, matching the XLA path's AD semantics.
        gen, consts, acoef, Px, Py = res
        bwd_rows = _bwd_rows(len(flags), block_rows)
        dgenw, dconsts, dacoef, dPxw, dPyw = _pallas_gen_bwd_2d(
            gen, consts, acoef, Px, Py, *cots, flags=flags,
            block_rows=bwd_rows, final_prop=final_prop, interpret=interpret,
            kahan=kahan, polar_state=polar_state, split=split,
            telecentric=telecentric, apod=apod)
        return (jnp.sum(dgenw, axis=0), dconsts, dacoef,
                jnp.sum(dPxw, axis=(0, 1)), jnp.sum(dPyw, axis=(0, 1)))

    f.defvjp(fwd, bwd)
    return f
