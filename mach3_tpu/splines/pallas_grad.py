"""Analytic VJP for the fused reweight+histogram kernels.

The reference's gradient story is "none" (MCMC only); ours is HMC/MALA/ChEES
and L-BFGS, which until now rode the pure-XLA twin of the fused kernel
(``SampleModel.log_likelihood_batch_xla``) for BOTH value and gradient —
measured 10-20x the fused forward at reference scale (the XLA spline product
materialises ~P [C, E] temporaries, forward and reverse).

This module makes the fused Pallas forward differentiable with a hand-written
backward, so gradient samplers run at fused speed:

  forward:  (mc, w2) = fused kernel  (splines/pallas_reweight.py)
  backward: two Pallas passes re-deriving everything from the same residuals

Math. Per chain c and event e the kernel computes w = base * Π_p resp_p with
resp_p = selector[c,p,:] @ coeffs[p,:,e], then histograms Σw and Σw² per bin.
Given output cotangents (ḡ_mc, ḡ_w2) [C, B]:

  G[c,e]             = ḡ_mc[c, bin_e] + 2 w ḡ_w2[c, bin_e]   (gather)
  ḡ_base[c,e]        = G · Π_p resp_p
  ḡ_selector[c,p,:]  = Σ_e G · base · (Π_{q≠p} resp_q) · coeffs[p,:,e]

The exclusion product Π_{q≠p} uses an exact zero-counting factorisation
instead of an unstable division: with nz = #{q: resp_q = 0} and
pnz = Π_{q: resp_q≠0} resp_q,

  nz = 0:  Π_{q≠p} = pnz / resp_p        (1-ulp division, all factors ≠ 0)
  nz = 1:  Π_{q≠p} = pnz if resp_p = 0 else 0
  nz ≥ 2:  Π_{q≠p} = 0

Pass A (grid ce, ee, pe — pe innermost, mirroring the forward) streams the
[PT, K4, ET] coefficient tiles to accumulate (pnz, nz) in VMEM scratch, and on
the last tile performs the cotangent gather G and emits [C, E] residual fields
(ḡ_base, sev = G·base, pnz, nz). Pass B (grid ce, pe, ee — ee innermost)
re-derives each tile's responses and accumulates
ḡ_selector[:, p, :] += (sev · excl_p) @ coeffsᵀ[p] into a resident block.

The norm product stays on the XLA side of ``base_w`` in the differentiable
path (unlike the sampling path's in-kernel log-matmul), so its gradient flows
through ordinary autodiff — see ``SampleModel.log_likelihood_batch_diff``.

Reference pipeline being differentiated: ``Splines/gpuSplineUtils.cu:337-439``
(EvalOnGPU_Splines + EvalOnGPU_TotWeight) — which has no backward at all.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_reweight import _resp_dot, dot_f32

#: Largest per-chain-bins histogram for which the backward gather runs as a
#: mask loop; bigger B with per-chain bins should use the XLA fallback.
#: Matches the forward's mask-reduce limit (routing.MAX_MASKREDUCE_BINS):
#: the backward unrolls the same one-select-per-bin pattern.
MAX_PERCHAIN_BINS = 512


def _resp(selector_ref, coeffs_ref, p):
    return _resp_dot(selector_ref[:, p, :], coeffs_ref[p])


def _kernel_grad_a(
    selector_ref, base_ref, bins_ref, gmc_ref, gw2_ref, coeffs_ref,
    gbase_ref, sev_ref, pnz_ref, nz_ref, pnz_s, nz_s,
    *, p_tile, n_ptiles, n_bins, shared_bins,
):
    """Pass A: accumulate (pnz, nz) across param tiles; on the last tile
    gather the output cotangents per event and emit the residual fields."""
    pe = pl.program_id(2)

    @pl.when(pe == 0)
    def _():
        pnz_s[:] = jnp.ones_like(pnz_s)
        nz_s[:] = jnp.zeros_like(nz_s)

    pnz = pnz_s[:]
    nz = nz_s[:]
    for p in range(p_tile):
        resp = _resp(selector_ref, coeffs_ref, p)
        iszero = resp == 0.0
        pnz = pnz * jnp.where(iszero, 1.0, resp)
        nz = nz + iszero.astype(jnp.float32)
    pnz_s[:] = pnz
    nz_s[:] = nz

    @pl.when(pe == n_ptiles - 1)
    def _():
        base = base_ref[:]  # [CT, ET]
        r_total = pnz * (nz == 0.0).astype(jnp.float32)
        w = base * r_total
        if shared_bins:
            # One-hot gather as an MXU dot: oh [BP, ET], G* = ḡ [CT, BP] @ oh.
            bins = bins_ref[0]  # [ET] i32
            bp = gmc_ref.shape[1]
            iota_b = jax.lax.broadcasted_iota(
                jnp.int32, (bp, bins.shape[0]), 0
            )
            oh = (iota_b == bins[None, :]).astype(jnp.float32)  # [BP, ET]
            gmc_e = dot_f32(gmc_ref[:], oh, (((1,), (0,)), ((), ())), exact="b")
            gw2_e = dot_f32(gw2_ref[:], oh, (((1,), (0,)), ((), ())), exact="b")
        else:
            # Per-chain bins, small B: mask loop (VPU), one select per bin.
            bins = bins_ref[:]  # [CT, ET] i32
            gmc_e = jnp.zeros_like(base)
            gw2_e = jnp.zeros_like(base)
            for b in range(n_bins):
                mask = bins == jnp.int32(b)
                gmc_e = gmc_e + jnp.where(mask, gmc_ref[:, b : b + 1], 0.0)
                gw2_e = gw2_e + jnp.where(mask, gw2_ref[:, b : b + 1], 0.0)
        g = gmc_e + 2.0 * w * gw2_e
        gbase_ref[:] = g * r_total
        sev_ref[:] = g * base
        pnz_ref[:] = pnz
        nz_ref[:] = nz


def _kernel_grad_b(
    selector_ref, sev_ref, pnz_ref, nz_ref, coeffs_ref, coeffs_t_ref,
    gsel_ref, *, p_tile,
):
    """Pass B: per-tile responses -> exclusion products -> ḡ_selector."""
    ee = pl.program_id(2)

    @pl.when(ee == 0)
    def _():
        gsel_ref[:] = jnp.zeros_like(gsel_ref)

    sev = sev_ref[:]
    pnz = pnz_ref[:]
    nz = nz_ref[:]
    none_zero = nz == 0.0
    one_zero = nz == 1.0
    for p in range(p_tile):
        resp = _resp(selector_ref, coeffs_ref, p)
        iszero = resp == 0.0
        safe = jnp.where(iszero, 1.0, resp)
        excl = jnp.where(
            none_zero,
            pnz / safe,
            jnp.where(one_zero & iszero, pnz, 0.0),
        )
        contrib = sev * excl  # [CT, ET]
        # resp = 1 + sel @ (co − I)  ⇒  ∂resp/∂sel = (co − I): the backward
        # contracts against the TRANSPOSED deviation table, in the same
        # single-bf16-pass numeric as the forward's response dot.
        co_t = coeffs_t_ref[p]  # [ET, K4]
        iota_k = jax.lax.broadcasted_iota(jnp.int32, (1, co_t.shape[1]), 1)
        ident_t = (jnp.bitwise_and(iota_k, jnp.int32(3)) == 0).astype(co_t.dtype)
        dev_t = co_t - ident_t
        gsel_ref[:, p, :] += jax.lax.dot_general(
            contrib.astype(jnp.bfloat16), dev_t.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [CT, K4]


def _pad_operands(selector, coeffs, base_w, bins, n_bins,
                  chain_tile, event_tile, param_tile, shared_bins):
    """Identical padding scheme to the forward kernels (pallas_reweight)."""
    c, p, k4 = selector.shape
    e = coeffs.shape[2]
    cpad = -c % chain_tile
    epad = -e % event_tile
    ppad = -p % param_tile
    if cpad:
        selector = jnp.pad(selector, ((0, cpad), (0, 0), (0, 0)))
        base_w = jnp.pad(base_w, ((0, cpad), (0, 0)))
        if not shared_bins:
            bins = jnp.pad(bins, ((0, cpad), (0, 0)), constant_values=n_bins)
    if epad:
        coeffs = jnp.pad(coeffs, ((0, 0), (0, 0), (0, epad)))
        base_w = jnp.pad(base_w, ((0, 0), (0, epad)))
        if shared_bins:
            bins = jnp.pad(bins, ((0, epad),), constant_values=n_bins)
        else:
            bins = jnp.pad(bins, ((0, 0), (0, epad)), constant_values=n_bins)
    if ppad:
        sel_pad = jnp.zeros((selector.shape[0], ppad, k4), selector.dtype)
        sel_pad = sel_pad.at[:, :, 0].set(1)
        selector = jnp.concatenate([selector, sel_pad], axis=1)
        co_pad = jnp.zeros((ppad, k4, coeffs.shape[2]), coeffs.dtype)
        co_pad = co_pad.at[:, 0, :].set(1)
        coeffs = jnp.concatenate([coeffs, co_pad], axis=0)
    return selector, coeffs, base_w, bins, cpad, epad, ppad


def _grad_backward(static, residuals, cotangents):
    """The full backward: pad, run pass A then pass B, slice, return
    (ḡ_selector [C,P,K4] f32, ḡ_base [C,E] f32)."""
    n_bins, chain_tile, event_tile, param_tile, shared_bins = static
    selector, coeffs, base_w, bins = residuals
    gmc, gw2 = cotangents
    c, p, k4 = selector.shape
    e = coeffs.shape[2]
    # selector stays f32 — matches the forward kernels' r5 precision
    # fix (bf16 coefficient tiles upcast inside the kernels)
    selector = selector.astype(jnp.float32)
    pt = param_tile if (param_tile is not None and param_tile < p) else p
    selector, coeffs, base_w, bins, cpad, epad, ppad = _pad_operands(
        selector, coeffs, base_w, bins, n_bins,
        chain_tile, event_tile, pt, shared_bins,
    )
    cp, ep, pp = c + cpad, e + epad, p + ppad
    n_ptiles = pp // pt
    bp = -(-(n_bins + 1) // 128) * 128
    gpad = jnp.zeros((cp, bp), jnp.float32)
    gmc_p = gpad.at[:c, :n_bins].set(gmc.astype(jnp.float32))
    gw2_p = gpad.at[:c, :n_bins].set(gw2.astype(jnp.float32))
    bins2d = bins[None, :] if shared_bins else bins
    bins_block = (1, event_tile) if shared_bins else (chain_tile, event_tile)

    i32 = jnp.int32
    if shared_bins:
        bins_map_a = lambda ce, ee, pe: (i32(0), ee)
    else:
        bins_map_a = lambda ce, ee, pe: (ce, ee)
    ce_field = lambda ce, ee, pe: (ce, ee)  # [C, E] fields
    gbase, sev, pnz, nzf = pl.pallas_call(
        functools.partial(
            _kernel_grad_a, p_tile=pt, n_ptiles=n_ptiles, n_bins=n_bins,
            shared_bins=shared_bins,
        ),
        grid=(cp // chain_tile, ep // event_tile, n_ptiles),
        in_specs=[
            pl.BlockSpec(
                (chain_tile, pt, k4),
                lambda ce, ee, pe: (ce, pe, i32(0)),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (chain_tile, event_tile), ce_field, memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(bins_block, bins_map_a, memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (chain_tile, bp),
                lambda ce, ee, pe: (ce, i32(0)),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (chain_tile, bp),
                lambda ce, ee, pe: (ce, i32(0)),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (pt, k4, event_tile),
                lambda ce, ee, pe: (pe, i32(0), ee),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=tuple(
            pl.BlockSpec(
                (chain_tile, event_tile), ce_field, memory_space=pltpu.VMEM
            )
            for _ in range(4)
        ),
        out_shape=tuple(
            jax.ShapeDtypeStruct((cp, ep), jnp.float32) for _ in range(4)
        ),
        scratch_shapes=[
            pltpu.VMEM((chain_tile, event_tile), jnp.float32),
            pltpu.VMEM((chain_tile, event_tile), jnp.float32),
        ],
    )(selector, base_w, bins2d, gmc_p, gw2_p, coeffs)

    coeffs_t = jnp.swapaxes(coeffs, 1, 2)  # [P, E, K4] (one-off XLA transpose)
    gsel = pl.pallas_call(
        functools.partial(_kernel_grad_b, p_tile=pt),
        grid=(cp // chain_tile, n_ptiles, ep // event_tile),
        in_specs=[
            pl.BlockSpec(
                (chain_tile, pt, k4),
                lambda ce, pe, ee: (ce, pe, i32(0)),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (chain_tile, event_tile),
                lambda ce, pe, ee: (ce, ee),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (chain_tile, event_tile),
                lambda ce, pe, ee: (ce, ee),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (chain_tile, event_tile),
                lambda ce, pe, ee: (ce, ee),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (pt, k4, event_tile),
                lambda ce, pe, ee: (pe, i32(0), ee),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (pt, event_tile, k4),
                lambda ce, pe, ee: (pe, ee, i32(0)),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (chain_tile, pt, k4),
            lambda ce, pe, ee: (ce, pe, i32(0)),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((cp, pp, k4), jnp.float32),
    )(selector, sev, pnz, nzf, coeffs, coeffs_t)

    return gsel[:c, :p, :].astype(jnp.float32), gbase[:c, :e]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def fused_reweight_diff(static, selector, coeffs, base_w, bins):
    """Differentiable fused reweight+histogram.

    static = (n_bins, chain_tile, event_tile, param_tile, shared_bins) — a
    hashable config tuple. Forward is the fused Pallas kernel (norm product
    NOT in-kernel: the differentiable path keeps it in ``base_w`` so its
    gradient rides ordinary autodiff); backward is the two-pass analytic
    kernel above. Differentiable in ``selector`` and ``base_w``; ``coeffs``
    receives a symbolic-zero cotangent and ``bins`` is integer (float0).
    """
    from .pallas_reweight import (
        fused_reweight_histogram,
        fused_reweight_histogram_shared,
    )

    n_bins, chain_tile, event_tile, param_tile, shared_bins = static
    if shared_bins:
        return fused_reweight_histogram_shared(
            selector, coeffs, base_w, bins, n_bins=n_bins,
            chain_tile=chain_tile, event_tile=event_tile,
            param_tile=param_tile,
        )
    return fused_reweight_histogram(
        selector, coeffs, base_w, bins, n_bins=n_bins,
        chain_tile=chain_tile, event_tile=event_tile,
    )


def _fused_diff_fwd(static, selector, coeffs, base_w, bins):
    out = fused_reweight_diff(static, selector, coeffs, base_w, bins)
    return out, (selector, coeffs, base_w, bins)


def _fused_diff_bwd(static, residuals, cotangents):
    gsel, gbase = _grad_backward(static, residuals, cotangents)
    _, coeffs, _, bins = residuals
    gsel = gsel.astype(residuals[0].dtype)
    gbase = gbase.astype(residuals[2].dtype)
    # coeffs are static physics tables (no path to θ): zero cotangent, DCE'd.
    gcoeffs = jnp.zeros(coeffs.shape, coeffs.dtype)
    gbins = np.zeros(bins.shape, jax.dtypes.float0)
    return gsel, gcoeffs, gbase, gbins


fused_reweight_diff.defvjp(_fused_diff_fwd, _fused_diff_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def fused_reweight_diff_shifted(
    static, selector, coeffs, base_w, shift_vals, x_nom, static_base, bins_xla
):
    """Differentiable fused reweight for SHIFTED-route samples (in-kernel
    shifted-axis binning; any P via param blocking).

    static = (n_bins, chain_tile, event_tile, param_tile, shift_fn, edges,
    stride_j, n_axis_j). Forward is ``fused_reweight_histogram_shifted``
    (norm NOT in-kernel — it stays in ``base_w`` for autodiff); backward is
    the two-pass analytic kernel with the PRECOMPUTED per-chain bins
    ``bins_xla`` (same binning formula evaluated in XLA; unused — and
    DCE'd — in the forward). Bin indices are piecewise-constant in θ, so
    the shift parameter's binning gradient is the correct a.e. zero, exactly
    as in the XLA path."""
    from .pallas_reweight import fused_reweight_histogram_shifted

    n_bins, chain_tile, event_tile, param_tile, shift_fn, edges, stride_j, n_axis_j = static
    return fused_reweight_histogram_shifted(
        selector, coeffs, base_w, shift_vals, x_nom, static_base,
        n_bins=n_bins, shift_fn=shift_fn, edges=edges, stride_j=stride_j,
        n_axis_j=n_axis_j, chain_tile=chain_tile, event_tile=event_tile,
        param_tile=param_tile,
    )


def _fused_diff_shifted_fwd(
    static, selector, coeffs, base_w, shift_vals, x_nom, static_base, bins_xla
):
    out = fused_reweight_diff_shifted(
        static, selector, coeffs, base_w, shift_vals, x_nom, static_base,
        bins_xla,
    )
    return out, (selector, coeffs, base_w, bins_xla, shift_vals, x_nom)


def _fused_diff_shifted_bwd(static, residuals, cotangents):
    n_bins, chain_tile, event_tile, param_tile = static[:4]
    selector, coeffs, base_w, bins_xla, shift_vals, x_nom = residuals
    gsel, gbase = _grad_backward(
        (n_bins, chain_tile, event_tile, param_tile, False),
        (selector, coeffs, base_w, bins_xla),
        cotangents,
    )
    gsel = gsel.astype(selector.dtype)
    gbase = gbase.astype(base_w.dtype)
    gcoeffs = jnp.zeros(coeffs.shape, coeffs.dtype)
    # Shift value / nominal kinematics: gradients flow only through the
    # piecewise-constant binning — a.e. zero, matching the XLA path.
    gshift = jnp.zeros(shift_vals.shape, shift_vals.dtype)
    gxnom = jnp.zeros(x_nom.shape, x_nom.dtype)
    gstatic = np.zeros((coeffs.shape[2],), jax.dtypes.float0)
    gbins = np.zeros(bins_xla.shape, jax.dtypes.float0)
    return gsel, gcoeffs, gbase, gshift, gxnom, gstatic, gbins


fused_reweight_diff_shifted.defvjp(_fused_diff_shifted_fwd, _fused_diff_shifted_bwd)
