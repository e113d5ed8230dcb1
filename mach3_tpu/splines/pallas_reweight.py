"""Fused reweight + histogram Pallas kernel — the flagship TPU kernel.

TPU-native replacement for the reference's CUDA spline pipeline
(``Splines/gpuSplineUtils.cu:337-439``: EvalOnGPU_Splines + EvalOnGPU_TotWeight
+ a device->host copy + OMP FillArray). XLA's unfused version materialises
~100 [C, E]-sized temporaries (measured 1.6 GB moved per reweight at 50k
events x 128 chains); this kernel performs, in one VMEM-resident pass per
(chain-tile, event-tile):

1. the spline response product over parameters — each parameter is ONE MXU
   matmul ``selector[CT, K4] @ coeffs[K4, ET]`` (selector = segment-one-hot x
   powers of t, computed outside; tiny),
2. multiplication with the precomputed base weight (mc x osc x norm),
3. the histogram fill of both Σw and Σw² via masked one-hot contractions into
   a [CT, B] accumulator that never leaves VMEM.

Shift/binning generality stays outside: ``bins [C, E]`` arrives precomputed
(recomputing bins per step is cheap; the kernel's win is removing the [C, E]
traffic of the spline/histogram chain). Bin count B is a static template —
bins beyond ~4k should fall back to the XLA path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.precision import FTYPE


def _split_f32(a):
    """bf16 (hi, lo) pair of an f32 array: a ~= hi + lo to ~2^-16 relative."""
    hi = a.astype(jnp.bfloat16)
    lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def dot_f32(a, b, dims, exact="b"):
    """f32-faithful ``dot_general`` on the MXU via bf16 hi/lo passes.

    TPU f32 dots default to ONE bf16 pass — both operands rounded to 8
    mantissa bits. In these kernels that silently rounded every spline
    response and every histogrammed weight by ~0.4%, which the r5 on-device
    parity gate caught (fused-vs-XLA rel-err up to 1%). Mosaic supports only
    DEFAULT and HIGHEST (six passes — measured 2x the whole LLH), so this is
    the hand-rolled middle: with one operand EXACTLY bf16-representable
    (one-hots, 0/1 masks, small match counts, bf16 coefficient tables),
    splitting the other into a bf16 (hi, lo) pair gives f32-faithful
    products in TWO passes (error ~2^-16 relative, f32 accumulation);
    ``exact="ab"`` splits both (three passes) for f32 tables.

    ``exact`` names the operand that is exactly representable ("a", "b")
    or "ab" when neither is.
    """
    d = functools.partial(
        jax.lax.dot_general, dimension_numbers=dims,
        preferred_element_type=jnp.float32,
    )
    bf = jnp.bfloat16
    if exact == "b":
        b16 = b if b.dtype == bf else b.astype(bf)
        ah, al = _split_f32(a.astype(jnp.float32))
        return d(ah, b16) + d(al, b16)
    if exact == "a":
        a16 = a if a.dtype == bf else a.astype(bf)
        bh, bl = _split_f32(b.astype(jnp.float32))
        return d(a16, bh) + d(a16, bl)
    ah, al = _split_f32(a.astype(jnp.float32))
    bh, bl = _split_f32(b.astype(jnp.float32))
    return d(ah, bh) + d(ah, bl) + d(al, bh)


def _dev_coeffs(co):
    """Coefficient tile minus the IDENTITY response pattern (1 at every
    constant-term row k*4+0): the deviation table of ``resp = 1 + dev``."""
    k4 = co.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (k4, co.shape[1]), 0)
    ident = (jnp.bitwise_and(iota, jnp.int32(3)) == 0).astype(co.dtype)
    return co - ident


def _resp_dot(sel, co):
    """Spline response [CT, K4] x [K4, ET] in DEVIATION form:

        resp = 1 + sel @ (co − I)

    where I (ones at the constant-term rows) satisfies sel @ I ≡ 1 exactly
    for any segment one-hot selector. ONE bf16 MXU pass then rounds only
    the DEVIATION from unity (~0.4% of |resp − 1|, i.e. ~2e-4 of a typical
    response) instead of the full response — 20x the accuracy of a plain
    DEFAULT dot at the same cost. The first attempt used f32-faithful split
    passes (dot_f32) here; tripling the count of these latency-bound tiny
    dots ([CT, 20] @ [20, ET]) took the 256-chain toy step from ~3 ms to
    80 ms. The XLA twin (``splines/eval.py``) applies the SAME bf16
    deviation rounding so the routes agree to f32 accumulation order.

    Identity padding rows (selector e0 x coefficient row0 = 1) become
    dev = 0 and drop out exactly."""
    bf = jnp.bfloat16
    dev = _dev_coeffs(co)
    return 1.0 + jax.lax.dot_general(
        sel.astype(bf), dev.astype(bf), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _kernel(
    selector_ref, base_ref, bins_ref, coeffs_ref, mc_ref, w2_ref,
    *, n_params, n_bins, radix,
):
    """Grid (ce, ee); event tiles innermost so the [CT, B] output block stays
    resident and accumulates across event tiles."""
    ee = pl.program_id(1)

    @pl.when(ee == 0)
    def _():
        mc_ref[:] = jnp.zeros_like(mc_ref)
        w2_ref[:] = jnp.zeros_like(w2_ref)

    # Spline product: w [CT, ET]
    w = base_ref[:]
    for p in range(n_params):
        resp = _resp_dot(selector_ref[:, p, :], coeffs_ref[p])
        w = w * resp

    # Histogram via RADIX-FACTORISED one-hots. A direct one-hot contraction
    # costs O(B) compares per event plus an MXU-hostile M=1 dot per chain.
    # Splitting the bin id into digits b = hi*R + lo gives, per chain, two
    # small one-hots (Bhi + R compares per event); the per-chain matmuls
    #   [2*Bhi, ET] @ [ET, R]
    # would each run the MXU at <1% utilisation (M=2*Bhi, N=R both pad to
    # 128), so all chains are BATCHED into one block-diagonal contraction
    #   Z [CT*2*Bhi, ET] @ OH [ET, CT*R]
    # whose diagonal [2*Bhi, R] blocks are the per-chain results (off-diagonal
    # blocks are computed and discarded — CT x more MACs, but ~CT x fewer MXU
    # passes, measured ~4x faster end to end). Rows 0..Bhi-1 of each chain
    # block carry w·1[hi], rows Bhi.. carry w²·1[hi]. Out-of-range/padded
    # events use bin id n_bins, which lands in the sliced-off tail of the
    # (Bhi*R >= n_bins+1) flat output. Mosaic constraints respected: plain 2-D
    # dots, i32 everywhere, digit split via shift/mask (integer div/mod lower
    # through float conversion chains Mosaic cannot legalize).
    bins = bins_ref[:]
    chain_tile = bins.shape[0]
    et = bins.shape[1]
    radix_bits = radix.bit_length() - 1  # radix is a power of two
    n_hi = (n_bins + radix) // radix  # ceil((n_bins+1)/radix): garbage fits
    iota_lo = jax.lax.broadcasted_iota(jnp.int32, (et, radix), 1)
    iota_hi = jax.lax.broadcasted_iota(jnp.int32, (n_hi, et), 0)
    z_rows = []
    oh_cols = []
    for c in range(chain_tile):
        hi = jax.lax.shift_right_logical(bins[c], jnp.int32(radix_bits))
        lo = jnp.bitwise_and(bins[c], jnp.int32(radix - 1))
        oh_cols.append((lo[:, None] == iota_lo).astype(jnp.float32))  # [ET, R]
        oh_hi = (hi[None, :] == iota_hi).astype(jnp.float32)  # [Bhi, ET]
        wc = w[c]  # [ET]
        zw = oh_hi * wc[None, :]  # [Bhi, ET] w masked by hi digit
        z_rows.append(jnp.concatenate([zw, zw * wc[None, :]], axis=0))
    z = jnp.concatenate(z_rows, axis=0)  # [CT*2*Bhi, ET]
    oh = jnp.concatenate(oh_cols, axis=1)  # [ET, CT*R]
    res = dot_f32(z, oh, (((1,), (0,)), ((), ())), exact="b")  # [CT*2*Bhi, CT*R]
    # Diagonal-block extraction. Row slices are sublane-aligned; column slices
    # at offset c*R are NOT lane-aligned, so columns are selected with a tiny
    # static one-hot dot instead (res_c [2*Bhi, CT*R] @ sel_c [CT*R, R]).
    iota_row = jax.lax.broadcasted_iota(jnp.int32, (chain_tile * radix, radix), 0)
    iota_col = jax.lax.broadcasted_iota(jnp.int32, (chain_tile * radix, radix), 1)
    for c in range(chain_tile):
        res_c = res[c * 2 * n_hi : (c + 1) * 2 * n_hi, :]
        sel_c = (iota_row == iota_col + jnp.int32(c * radix)).astype(jnp.float32)
        blk = dot_f32(res_c, sel_c, (((1,), (0,)), ((), ())), exact="b")  # [2*Bhi, R]
        # Outputs are [CT, Bhi, R]; the (hi, lo) -> flat-bin reshape happens
        # in XLA outside (Mosaic cannot reshape across the sublane/lane split).
        mc_ref[c] += blk[:n_hi]
        w2_ref[c] += blk[n_hi:]


@functools.partial(
    jax.jit, static_argnames=("n_bins", "chain_tile", "event_tile", "radix", "hist")
)
def fused_reweight_histogram(
    selector: jnp.ndarray,  # [C, P, K4] f32
    coeffs: jnp.ndarray,  # [P, K4, E] f32
    base_w: jnp.ndarray,  # [C, E] f32  (mc_weight x osc x norm, weights=0 for pad)
    bins: jnp.ndarray,  # [C, E] i32  (n_bins = out of range)
    n_bins: int,
    chain_tile: int = 16,
    event_tile: int = 2048,
    radix: int = 16,
    hist: str = "maskreduce",
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (mc [C, B], w2 [C, B]) in f32.

    hist selects the per-chain-bins histogram algorithm: "maskreduce" (one
    VPU mask + two lane reductions per bin; best measured) or "blockdiag"
    (radix-factorised one-hots, all chains batched into one block-diagonal
    MXU contraction). event_tile is capped at 2048: the block-diagonal
    intermediates put a 4096-event tile past the 16 MB scoped-VMEM limit."""
    c, p, k4 = selector.shape
    e = coeffs.shape[2]
    # selector stays f32; bf16 coefficient tiles upcast INSIDE the
    # kernels (a bf16 selector added ~0.4% route-diverging rounding
    # on every response — caught by the r5 on-device parity gate)
    selector = selector.astype(jnp.float32)
    # Pad C and E to tile multiples; padded events carry weight 0 and bin B
    # (out of range) so they contribute nothing.
    cpad = -c % chain_tile
    epad = -e % event_tile
    if cpad:
        selector = jnp.pad(selector, ((0, cpad), (0, 0), (0, 0)))
        base_w = jnp.pad(base_w, ((0, cpad), (0, 0)))
        bins = jnp.pad(bins, ((0, cpad), (0, 0)), constant_values=n_bins)
    if epad:
        coeffs = jnp.pad(coeffs, ((0, 0), (0, 0), (0, epad)))
        base_w = jnp.pad(base_w, ((0, 0), (0, epad)))
        bins = jnp.pad(bins, ((0, 0), (0, epad)), constant_values=n_bins)
    cp, ep = c + cpad, e + epad

    grid = (cp // chain_tile, ep // event_tile)
    # Index maps build their zero constants INSIDE the lambda as explicit i32:
    # with jax_enable_x64 bare literals become i64 (Mosaic cannot legalize),
    # and closure-captured jnp constants are rejected by pallas.
    i32 = jnp.int32
    in_specs = [
        pl.BlockSpec(
            (chain_tile, p, k4),
            lambda ce, ee: (ce, i32(0), i32(0)),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (chain_tile, event_tile),
            lambda ce, ee: (ce, ee),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (chain_tile, event_tile),
            lambda ce, ee: (ce, ee),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (p, k4, event_tile),
            lambda ce, ee: (i32(0), i32(0), ee),
            memory_space=pltpu.VMEM,
        ),
    ]
    if hist == "maskreduce":
        bp = -(-n_bins // 128) * 128
        kernel = functools.partial(_kernel_maskreduce, n_params=p, n_bins=n_bins)
        out_block, out_shape = (chain_tile, bp), (cp, bp)
        out_map = lambda ce, ee: (ce, i32(0))
    else:
        n_hi = (n_bins + radix) // radix
        kernel = functools.partial(_kernel, n_params=p, n_bins=n_bins, radix=radix)
        out_block, out_shape = (chain_tile, n_hi, radix), (cp, n_hi, radix)
        out_map = lambda ce, ee: (ce, i32(0), i32(0))
    mc, w2 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec(out_block, out_map, memory_space=pltpu.VMEM),
            pl.BlockSpec(out_block, out_map, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(out_shape, jnp.float32),
            jax.ShapeDtypeStruct(out_shape, jnp.float32),
        ),
    )(selector, base_w, bins, coeffs)
    # Slice away padding (and for the radix layout, reshape (hi, lo) digits to
    # flat bin ids); the garbage bin n_bins lives in the sliced-off tail.
    mc = mc.reshape(cp, -1)[:c, :n_bins]
    w2 = w2.reshape(cp, -1)[:c, :n_bins]
    return mc, w2


def _kernel_maskreduce(
    selector_ref, base_ref, bins_ref, coeffs_ref, mc_ref, w2_ref,
    *, n_params, n_bins,
):
    """Per-chain-bins variant with a pure-VPU histogram: one mask + two lane
    reductions per bin (B is small, ~10²). Avoids MXU entirely for the
    histogram — the per-chain one-hot dots run the MXU at <1% utilisation
    (M, N both tiny), which dominated the radix formulations."""
    ee = pl.program_id(1)

    @pl.when(ee == 0)
    def _():
        mc_ref[:] = jnp.zeros_like(mc_ref)
        w2_ref[:] = jnp.zeros_like(w2_ref)

    w = base_ref[:]
    for p in range(n_params):
        resp = _resp_dot(selector_ref[:, p, :], coeffs_ref[p])
        w = w * resp

    bins = bins_ref[:]  # [CT, ET] i32
    w2 = w * w
    cols_mc = []
    cols_w2 = []
    for b in range(n_bins):
        mask = (bins == jnp.int32(b)).astype(jnp.float32)
        cols_mc.append(jnp.sum(w * mask, axis=1, keepdims=True))
        cols_w2.append(jnp.sum(w2 * mask, axis=1, keepdims=True))
    pad = mc_ref.shape[1] - n_bins
    if pad:
        zero = jnp.zeros((w.shape[0], pad), jnp.float32)
        cols_mc.append(zero)
        cols_w2.append(zero)
    mc_ref[:] += jnp.concatenate(cols_mc, axis=1)
    w2_ref[:] += jnp.concatenate(cols_w2, axis=1)


def _norm_weight(logext_ref, negext_ref, norm_s_ref):
    """In-kernel normalisation product via log-matmul.

    The per-event product of matched norm parameters Π_w ext[idx[e,w]] equals
    exp(Σ_np log|ext[np]|·S[np,e]) · (-1)^(Σ_np neg[np]·S[np,e]) where S is the
    static match-count matrix — TWO tiny MXU dots [CT, NPp1] @ [NPp1, ET]
    instead of the XLA one-hot matmul's [C, E*Wn] intermediate (measured
    ~1.6 ms/step at 256 chains). |ext| is floored at 1e-30 upstream (comfortably NORMAL in f32 —
    denormals flush to zero, and log(0)·0 would poison the dot with NaN);
    exact-zero norms become ~1e-30 weights.
    """
    lw = dot_f32(
        logext_ref[:], norm_s_ref[:], (((1,), (0,)), ((), ())), exact="b"
    )  # [CT, ET]
    # 0/1 mask x small counts: both operands exactly bf16-representable
    pw = jax.lax.dot_general(
        negext_ref[:].astype(jnp.bfloat16), norm_s_ref[:].astype(jnp.bfloat16),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )  # [CT, ET] integer-valued parity counts
    sign = 1.0 - 2.0 * (pw - 2.0 * jnp.floor(pw * 0.5))
    return jnp.exp(lw) * sign


def _kernel_maskreduce_shifted(
    selector_ref, base_ref, shiftv_ref, xnom_ref, static_ref, coeffs_ref,
    *refs,
    n_params, n_bins, shift_fn, edges, stride_j, n_axis_j, has_norm,
):
    """Mask-reduce variant with the shifted-axis BINNING fused in: the bin
    edges are static per sample, so they are baked into the kernel as python
    floats and the per-chain searchsorted is an unrolled compare-accumulate —
    no [C, E] bin array ever exists in HBM (the XLA bins pass measured ~3 ms
    per step at 256 chains x 100k events).

    shiftv_ref [CT, 1]: per-chain shift-parameter value; xnom_ref [1, ET]:
    nominal values of the shifted variable; static_ref [1, ET] i32: summed
    static-axis bin contribution (-1 = invalid on a static axis). With
    ``has_norm``, refs = (logext, negext, norm_s, mc, w2) and the norm
    product runs in-kernel (see :func:`_norm_weight`).
    """
    if has_norm:
        logext_ref, negext_ref, norm_s_ref, mc_ref, w2_ref = refs
    else:
        mc_ref, w2_ref = refs
    ee = pl.program_id(1)

    @pl.when(ee == 0)
    def _():
        mc_ref[:] = jnp.zeros_like(mc_ref)
        w2_ref[:] = jnp.zeros_like(w2_ref)

    w = base_ref[:]
    for p in range(n_params):
        resp = _resp_dot(selector_ref[:, p, :], coeffs_ref[p])
        w = w * resp
    if has_norm:
        w = w * _norm_weight(logext_ref, negext_ref, norm_s_ref)

    _shifted_bin_histogram(
        w, shiftv_ref, xnom_ref, static_ref, mc_ref, w2_ref,
        n_bins=n_bins, shift_fn=shift_fn, edges=edges,
        stride_j=stride_j, n_axis_j=n_axis_j,
    )


def _shifted_bin_histogram(
    w, shiftv_ref, xnom_ref, static_ref, mc_ref, w2_ref,
    *, n_bins, shift_fn, edges, stride_j, n_axis_j,
):
    """Shared tail of the shifted variants: in-kernel shifted-axis binning
    (baked edges, unrolled compare-accumulate searchsorted) + mask-reduce
    histogram accumulation into the resident output blocks."""
    x = shift_fn(shiftv_ref[:], xnom_ref[:])  # [CT, 1] x [1, ET] -> [CT, ET]
    idx = jnp.full(x.shape, -1, jnp.int32)
    for e_k in edges:
        idx = idx + (x >= jnp.float32(e_k)).astype(jnp.int32)
    static = static_ref[:]  # [1, ET] i32
    valid = (idx >= 0) & (idx < jnp.int32(n_axis_j)) & (static >= 0)
    bins = jnp.where(
        valid, static + idx * jnp.int32(stride_j), jnp.int32(n_bins)
    )  # [CT, ET]

    w2 = w * w
    cols_mc = []
    cols_w2 = []
    for b in range(n_bins):
        mask = (bins == jnp.int32(b)).astype(jnp.float32)
        cols_mc.append(jnp.sum(w * mask, axis=1, keepdims=True))
        cols_w2.append(jnp.sum(w2 * mask, axis=1, keepdims=True))
    pad = mc_ref.shape[1] - n_bins
    if pad:
        zero = jnp.zeros((w.shape[0], pad), jnp.float32)
        cols_mc.append(zero)
        cols_w2.append(zero)
    mc_ref[:] += jnp.concatenate(cols_mc, axis=1)
    w2_ref[:] += jnp.concatenate(cols_w2, axis=1)


def _kernel_shifted_blocked(
    selector_ref, base_ref, shiftv_ref, xnom_ref, static_ref, coeffs_ref,
    *refs,
    p_tile, n_ptiles, n_bins, shift_fn, edges, stride_j, n_axis_j, has_norm,
):
    """Param-BLOCKED shifted variant (reference-scale P): innermost grid axis
    streams [PT, K4, ET] coefficient blocks into a persistent [CT, ET]
    product scratch; the norm product, shifted binning, and mask-reduce
    histogram fire on the last param tile. See ``_kernel_shared_blocked``."""
    if has_norm:
        logext_ref, negext_ref, norm_s_ref, mc_ref, w2_ref, w_ref = refs
    else:
        mc_ref, w2_ref, w_ref = refs
    ee = pl.program_id(1)
    pe = pl.program_id(2)

    @pl.when(jnp.logical_and(ee == 0, pe == 0))
    def _():
        mc_ref[:] = jnp.zeros_like(mc_ref)
        w2_ref[:] = jnp.zeros_like(w2_ref)

    @pl.when(pe == 0)
    def _():
        w_ref[:] = base_ref[:]

    w = w_ref[:]
    for p in range(p_tile):
        resp = _resp_dot(selector_ref[:, p, :], coeffs_ref[p])
        w = w * resp
    w_ref[:] = w

    @pl.when(pe == n_ptiles - 1)
    def _():
        wf = w * _norm_weight(logext_ref, negext_ref, norm_s_ref) if has_norm else w
        _shifted_bin_histogram(
            wf, shiftv_ref, xnom_ref, static_ref, mc_ref, w2_ref,
            n_bins=n_bins, shift_fn=shift_fn, edges=edges,
            stride_j=stride_j, n_axis_j=n_axis_j,
        )


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_bins", "shift_fn", "edges", "stride_j", "n_axis_j",
        "chain_tile", "event_tile", "param_tile",
    ),
)
def fused_reweight_histogram_shifted(
    selector: jnp.ndarray,  # [C, P, K4] f32
    coeffs: jnp.ndarray,  # [P, K4, E] f32
    base_w: jnp.ndarray,  # [C, E] f32
    shift_vals: jnp.ndarray,  # [C] f32 — per-chain shift-parameter value
    x_nom: jnp.ndarray,  # [E] f32 — nominal shifted-variable values
    static_base: jnp.ndarray,  # [E] i32 — static-axis contribution (-1 invalid)
    n_bins: int,
    shift_fn,  # static callable (v [CT,1], x [1,ET]) -> [CT, ET], elementwise
    edges: tuple,  # static python floats: edges of the shifted axis
    stride_j: int,
    n_axis_j: int,
    chain_tile: int = 16,
    event_tile: int = 2048,
    param_tile: int | None = None,
    norm_ext: jnp.ndarray | None = None,  # [C, NPp1] extended norm values
    norm_s: jnp.ndarray | None = None,  # [NPp1, E] f32 static match counts
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Mask-reduce kernel with in-kernel shifted-axis binning (and, when
    ``norm_ext``/``norm_s`` are given, the in-kernel norm product). Returns
    (mc [C, B], w2 [C, B]) in f32.

    param_tile: when set (and < P) use the param-blocked formulation —
    required at reference-scale spline counts."""
    c, p, k4 = selector.shape
    e = coeffs.shape[2]
    # selector stays f32; bf16 coefficient tiles upcast INSIDE the
    # kernels (a bf16 selector added ~0.4% route-diverging rounding
    # on every response — caught by the r5 on-device parity gate)
    selector = selector.astype(jnp.float32)
    bp = -(-n_bins // 128) * 128
    has_norm = norm_ext is not None
    if param_tile is not None and param_tile < p:
        return _shifted_blocked_call(
            selector, coeffs, base_w, shift_vals, x_nom, static_base,
            n_bins, shift_fn, edges, stride_j, n_axis_j,
            chain_tile, event_tile, param_tile, norm_ext, norm_s,
        )
    cpad = -c % chain_tile
    epad = -e % event_tile
    if cpad:
        selector = jnp.pad(selector, ((0, cpad), (0, 0), (0, 0)))
        base_w = jnp.pad(base_w, ((0, cpad), (0, 0)))
        shift_vals = jnp.pad(shift_vals, ((0, cpad),))
        if has_norm:
            norm_ext = jnp.pad(norm_ext, ((0, cpad), (0, 0)), constant_values=1.0)
    if epad:
        coeffs = jnp.pad(coeffs, ((0, 0), (0, 0), (0, epad)))
        base_w = jnp.pad(base_w, ((0, 0), (0, epad)))
        x_nom = jnp.pad(x_nom, ((0, epad),))
        static_base = jnp.pad(static_base, ((0, epad),), constant_values=-1)
        if has_norm:
            norm_s = jnp.pad(norm_s, ((0, 0), (0, epad)))
    cp, ep = c + cpad, e + epad
    shift2d = shift_vals[:, None].astype(jnp.float32)
    xnom2d = x_nom[None, :].astype(jnp.float32)
    static2d = static_base[None, :].astype(jnp.int32)

    grid = (cp // chain_tile, ep // event_tile)
    kernel = functools.partial(
        _kernel_maskreduce_shifted,
        n_params=p, n_bins=n_bins, shift_fn=shift_fn,
        edges=edges, stride_j=stride_j, n_axis_j=n_axis_j, has_norm=has_norm,
    )
    i32 = jnp.int32
    in_specs = [
        pl.BlockSpec(
            (chain_tile, p, k4),
            lambda ce, ee: (ce, i32(0), i32(0)),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (chain_tile, event_tile),
            lambda ce, ee: (ce, ee),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (chain_tile, 1),
            lambda ce, ee: (ce, i32(0)),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, event_tile),
            lambda ce, ee: (i32(0), ee),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, event_tile),
            lambda ce, ee: (i32(0), ee),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (p, k4, event_tile),
            lambda ce, ee: (i32(0), i32(0), ee),
            memory_space=pltpu.VMEM,
        ),
    ]
    args = [selector, base_w, shift2d, xnom2d, static2d, coeffs]
    if has_norm:
        args += _norm_args(norm_ext, norm_s)
        in_specs += _norm_specs(norm_ext.shape[1], chain_tile, event_tile, 2)
    mc, w2 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((chain_tile, bp), lambda ce, ee: (ce, i32(0)), memory_space=pltpu.VMEM),
            pl.BlockSpec((chain_tile, bp), lambda ce, ee: (ce, i32(0)), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((cp, bp), jnp.float32),
            jax.ShapeDtypeStruct((cp, bp), jnp.float32),
        ),
    )(*args)
    return mc[:c, :n_bins], w2[:c, :n_bins]


def _shifted_blocked_call(
    selector, coeffs, base_w, shift_vals, x_nom, static_base,
    n_bins, shift_fn, edges, stride_j, n_axis_j,
    chain_tile, event_tile, param_tile, norm_ext, norm_s,
):
    """Padding + pallas_call for the param-blocked shifted kernel."""
    c, p, k4 = selector.shape
    e = coeffs.shape[2]
    bp = -(-n_bins // 128) * 128
    has_norm = norm_ext is not None
    cpad = -c % chain_tile
    epad = -e % event_tile
    ppad = -p % param_tile
    if cpad:
        selector = jnp.pad(selector, ((0, cpad), (0, 0), (0, 0)))
        base_w = jnp.pad(base_w, ((0, cpad), (0, 0)))
        shift_vals = jnp.pad(shift_vals, ((0, cpad),))
        if has_norm:
            norm_ext = jnp.pad(norm_ext, ((0, cpad), (0, 0)), constant_values=1.0)
    if epad:
        coeffs = jnp.pad(coeffs, ((0, 0), (0, 0), (0, epad)))
        base_w = jnp.pad(base_w, ((0, 0), (0, epad)))
        x_nom = jnp.pad(x_nom, ((0, epad),))
        static_base = jnp.pad(static_base, ((0, epad),), constant_values=-1)
        if has_norm:
            norm_s = jnp.pad(norm_s, ((0, 0), (0, epad)))
    if ppad:
        # Identity-response padding (selector e0 row x coefficient-1 row).
        sel_pad = jnp.zeros((selector.shape[0], ppad, k4), selector.dtype)
        sel_pad = sel_pad.at[:, :, 0].set(1)
        selector = jnp.concatenate([selector, sel_pad], axis=1)
        co_pad = jnp.zeros((ppad, k4, coeffs.shape[2]), coeffs.dtype)
        co_pad = co_pad.at[:, 0, :].set(1)
        coeffs = jnp.concatenate([coeffs, co_pad], axis=0)
    cp, ep, pp = c + cpad, e + epad, p + ppad
    shift2d = shift_vals[:, None].astype(jnp.float32)
    xnom2d = x_nom[None, :].astype(jnp.float32)
    static2d = static_base[None, :].astype(jnp.int32)

    n_ptiles = pp // param_tile
    grid = (cp // chain_tile, ep // event_tile, n_ptiles)
    kernel = functools.partial(
        _kernel_shifted_blocked,
        p_tile=param_tile, n_ptiles=n_ptiles, n_bins=n_bins,
        shift_fn=shift_fn, edges=edges, stride_j=stride_j,
        n_axis_j=n_axis_j, has_norm=has_norm,
    )
    i32 = jnp.int32
    in_specs = [
        pl.BlockSpec(
            (chain_tile, param_tile, k4),
            lambda ce, ee, pe: (ce, pe, i32(0)),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (chain_tile, event_tile),
            lambda ce, ee, pe: (ce, ee),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (chain_tile, 1),
            lambda ce, ee, pe: (ce, i32(0)),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, event_tile),
            lambda ce, ee, pe: (i32(0), ee),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, event_tile),
            lambda ce, ee, pe: (i32(0), ee),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (param_tile, k4, event_tile),
            lambda ce, ee, pe: (pe, i32(0), ee),
            memory_space=pltpu.VMEM,
        ),
    ]
    args = [selector, base_w, shift2d, xnom2d, static2d, coeffs]
    if has_norm:
        args += _norm_args(norm_ext, norm_s)
        in_specs += _norm_specs(norm_ext.shape[1], chain_tile, event_tile, 3)
    mc, w2 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((chain_tile, bp), lambda ce, ee, pe: (ce, i32(0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chain_tile, bp), lambda ce, ee, pe: (ce, i32(0)),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((cp, bp), jnp.float32),
            jax.ShapeDtypeStruct((cp, bp), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((chain_tile, event_tile), jnp.float32)],
    )(*args)
    return mc[:c, :n_bins], w2[:c, :n_bins]


def _kernel_shared(
    selector_ref, base_ref, bins_ref, coeffs_ref, *refs,
    n_params, n_bins_padded, has_norm,
):
    """Shared-bins variant: bins are chain-INVARIANT (no per-step kinematic
    shifts), so the histogram is ONE MXU matmul per tile —
    ``[2*CT, ET] @ onehot[ET, BP]`` — instead of the radix per-chain loop.
    The one-hot is built once per event tile from the [1, ET] bin ids.
    With ``has_norm``, refs = (logext, negext, norm_s, mc, w2) and the
    normalisation product runs in-kernel via :func:`_norm_weight` (removes
    three [C, E] XLA intermediates — measured 2.5 ms/step at 64 chains x
    200k events on the large fixture's atmo sample)."""
    if has_norm:
        logext_ref, negext_ref, norm_s_ref, mc_ref, w2_ref = refs
    else:
        mc_ref, w2_ref = refs
    ee = pl.program_id(1)

    @pl.when(ee == 0)
    def _():
        mc_ref[:] = jnp.zeros_like(mc_ref)
        w2_ref[:] = jnp.zeros_like(w2_ref)

    w = base_ref[:]
    for p in range(n_params):
        resp = _resp_dot(selector_ref[:, p, :], coeffs_ref[p])
        w = w * resp
    if has_norm:
        w = w * _norm_weight(logext_ref, negext_ref, norm_s_ref)

    bins = bins_ref[0]  # [ET] i32
    et = bins.shape[0]
    iota_b = jax.lax.broadcasted_iota(jnp.int32, (et, n_bins_padded), 1)
    onehot = (bins[:, None] == iota_b).astype(jnp.float32)  # [ET, BP]
    z = jnp.concatenate([w, w * w], axis=0)  # [2*CT, ET]
    res = dot_f32(z, onehot, (((1,), (0,)), ((), ())), exact="b")  # [2*CT, BP]
    ct = w.shape[0]
    mc_ref[:] += res[:ct]
    w2_ref[:] += res[ct:]


def _kernel_shared_blocked(
    selector_ref, base_ref, bins_ref, coeffs_ref, *refs,
    p_tile, n_ptiles, n_bins_padded, has_norm,
):
    """Param-BLOCKED shared-bins variant for reference-scale parameter counts
    (50-700 spline systematics, ``Splines/SplineMonolith.cpp:53-250``).

    The unrolled kernel holds the whole ``coeffs [P, K4, ET]`` block in VMEM
    and emits P dots of straight-line code — both explode past ~16 params.
    Here the grid gains an innermost param-tile axis: each step streams one
    ``[PT, K4, ET]`` coefficient block through VMEM and multiplies its
    responses into a persistent ``w [CT, ET]`` scratch accumulator; the
    histogram contraction fires once on the last param tile. VMEM and code
    size are now O(PT), not O(P), and Mosaic double-buffers the coefficient
    stream across grid steps. With ``has_norm``, the norm product fuses in
    on the last tile (refs gain logext/negext/norm_s, see _kernel_shared)."""
    if has_norm:
        logext_ref, negext_ref, norm_s_ref, mc_ref, w2_ref, w_ref = refs
    else:
        mc_ref, w2_ref, w_ref = refs
    ee = pl.program_id(1)
    pe = pl.program_id(2)

    @pl.when(jnp.logical_and(ee == 0, pe == 0))
    def _():
        mc_ref[:] = jnp.zeros_like(mc_ref)
        w2_ref[:] = jnp.zeros_like(w2_ref)

    @pl.when(pe == 0)
    def _():
        w_ref[:] = base_ref[:]

    w = w_ref[:]
    for p in range(p_tile):
        resp = _resp_dot(selector_ref[:, p, :], coeffs_ref[p])
        w = w * resp
    w_ref[:] = w

    @pl.when(pe == n_ptiles - 1)
    def _():
        wf = w * _norm_weight(logext_ref, negext_ref, norm_s_ref) if has_norm else w
        bins = bins_ref[0]  # [ET] i32
        et = bins.shape[0]
        iota_b = jax.lax.broadcasted_iota(jnp.int32, (et, n_bins_padded), 1)
        onehot = (bins[:, None] == iota_b).astype(jnp.float32)  # [ET, BP]
        z = jnp.concatenate([wf, wf * wf], axis=0)  # [2*CT, ET]
        res = dot_f32(z, onehot, (((1,), (0,)), ((), ())), exact="b")  # [2*CT, BP]
        ct = w.shape[0]
        mc_ref[:] += res[:ct]
        w2_ref[:] += res[ct:]


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_bins", "chain_tile", "event_tile", "param_tile", "nbl",
        "vmem_budget",
    ),
)
def fused_reweight_histogram_shared(
    selector: jnp.ndarray,  # [C, P, K4] f32
    coeffs: jnp.ndarray,  # [P, K4, E] f32
    base_w: jnp.ndarray,  # [C, E] f32
    bins: jnp.ndarray,  # [E] i32 shared across chains (n_bins = out of range)
    n_bins: int,
    chain_tile: int = 64,
    event_tile: int = 4096,
    param_tile: int | None = None,
    norm_ext: jnp.ndarray | None = None,  # [C, NPp1] extended norm values
    norm_s: jnp.ndarray | None = None,  # [NPp1, E] f32 static match counts
    tile_starts: jnp.ndarray | None = None,  # [E/ET] i32 128-aligned bin starts
    nbl: int | None = None,  # static local-bin width (multiple of 128)
    block_plan: jnp.ndarray | None = None,  # [E/ET, PEmax] i32 active blocks
    block_nact: jnp.ndarray | None = None,  # [E/ET] i32 active-block counts
    vmem_budget: int | None = None,  # sorted-route VMEM cap (tests shrink it)
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (mc [C, B], w2 [C, B]) in f32. Use when bins do not depend on
    the proposal (no functional kinematic shifts) — the common case.

    chain_tile=64 makes the histogram dot [2*CT, ET] @ [ET, BP] M-full
    (measured 1.4 ms vs 2.7 ms at CT=8 for 256 chains x 57k events).

    param_tile: when set (and < P), use the param-blocked kernel — the grid
    streams [param_tile]-sized coefficient blocks and carries the running
    response product in VMEM scratch. Required at reference-scale P.

    norm_ext/norm_s: when given, the normalisation product runs in-kernel via
    the log-matmul (see _norm_weight) instead of as XLA [C, E] intermediates.

    tile_starts/nbl: SORTED-bins fast path (events pre-sorted by bin at
    build). Each event tile then spans only a few bins, so the histogram's
    one-hot narrows from [ET, BP] to [NBL, ET] (NBL ~ 256 vs BP ~ 1280 at
    the large fixture — both the VPU one-hot build and the MXU contraction
    shrink ~BP/NBL-fold) and accumulates into the resident output at the
    tile's 128-aligned bin offset. Requires the param-blocked path."""
    c, p, k4 = selector.shape
    e = coeffs.shape[2]
    # selector stays f32; bf16 coefficient tiles upcast INSIDE the
    # kernels (a bf16 selector added ~0.4% route-diverging rounding
    # on every response — caught by the r5 on-device parity gate)
    selector = selector.astype(jnp.float32)
    has_norm = norm_ext is not None
    if param_tile is not None and param_tile < p:
        if tile_starts is not None and nbl is not None:
            return _shared_blocked_sorted_call(
                selector, coeffs, base_w, bins, n_bins,
                chain_tile, event_tile, param_tile, norm_ext, norm_s,
                tile_starts, nbl, block_plan, block_nact,
                vmem_budget=vmem_budget,
            )
        return _shared_blocked_call(
            selector, coeffs, base_w, bins, n_bins,
            chain_tile, event_tile, param_tile, norm_ext, norm_s,
        )
    # Lane-pad the bin axis; the garbage bin (n_bins) lands inside the padded
    # region's first slot and is sliced off with the rest of the padding.
    n_bins_padded = -(-(n_bins + 1) // 128) * 128
    cpad = -c % chain_tile
    epad = -e % event_tile
    if cpad:
        selector = jnp.pad(selector, ((0, cpad), (0, 0), (0, 0)))
        base_w = jnp.pad(base_w, ((0, cpad), (0, 0)))
        if has_norm:
            norm_ext = jnp.pad(norm_ext, ((0, cpad), (0, 0)), constant_values=1.0)
    if epad:
        coeffs = jnp.pad(coeffs, ((0, 0), (0, 0), (0, epad)))
        base_w = jnp.pad(base_w, ((0, 0), (0, epad)))
        bins = jnp.pad(bins, ((0, epad),), constant_values=n_bins)
        if has_norm:
            norm_s = jnp.pad(norm_s, ((0, 0), (0, epad)))
    cp, ep = c + cpad, e + epad
    bins2d = bins[None, :].astype(jnp.int32)

    grid = (cp // chain_tile, ep // event_tile)
    kernel = functools.partial(
        _kernel_shared, n_params=p, n_bins_padded=n_bins_padded,
        has_norm=has_norm,
    )
    i32 = jnp.int32
    in_specs = [
        pl.BlockSpec(
            (chain_tile, p, k4),
            lambda ce, ee: (ce, i32(0), i32(0)),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (chain_tile, event_tile),
            lambda ce, ee: (ce, ee),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, event_tile),
            lambda ce, ee: (i32(0), ee),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (p, k4, event_tile),
            lambda ce, ee: (i32(0), i32(0), ee),
            memory_space=pltpu.VMEM,
        ),
    ]
    args = [selector, base_w, bins2d, coeffs]
    if has_norm:
        args += _norm_args(norm_ext, norm_s)
        in_specs += _norm_specs(norm_ext.shape[1], chain_tile, event_tile, 2)
    mc, w2 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec(
                (chain_tile, n_bins_padded),
                lambda ce, ee: (ce, i32(0)),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (chain_tile, n_bins_padded),
                lambda ce, ee: (ce, i32(0)),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((cp, n_bins_padded), jnp.float32),
            jax.ShapeDtypeStruct((cp, n_bins_padded), jnp.float32),
        ),
    )(*args)
    return mc[:c, :n_bins], w2[:c, :n_bins]


def _kernel_shared_blocked_sorted(
    start_ref, plan_ref, nact_ref, selector_ref, base_ref, bins_ref,
    coeffs_ref, *refs,
    p_tile, n_ptiles, nbl, has_norm,
):
    """Param-blocked shared-bins kernel for BIN-SORTED events with an
    ACTIVITY PLAN.

    Response-product streaming as :func:`_kernel_shared_blocked`, with two
    sparsity exploits the wide kernel cannot have:

    * NARROW HISTOGRAM — events were sorted so this event tile's bins live
      in [start, start + NBL): the one-hot shrinks from [ET, BP] to
      [NBL, ET] and ONE dot contracts events for both mc and w2 into
      bin-major resident outputs updated at the dynamic sublane offset.
      Out-of-window bins (the padded garbage bin) match no row and drop —
      the wide kernel's slice-off semantics.
    * PLANNED PARAM BLOCKS — most spline systematics are mode/sample
      filtered, so most (param-block, event-tile) pairs are pure identity.
      ``plan_ref[ee, pe]`` names the pe-th ACTIVE coefficient block of this
      event tile (the BlockSpec index maps read it, so only active blocks
      are ever DMA'd; inactive slots repeat the previous block index —
      Mosaic skips the refetch) and ``nact_ref[ee]`` gates the multiply.
      This is the reference monolith's per-event spline-list sparsity
      (``SplineMonolith.cpp:209-210``) expressed as tile-level block
      skipping."""
    if has_norm:
        logext_ref, negext_ref, norm_s_ref, mc_ref, w2_ref, w_ref = refs
    else:
        mc_ref, w2_ref, w_ref = refs
    ee = pl.program_id(1)
    pe = pl.program_id(2)

    @pl.when(jnp.logical_and(ee == 0, pe == 0))
    def _():
        mc_ref[:] = jnp.zeros_like(mc_ref)
        w2_ref[:] = jnp.zeros_like(w2_ref)

    @pl.when(pe == 0)
    def _():
        w_ref[:] = base_ref[:]

    @pl.when(pe < nact_ref[ee])
    def _():
        w = w_ref[:]
        for p in range(p_tile):
            resp = _resp_dot(selector_ref[:, p, :], coeffs_ref[p])
            w = w * resp
        w_ref[:] = w

    @pl.when(pe == n_ptiles - 1)
    def _():
        w = w_ref[:]
        wf = w * _norm_weight(logext_ref, negext_ref, norm_s_ref) if has_norm else w
        start = start_ref[ee]
        bins = bins_ref[0]  # [ET] i32
        et = bins.shape[0]
        local = bins - start
        iota_b = jax.lax.broadcasted_iota(jnp.int32, (nbl, et), 0)
        onehot = (iota_b == local[None, :]).astype(jnp.float32)  # [NBL, ET]
        z = jnp.concatenate([wf, wf * wf], axis=0)  # [2*CT, ET]
        res = dot_f32(onehot, z, (((1,), (1,)), ((), ())), exact="a")  # [NBL, 2*CT]
        ct = w.shape[0]
        sl = pl.ds(start, nbl)
        mc_ref[sl, :] += res[:, :ct]
        w2_ref[sl, :] += res[:, ct:]


def _shared_blocked_sorted_call(
    selector, coeffs, base_w, bins, n_bins, chain_tile, event_tile, param_tile,
    norm_ext, norm_s, tile_starts, nbl, block_plan=None, block_nact=None,
    vmem_budget=None,
):
    """Padding + pallas_call for the bin-sorted param-blocked shared kernel.

    tile_starts: [ceil(E/ET)] i32, the 128-aligned bin offset of each event
    tile under THIS event_tile (computed at build from the sorted bin map);
    nbl: static window width (multiple of 128) covering every tile's span.
    Outputs are bin-major [BP, C] inside the kernel (dynamic sublane
    updates) and transposed back once outside."""
    c, p, k4 = selector.shape
    e = coeffs.shape[2]
    n_bins_padded = -(-(n_bins + 1) // 128) * 128
    # The dynamic window [start, start+nbl) must stay inside the padded bin
    # axis for every tile: extend the padded axis to the worst case.
    bp_out = max(
        n_bins_padded,
        int(-(-(n_bins + 1 + nbl) // 128) * 128),
    )
    has_norm = norm_ext is not None
    # The bin-major outputs put chains on the LANE axis, whose block must be
    # 128-divisible or the full array dim. The chain axis is therefore tiled
    # in 128-aligned blocks; when the whole axis does not fit VMEM the tile
    # SHRINKS and the grid grows a chain dimension (coefficient blocks are
    # then re-streamed cp/chain_tile times — cheap for sub-GB tables).
    # r4 regression: the old code forced ONE resident chain tile and fell
    # back to the wide kernel for c > ~256, which is how the 1024-chain toy
    # silently lost its narrow-histogram route (scaling 0.707x vs 256).
    na1 = norm_ext.shape[1] if has_norm else 0

    def vmem_for(ct: int) -> int:
        return 4 * (
            2 * bp_out * ct          # mc/w2 resident outputs
            + 2 * ct * event_tile    # base block + product scratch
            + nbl * event_tile       # one-hot
            + 2 * ct * max(nbl, 128)  # narrow dot result (z concat)
            + ct * param_tile * k4
            + 2 * ct * na1
            + na1 * event_tile
        ) + 2 * param_tile * k4 * event_tile

    budget = vmem_budget if vmem_budget is not None else 12 * 2**20
    chain_tile = -(-c // 128) * 128
    while chain_tile > 128 and vmem_for(chain_tile) > budget:
        chain_tile = max(128, (chain_tile // 2 // 128) * 128)
    if vmem_for(chain_tile) > budget:
        return _shared_blocked_call(
            selector, coeffs, base_w, bins, n_bins,
            min(chain_tile, 128), event_tile, param_tile, norm_ext, norm_s,
        )
    cpad = -c % chain_tile
    epad = -e % event_tile
    ppad = -p % param_tile
    if cpad:
        selector = jnp.pad(selector, ((0, cpad), (0, 0), (0, 0)))
        base_w = jnp.pad(base_w, ((0, cpad), (0, 0)))
        if has_norm:
            norm_ext = jnp.pad(norm_ext, ((0, cpad), (0, 0)), constant_values=1.0)
    if epad:
        coeffs = jnp.pad(coeffs, ((0, 0), (0, 0), (0, epad)))
        base_w = jnp.pad(base_w, ((0, 0), (0, epad)))
        bins = jnp.pad(bins, ((0, epad),), constant_values=n_bins)
        if has_norm:
            norm_s = jnp.pad(norm_s, ((0, 0), (0, epad)))
    if ppad:
        sel_pad = jnp.zeros((selector.shape[0], ppad, k4), selector.dtype)
        sel_pad = sel_pad.at[:, :, 0].set(1)
        selector = jnp.concatenate([selector, sel_pad], axis=1)
        co_pad = jnp.zeros((ppad, k4, coeffs.shape[2]), coeffs.dtype)
        co_pad = co_pad.at[:, 0, :].set(1)
        coeffs = jnp.concatenate([coeffs, co_pad], axis=0)
    cp, ep, pp = c + cpad, e + epad, p + ppad
    bins2d = bins[None, :].astype(jnp.int32)
    n_etiles = ep // event_tile
    if tile_starts.shape[0] != n_etiles:
        raise ValueError(
            f"tile_starts has {tile_starts.shape[0]} entries but the padded "
            f"event axis has {n_etiles} tiles of {event_tile} — the sample "
            "was built for a different event_tile"
        )

    n_blocks = pp // param_tile
    if block_plan is None:
        # Trivial plan: every block active for every tile.
        block_plan = jnp.broadcast_to(
            jnp.arange(n_blocks, dtype=jnp.int32)[None, :], (n_etiles, n_blocks)
        )
        block_nact = jnp.full((n_etiles,), n_blocks, jnp.int32)
    if block_plan.shape[0] != n_etiles:
        raise ValueError(
            f"block_plan has {block_plan.shape[0]} tiles but the padded "
            f"event axis has {n_etiles} — built for a different event_tile"
        )
    n_ptiles = int(block_plan.shape[1])  # grid extent = max active blocks
    assert cp % chain_tile == 0, (cp, chain_tile)
    grid = (cp // chain_tile, n_etiles, n_ptiles)
    kernel = functools.partial(
        _kernel_shared_blocked_sorted,
        p_tile=param_tile, n_ptiles=n_ptiles, nbl=nbl, has_norm=has_norm,
    )
    i32 = jnp.int32
    # Index maps read the scalar-prefetch refs (starts, plan, nact): the
    # selector/coeff block index comes from the PLAN, so inactive blocks are
    # never DMA'd (padding slots repeat the previous index -> no refetch).
    in_specs = [
        pl.BlockSpec(
            (chain_tile, param_tile, k4),
            lambda ce, ee, pe, st_, pl_, na_: (ce, pl_[ee, pe], i32(0)),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (chain_tile, event_tile),
            lambda ce, ee, pe, st_, pl_, na_: (ce, ee),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, event_tile),
            lambda ce, ee, pe, st_, pl_, na_: (i32(0), ee),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (param_tile, k4, event_tile),
            lambda ce, ee, pe, st_, pl_, na_: (pl_[ee, pe], i32(0), ee),
            memory_space=pltpu.VMEM,
        ),
    ]
    args = [selector, base_w, bins2d, coeffs]
    if has_norm:
        args += _norm_args(norm_ext, norm_s)
        cmap = lambda ce, ee, pe, st_, pl_, na_: (ce, i32(0))
        emap = lambda ce, ee, pe, st_, pl_, na_: (i32(0), ee)
        npp1 = norm_ext.shape[1]
        in_specs += [
            pl.BlockSpec((chain_tile, npp1), cmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((chain_tile, npp1), cmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((npp1, event_tile), emap, memory_space=pltpu.VMEM),
        ]
    mc_t, w2_t = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=grid,
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec(
                    (bp_out, chain_tile),
                    lambda ce, ee, pe, st_, pl_, na_: (i32(0), ce),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (bp_out, chain_tile),
                    lambda ce, ee, pe, st_, pl_, na_: (i32(0), ce),
                    memory_space=pltpu.VMEM,
                ),
            ],
            scratch_shapes=[pltpu.VMEM((chain_tile, event_tile), jnp.float32)],
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bp_out, cp), jnp.float32),
            jax.ShapeDtypeStruct((bp_out, cp), jnp.float32),
        ),
    )(
        tile_starts.astype(jnp.int32),
        block_plan.astype(jnp.int32),
        block_nact.astype(jnp.int32),
        *args,
    )
    return mc_t[:n_bins, :c].T, w2_t[:n_bins, :c].T


def hist_tile_plan(
    bins: "np.ndarray", n_bins: int, event_tile: int
) -> tuple["np.ndarray", int] | None:
    """(tile_starts [ceil(E/ET)], nbl) for the sorted narrow-histogram
    kernel, or None when the events are not bin-sorted / the window would
    not beat the wide kernel. Starts are 128-aligned; padding events
    (bin == n_bins appended by the kernel wrapper) may fall outside the
    window — they carry zero weight and drop."""
    bins = np.asarray(bins)
    if bins.size == 0:
        return None
    e = bins.size
    n_tiles = -(-e // event_tile)
    starts = np.zeros(n_tiles, np.int32)
    span_max = 0
    for t in range(n_tiles):
        tb = bins[t * event_tile : (t + 1) * event_tile]
        tb = tb[tb < n_bins]  # garbage bin drops out of the window
        if tb.size == 0:
            starts[t] = 0
            continue
        # min/max, not first/last: bins are only sorted WITHIN activity-
        # signature groups, and a tile may straddle a group boundary.
        start = (int(tb.min()) // 128) * 128
        starts[t] = start
        span_max = max(span_max, int(tb.max()) - start + 1)
    nbl = max(128, -(-span_max // 128) * 128)
    bp = -(-(n_bins + 1) // 128) * 128
    if nbl >= bp:  # window as wide as the full bin axis: no gain
        return None
    return starts, nbl


def plan_window_cuts(
    group_bins: list["np.ndarray"],
    group_nact: list[int],
    event_tile: int,
    n_bins: int,
    force_w: int | None = None,
) -> tuple[int, list[list[tuple[int, int]]]]:
    """Window-aware tile chunking for the bin-sorted kernel (r4 verdict #5).

    The narrow-histogram window NBL is STATIC — the max bin span over every
    event tile — so one sparse activity group whose few events spread across
    the bin axis drags the window wide for ALL tiles (the r4 atmo kernel
    paid a 640-of-1024 window, ~2.7 ms of its 3.4 ms). Fix: cut tiles so no
    tile spans more than W bins, padding each cut to the event tile with
    zero-weight events. Extra padded tiles are cheap (they stream only their
    group's active coefficient blocks); the W-fold narrower one-hot build +
    MXU contraction is paid by every tile.

    W is chosen by a cost model over multiples of 128, calibrated on the r4
    on-device decomposition (atmo, one v5e): per-tile cost
    ~ n_active_blocks + 1.65·(W/128) + 2 (fixed DMA/scratch overhead), all
    in active-block units.

    Returns (W, cuts) where cuts[g] is a list of (start, end) index ranges
    into group g's (bin-sorted) event list, each spanning <= W bins from its
    128-aligned window start.
    """
    bp = -(-(n_bins + 1) // 128) * 128
    ALPHA, BETA, GAMMA = 1.0, 1.65, 2.0

    def cuts_for(bins_g: "np.ndarray", w: int) -> list[tuple[int, int]]:
        out = []
        n = len(bins_g)
        i = 0
        while i < n:
            start_aligned = (int(bins_g[i]) // 128) * 128
            j = int(np.searchsorted(bins_g, start_aligned + w, side="left"))
            j = min(j, i + event_tile, n)
            out.append((i, j))
            i = j
        return out

    if force_w is not None:
        w_sel = max(128, -(-force_w // 128) * 128)
    else:
        best = None
        for w in range(128, bp + 128, 128):
            total = 0.0
            for bins_g, na in zip(group_bins, group_nact):
                n_tiles = len(cuts_for(bins_g, w))  # each cut is <= one tile
                total += n_tiles * (ALPHA * na + BETA * (w / 128) + GAMMA)
            if best is None or total < best[0]:
                best = (total, w)
        w_sel = best[1]
    return w_sel, [cuts_for(bins_g, w_sel) for bins_g in group_bins]


def _norm_args(norm_ext, norm_s):
    """Kernel operands of the in-kernel norm product: log|ext| (floored at
    1e-30 — f32 denormals flush to zero and log(0)·0 is NaN), the negative
    mask, and the static match-count matrix."""
    absext = jnp.maximum(jnp.abs(norm_ext.astype(jnp.float32)), 1e-30)
    return [
        jnp.log(absext),
        (norm_ext < 0).astype(jnp.float32),
        norm_s.astype(jnp.float32),
    ]


def _norm_specs(npp1, chain_tile, event_tile, n_grid_axes):
    """BlockSpecs matching :func:`_norm_args` for a 2- or 3-axis grid."""
    i32 = jnp.int32
    if n_grid_axes == 2:
        cmap = lambda ce, ee: (ce, i32(0))
        emap = lambda ce, ee: (i32(0), ee)
    else:
        cmap = lambda ce, ee, pe: (ce, i32(0))
        emap = lambda ce, ee, pe: (i32(0), ee)
    return [
        pl.BlockSpec((chain_tile, npp1), cmap, memory_space=pltpu.VMEM),
        pl.BlockSpec((chain_tile, npp1), cmap, memory_space=pltpu.VMEM),
        pl.BlockSpec((npp1, event_tile), emap, memory_space=pltpu.VMEM),
    ]


def _shared_blocked_call(
    selector, coeffs, base_w, bins, n_bins, chain_tile, event_tile, param_tile,
    norm_ext=None, norm_s=None,
):
    """Padding + pallas_call for the param-blocked shared-bins kernel."""
    c, p, k4 = selector.shape
    e = coeffs.shape[2]
    n_bins_padded = -(-(n_bins + 1) // 128) * 128
    has_norm = norm_ext is not None
    cpad = -c % chain_tile
    epad = -e % event_tile
    ppad = -p % param_tile
    if cpad:
        selector = jnp.pad(selector, ((0, cpad), (0, 0), (0, 0)))
        base_w = jnp.pad(base_w, ((0, cpad), (0, 0)))
        if has_norm:
            norm_ext = jnp.pad(norm_ext, ((0, cpad), (0, 0)), constant_values=1.0)
    if epad:
        coeffs = jnp.pad(coeffs, ((0, 0), (0, 0), (0, epad)))
        base_w = jnp.pad(base_w, ((0, 0), (0, epad)))
        bins = jnp.pad(bins, ((0, epad),), constant_values=n_bins)
        if has_norm:
            norm_s = jnp.pad(norm_s, ((0, 0), (0, epad)))
    if ppad:
        # Identity-response padding: selector rows pick coefficient row 0,
        # padded coefficient blocks put 1.0 there — resp == 1 exactly.
        sel_pad = jnp.zeros((selector.shape[0], ppad, k4), selector.dtype)
        sel_pad = sel_pad.at[:, :, 0].set(1)
        selector = jnp.concatenate([selector, sel_pad], axis=1)
        co_pad = jnp.zeros((ppad, k4, coeffs.shape[2]), coeffs.dtype)
        co_pad = co_pad.at[:, 0, :].set(1)
        coeffs = jnp.concatenate([coeffs, co_pad], axis=0)
    cp, ep, pp = c + cpad, e + epad, p + ppad
    bins2d = bins[None, :].astype(jnp.int32)

    n_ptiles = pp // param_tile
    grid = (cp // chain_tile, ep // event_tile, n_ptiles)
    kernel = functools.partial(
        _kernel_shared_blocked,
        p_tile=param_tile,
        n_ptiles=n_ptiles,
        n_bins_padded=n_bins_padded,
        has_norm=has_norm,
    )
    i32 = jnp.int32
    in_specs = [
        pl.BlockSpec(
            (chain_tile, param_tile, k4),
            lambda ce, ee, pe: (ce, pe, i32(0)),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (chain_tile, event_tile),
            lambda ce, ee, pe: (ce, ee),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, event_tile),
            lambda ce, ee, pe: (i32(0), ee),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (param_tile, k4, event_tile),
            lambda ce, ee, pe: (pe, i32(0), ee),
            memory_space=pltpu.VMEM,
        ),
    ]
    args = [selector, base_w, bins2d, coeffs]
    if has_norm:
        args += _norm_args(norm_ext, norm_s)
        in_specs += _norm_specs(norm_ext.shape[1], chain_tile, event_tile, 3)
    mc, w2 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec(
                (chain_tile, n_bins_padded),
                lambda ce, ee, pe: (ce, i32(0)),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (chain_tile, n_bins_padded),
                lambda ce, ee, pe: (ce, i32(0)),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((cp, n_bins_padded), jnp.float32),
            jax.ShapeDtypeStruct((cp, n_bins_padded), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((chain_tile, event_tile), jnp.float32)],
    )(*args)
    return mc[:c, :n_bins], w2[:c, :n_bins]


def spline_selector(table, params_batch: jnp.ndarray) -> jnp.ndarray:
    """Selector [C, P, K*4] for the kernel from a chain batch [C, NP]
    (same math as ``eval_dense``'s selector, flattened over (K, 4))."""
    from .eval import find_segments

    def one(params):
        values = params[table.param_index]
        seg, t = find_segments(table.knots_x, table.n_knots, values)
        kmax = table.knots_x.shape[1]
        seg_onehot = (
            jax.lax.broadcasted_iota(jnp.int32, (table.n_spline_params, kmax), 1)
            == seg[:, None]
        ).astype(FTYPE)
        tp = jnp.stack([jnp.ones_like(t), t, t * t, t * t * t], axis=-1)
        return (seg_onehot[:, :, None] * tp[:, None, :]).reshape(
            table.n_spline_params, kmax * 4
        )

    return jax.vmap(one)(params_batch)


def param_block_order(act: "np.ndarray") -> "np.ndarray":
    """Parameter permutation grouping identical activity patterns (params
    filtered to the same modes/samples share one pattern), so coefficient
    BLOCKS become activity-pure and tile-level skipping bites."""
    p = act.shape[0]
    groups: dict[bytes, list[int]] = {}
    for i in range(p):
        groups.setdefault(np.packbits(act[i]).tobytes(), []).append(i)
    return np.asarray([i for g in groups.values() for i in g], np.int64)


def event_block_signature(act: "np.ndarray", param_tile: int) -> "np.ndarray":
    """[E] i64 sort key: bitmask of which coefficient BLOCKS are active per
    event (blocks beyond 62 fold onto the top bit)."""
    p, e = act.shape
    n_blocks = -(-p // param_tile)
    sig = np.zeros(e, np.int64)
    for b in range(n_blocks):
        a = act[b * param_tile : (b + 1) * param_tile].any(axis=0)
        sig |= a.astype(np.int64) << min(b, 62)
    return sig


def param_block_plan(
    act: "np.ndarray", event_tile: int, param_tile: int
) -> tuple["np.ndarray", "np.ndarray"]:
    """(block_plan [n_etiles, PEmax] i32, block_nact [n_etiles] i32) for the
    planned kernel: per (padded) event tile, the indices of coefficient
    blocks with ANY active parameter; inactive slots repeat the last active
    index (same block -> Mosaic skips the DMA refetch) and are compute-gated
    by nact. Padding rows/columns (identity) are inactive by construction."""
    p, e = act.shape
    n_blocks = -(-p // param_tile)
    n_etiles = -(-e // event_tile)
    plan_rows = []
    nact = np.zeros(n_etiles, np.int32)
    for t in range(n_etiles):
        cols = act[:, t * event_tile : (t + 1) * event_tile]
        active = [
            b for b in range(n_blocks)
            if cols[b * param_tile : (b + 1) * param_tile].any()
        ]
        nact[t] = len(active)
        plan_rows.append(active)
    pe_max = max(1, int(nact.max()))
    plan = np.zeros((n_etiles, pe_max), np.int32)
    for t, row in enumerate(plan_rows):
        if not row:
            row = [0]
        padded = row + [row[-1]] * (pe_max - len(row))
        plan[t] = padded
    return plan, nact
