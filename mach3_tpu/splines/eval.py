"""Spline-monolith evaluation kernels (pure jnp; Pallas variant in pallas_eval).

Replaces the reference's segment-search + CUDA evaluation pipeline:

* ``SplineBase::FindSplineSegment`` (``Splines/SplineBase.cpp:44-110``) — the
  reference caches the last segment per parameter and walks neighbours before a
  binary search, once per step on the host. On TPU a vectorised
  ``searchsorted`` over all parameters at once is cheaper than any caching.
* ``EvalOnGPU_Splines`` / ``EvalOnGPU_TotWeight`` (``gpuSplineUtils.cu:337-439``)
  — one thread per spline + one per event with texture-memory index maps.
  Here: one fused array program; the per-event product is a dense reduction
  (dense layout) or a padded gather + product (sparse layout). No host
  round-trip: the weights stay on-chip for the histogram fill.

All functions take the *full* proposed parameter vector and gather the spline
subset via ``table.param_index``; they are vmappable over a chain batch axis.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.precision import FTYPE
from .monolith import DenseSplineTable, SparseSplineTable


def find_segments(
    knots_x: jnp.ndarray, n_knots: jnp.ndarray, values: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Vectorised segment search over all spline parameters.

    knots_x: [P, K] (+inf padded), n_knots: [P], values: [P]
    Returns (segment [P] i32, t [P] f32) with the segment clamped to
    [0, n_knots-2] (cubic extrapolation past the ends, matching the reference
    kernel's clamped-segment semantics).
    """
    values = values.astype(FTYPE)
    # searchsorted per row: count knots strictly below the value.
    # dtype=int32 throughout — int64 is unsupported on the TPU backend.
    below = jnp.sum((knots_x < values[:, None]).astype(jnp.int32), axis=1, dtype=jnp.int32)
    seg = jnp.clip(below - 1, 0, n_knots - 2)
    t = values - jnp.take_along_axis(knots_x, seg[:, None], axis=1)[:, 0]
    return seg.astype(jnp.int32), t.astype(FTYPE)


def _cubic(coeffs: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Horner/FMA evaluation; coeffs [..., 4] = (y, b, c, d)."""
    y, b, c, d = coeffs[..., 0], coeffs[..., 1], coeffs[..., 2], coeffs[..., 3]
    return y + t * (b + t * (c + t * d))


def eval_dense(
    table: DenseSplineTable, params: jnp.ndarray, exact: bool = False
) -> jnp.ndarray:
    """Per-event total spline weight from the dense matmul-layout table.

    params: full proposal vector [NP] -> weights [E] f32.

    exact=False (production): responses evaluate in the same DEVIATION-form
    bf16 numeric as the fused kernels (see below) — the framework's defined
    spline-response precision (~0.4% of |resp − 1|). exact=True evaluates
    in full f32 — the oracle path for coefficient-construction tests.

    MXU formulation: the response of parameter p is a polynomial in the local
    coordinate t whose coefficients live in the active segment row —
    equivalently ``selector[K, 4] . coeffs[p, K, 4, E]`` where the selector is
    ``onehot(seg_p) x (1, t, t², t³)``. Contracting (K, 4) is a matmul with
    reduction size K*4; under ``vmap`` over chains the selector gains a batch
    row and the whole chain batch becomes ONE batched matmul per table —
    coefficients are read once for all chains (the reference's CUDA kernel
    re-reads per thread; the earlier gather formulation re-read per chain).
    """
    values = params[table.param_index]
    seg, t = find_segments(table.knots_x, table.n_knots, values)
    kmax = table.knots_x.shape[1]
    # Selector [P, K, 4]: one-hot over the active segment x powers of t.
    seg_onehot = (
        jax.lax.broadcasted_iota(jnp.int32, (table.n_spline_params, kmax), 1)
        == seg[:, None]
    ).astype(FTYPE)
    tp = jnp.stack([jnp.ones_like(t), t, t * t, t * t * t], axis=-1)  # [P, 4]
    selector = (seg_onehot[:, :, None] * tp[:, None, :]).reshape(
        table.n_spline_params, -1
    )  # [P, K*4] — matches the table's flat coefficient layout
    # Batched contraction over K*4 in DEVIATION form — the numeric twin of
    # the fused kernels' response dot (pallas_reweight._resp_dot):
    # resp = 1 + sel @ (coeffs − I) with I the identity-response pattern
    # (ones at constant-term rows), both operands rounded to bf16 so ONE
    # MXU pass rounds only the deviation from unity (~2e-4 of a response).
    # Matching the rounding here keeps fused-vs-XLA parity at f32
    # accumulation-order level on hardware.
    if exact:
        w = jnp.einsum(
            "pk,pke->pe", selector, table.coeffs, preferred_element_type=FTYPE,
            precision=jax.lax.Precision.HIGHEST,
        )
        return jnp.prod(w, axis=0)
    k4 = table.coeffs.shape[1]
    iota = jax.lax.broadcasted_iota(jnp.int32, (k4, 1), 0)
    ident = (jnp.bitwise_and(iota, jnp.int32(3)) == 0).astype(table.coeffs.dtype)
    dev = table.coeffs - ident[None, :, :]
    # bf16 ROUNDING simulated by round-trip casts + an exact f32 contraction:
    # same values as a native bf16 MXU pass (f32 accumulation), and portable
    # (the CPU runtime rejects batched bf16 x bf16 -> f32 einsums).
    sel_r = selector.astype(jnp.bfloat16).astype(FTYPE)
    dev_r = dev.astype(jnp.bfloat16).astype(FTYPE)
    w = 1.0 + jnp.einsum(
        "pk,pke->pe", sel_r, dev_r, preferred_element_type=FTYPE,
        precision=jax.lax.Precision.HIGHEST,
    )
    return jnp.prod(w, axis=0)


def eval_sparse(table: SparseSplineTable, params: jnp.ndarray) -> jnp.ndarray:
    """Per-event total spline weight from the sparse flat-spline table.

    params: [NP] -> weights [E] f32. Gathers each spline's active-segment
    coefficients ([S, 4]), evaluates the cubic, then multiplies each event's
    (padded) spline set — the reference's per-event product kernel
    (``EvalOnGPU_TotWeight``) as a gather + row-product.
    """
    values = params[table.param_index]
    seg, t = find_segments(table.knots_x, table.n_knots, values)
    seg_per_spline = seg[table.spline_param]  # [S+1]
    t_per_spline = t[table.spline_param]  # [S+1]
    active = jnp.take_along_axis(
        table.spline_coeffs, seg_per_spline[:, None, None], axis=1
    )[:, 0]  # [S+1, 4]
    w = _cubic(active, t_per_spline)  # [S+1]
    # Padding rows index the unit spline (last row, response exactly 1).
    per_event = w[table.event_splines]  # [E, W]
    return jnp.prod(per_event, axis=1)


def eval_dense_batched(table: DenseSplineTable, params: jnp.ndarray) -> jnp.ndarray:
    """[C, NP] -> [C, E]: vmap of eval_dense over a chain batch axis."""
    return jax.vmap(lambda p: eval_dense(table, p))(params)


def eval_sparse_batched(table: SparseSplineTable, params: jnp.ndarray) -> jnp.ndarray:
    """[C, NP] -> [C, E]."""
    return jax.vmap(lambda p: eval_sparse(table, p))(params)
