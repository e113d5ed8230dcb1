"""Automatic fused-kernel (Pallas) vs XLA routing.

The fused reweight kernel's own contract (``splines/pallas_reweight.py:20``)
says large bin counts must fall back to the XLA path; the kernels also unroll
python loops over spline parameters and (in the mask-reduce variants) over
bins, and hold ``coeffs [P, K4, event_tile]`` resident in VMEM — all hard
static limits. This module turns those limits into a routing decision made
once at ``build_sample_model`` time from static properties only, replacing
the bare ``use_pallas`` caller flag (VERDICT r1 item 2).

Mirrors the reference's implicit routing: ``SMonolith`` chooses CPU vs GPU
eval at build time from what was compiled in (``Splines/SplineMonolith.cpp``),
but here the choice is per-sample and derived from measured kernel limits
(see CLAUDE.md "TPU performance lessons").
"""
from __future__ import annotations

import dataclasses

from ..core.logging import get_logger

_log = get_logger("routing")

#: Scoped VMEM on current TPUs is 16 MB; leave headroom for Mosaic temporaries.
VMEM_BUDGET = 12 * 1024 * 1024
#: Documented kernel contract: beyond this many bins, take the XLA path.
MAX_PALLAS_BINS = 4096
#: Mask-reduce variants unroll one mask + two reductions PER BIN: past a few
#: hundred bins compile time and code size explode.
MAX_MASKREDUCE_BINS = 512
#: Past this many spline params, the unrolled per-param dot chain is replaced
#: by the param-blocked kernel (shared variant) or the XLA path (the
#: mask-reduce variants, which have no blocked formulation yet).
MAX_UNROLL_PARAMS = 16
#: Param-tile of the blocked kernel: one [PT, K4, ET] coefficient block is
#: streamed through VMEM per grid step.
PARAM_TILE = 8
#: Below this event tile the grid overhead dominates any fusion win.
MIN_EVENT_TILE = 256
_F32 = 4


@dataclasses.dataclass(frozen=True)
class KernelRoute:
    """The routing decision recorded on the SampleModel."""

    use_pallas: bool
    variant: str  # "shared" | "shifted" | "generic" | "xla"
    chain_tile: int = 16
    event_tile: int = 2048
    # Param-blocked kernel (shared variant only): stream [param_tile]-sized
    # coefficient blocks instead of unrolling all P params. None = unrolled.
    param_tile: int | None = None
    reason: str = ""
    # The caller's original request, kept so a binning swap can re-route.
    requested: object = "auto"


def _vmem_bytes(variant: str, p: int, k4: int, ct: int, et: int, bp: int,
                n_norm: int = 0, pt: int | None = None) -> int:
    """Static VMEM estimate for one (chain_tile, event_tile) kernel block.

    pt (param-blocked shared variant): only a double-buffered [PT, K4, ET]
    coefficient block plus a [CT, ET] product scratch are resident, not the
    whole [P, K4, ET] block.
    """
    if pt is not None:
        coeffs = 2 * pt * k4 * et  # double-buffered stream
        selector = ct * pt * k4
        scratch = ct * et
    else:
        coeffs = p * k4 * et
        selector = ct * p * k4
        scratch = 0
    base = ct * et
    out = 2 * ct * bp
    if variant == "shared":
        # one-hot [ET, BP] + z [2CT, ET] + res [2CT, BP] + bins [ET]
        # + in-kernel norm matrices when fused
        extra = et * bp + 2 * ct * et + 2 * ct * bp + et
        extra += 2 * ct * (n_norm + 1) + (n_norm + 1) * et
    elif variant == "shifted":
        # x/idx/masks [CT, ET] temporaries + norm matrices when fused
        extra = 4 * ct * et + 2 * ct * (n_norm + 1) + (n_norm + 1) * et
    else:  # generic mask-reduce: bins [CT, ET] + w2 + mask temporaries
        extra = 4 * ct * et
    return _F32 * (coeffs + selector + scratch + base + out + extra)


def _pad128(n: int) -> int:
    return -(-n // 128) * 128


def choose_kernel_route(
    n_bins: int,
    spline_table,
    has_static_bins: bool,
    has_kernel_shift: bool,
    n_norm_in_kernel: int = 0,
    requested: bool | str = "auto",
) -> KernelRoute:
    """Pick the kernel variant + tile sizes, or the XLA fallback.

    requested: ``"auto"`` routes freely; ``True`` prefers Pallas but still
    falls back when statically infeasible (with a warning); ``False`` forces
    the XLA path.
    """
    import jax

    from ..splines.monolith import DenseSplineTable

    if requested is False:
        return KernelRoute(False, "xla", reason="disabled by caller",
                           requested=requested)
    if not isinstance(spline_table, DenseSplineTable):
        return KernelRoute(
            False, "xla",
            reason="no dense spline table (fused kernel needs the matmul-layout monolith)",
            requested=requested,
        )
    if requested == "auto" and jax.default_backend() != "tpu":
        # Mosaic kernels only compile for TPU; tests that want the interpreter
        # path on CPU pass requested=True explicitly.
        return KernelRoute(
            False, "xla",
            reason=f"backend is {jax.default_backend()}, not tpu",
            requested=requested,
        )
    if n_bins > MAX_PALLAS_BINS:
        return _fallback(requested, f"n_bins={n_bins} > {MAX_PALLAS_BINS}")

    p = int(spline_table.n_spline_params)
    k4 = int(spline_table.knots_x.shape[1]) * 4

    pt = None
    if has_static_bins:
        variant, ct, bp = "shared", 64, _pad128(n_bins + 1)
        if p > MAX_UNROLL_PARAMS:
            pt = PARAM_TILE  # reference-scale P: stream coefficient blocks
    elif has_kernel_shift:
        # CT=64: the mask-reduce histogram's VPU cost is CT-independent
        # (total work ∝ B·C·E), but the coefficient stream is re-read
        # C/CT times — measured 2.98 -> 2.04 ms going 16 -> 64 on the
        # large fixture's 60k-event shifted sample at 128 chains (r4).
        variant, ct, bp = "shifted", 64, _pad128(n_bins)
        if n_bins > MAX_MASKREDUCE_BINS:
            return _fallback(
                requested,
                f"n_bins={n_bins} > {MAX_MASKREDUCE_BINS} for the unrolled "
                "mask-reduce (shifted) variant",
            )
        if p > MAX_UNROLL_PARAMS:
            pt = PARAM_TILE  # blocked formulation, same as shared
    else:
        variant, ct, bp = "generic", 16, _pad128(n_bins)
        if n_bins > MAX_MASKREDUCE_BINS:
            return _fallback(
                requested,
                f"n_bins={n_bins} > {MAX_MASKREDUCE_BINS} for the unrolled "
                "mask-reduce (generic, per-chain bins) variant",
            )
        if p > MAX_UNROLL_PARAMS:
            return _fallback(
                requested,
                f"P={p} > {MAX_UNROLL_PARAMS} spline params for the unrolled "
                "generic variant (no blocked formulation)",
            )

    # Shrink the event tile until the block fits the VMEM budget.
    et = 4096 if variant == "shared" else 2048
    while et >= MIN_EVENT_TILE and _vmem_bytes(
        variant, p, k4, ct, et, bp, n_norm_in_kernel, pt
    ) > VMEM_BUDGET:
        et //= 2
    if et < MIN_EVENT_TILE:
        return _fallback(
            requested,
            f"VMEM estimate exceeds budget even at event_tile={MIN_EVENT_TILE} "
            f"(P={p}, K4={k4}, bins={n_bins})",
        )
    route = KernelRoute(
        True, variant, chain_tile=ct, event_tile=et, param_tile=pt,
        reason=f"P={p}, K4={k4}, bins={n_bins}, "
        f"vmem~{_vmem_bytes(variant, p, k4, ct, et, bp, n_norm_in_kernel, pt) >> 20} MB"
        + (f", param_tile={pt}" if pt else ""),
        requested=requested,
    )
    _log.info(
        "kernel route: %s (chain_tile=%d, event_tile=%d) — %s",
        route.variant, route.chain_tile, route.event_tile, route.reason,
    )
    return route


def _fallback(requested: bool | str, why: str) -> KernelRoute:
    if requested is True:
        _log.warning("use_pallas requested but statically infeasible: %s — "
                     "falling back to the XLA path", why)
    else:
        _log.info("kernel route: xla — %s", why)
    return KernelRoute(False, "xla", reason=why, requested=requested)
