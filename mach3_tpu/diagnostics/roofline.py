"""Roofline accounting for the per-step likelihood: bytes moved and FLOPs
per component vs chip peaks (BASELINE.md "speed-of-light per chip").

The reference's only performance accounting is wall-time printouts
(``DragRace``, ``Fitters/FitterBase.cpp:461-520``; monolith memory printout,
``Splines/SplineMonolith.cpp:832-849``). Here the budget is derived from the
actual array shapes of a :class:`~mach3_tpu.fitters.model.FitModel`, so
"what fraction of speed-of-light are we at" is a computable number:

* **HBM bytes** — the usual bound. Per step at C chains, each sample moves
  its spline-coefficient table once (the param-blocked kernel streams it for
  ALL chains — the design's point), a handful of [C, E] f32 passes for the
  base-weight assembly (osc gather, norm product, MC weight multiply, kernel
  read), the [NP+1, E] norm match-count matrix once, and the [C, 2B]
  histogram out.
* **MXU FLOPs** — the spline contraction (selector [C, K4] x coeffs [K4, E]
  per parameter) and the norm log-matmul. Tiny relative to peak: the step is
  memory-bound by design, which the budget makes explicit.
* **f64-emulated transcendentals** — oscillation eigensolves are counted
  separately: they are compute-bound on SOFTWARE-emulated f64 ops (measured
  16-26x scalar slowdown), so their "roofline" is an effective rate, not the
  hardware peak.

Peaks default to TPU v5e (single chip): 819 GB/s HBM, 394 TFLOP/s bf16 /
197 TFLOP/s f32 MXU.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import numpy as np

from ..core.logging import get_logger

_log = get_logger("roofline")

V5E_HBM_GBPS = 819.0
V5E_BF16_TFLOPS = 394.0
V5E_F32_TFLOPS = 197.0


@dataclasses.dataclass
class ComponentBudget:
    name: str
    hbm_bytes: int = 0
    mxu_flops: int = 0
    f64_transcendentals: int = 0  # emulated sqrt/trig/arccos count

    def floor_ms(self, hbm_gbps: float = V5E_HBM_GBPS, mxu_tflops: float = V5E_BF16_TFLOPS) -> float:
        """Memory/compute floor (max of the two laws), ignoring the emulated
        f64 term (no hardware peak exists for it — report the count)."""
        t_mem = self.hbm_bytes / (hbm_gbps * 1e9)
        t_mxu = self.mxu_flops / (mxu_tflops * 1e12)
        return 1e3 * max(t_mem, t_mxu)


def _nbytes(arr) -> int:
    return int(np.prod(arr.shape)) * arr.dtype.itemsize


def sample_budget(s: Any, n_chains: int) -> list[ComponentBudget]:
    """Per-step budget of one SampleModel at C chains."""
    c, e, b = n_chains, s.n_events, s.n_bins
    f32 = 4
    out = []

    # ---- oscillation grids + per-event gather
    if s.osc is not None:
        osc = ComponentBudget(f"{s.name}:osc")
        from ..samples.sample import AtmoOscConfig

        if isinstance(s.osc, AtmoOscConfig):
            nz, nl = s.osc.layer_lengths.shape[-2], s.osc.layer_lengths.shape[-1]
            ne = s.osc.e_grid.shape[0]
            nh = 1 if s.osc.height_weights is None else len(s.osc.height_weights)
            # eigensolves: one per unique (rho, E) pair per chain per nu/nubar
            nr = nl if s.osc.rho_unique is None else s.osc.rho_unique.shape[0]
            n_eig = 2 * c * nr * ne
            # ~6 emulated f64 transcendentals per eigensolve seed-polish path
            # (1 sqrt in Newton deflation + range-reduced trig in the phases);
            # per (z, layer, E) evolution: 3 sincos pairs
            osc.f64_transcendentals = n_eig * 2 + 2 * c * nh * nz * nl * ne * 6
            osc.hbm_bytes = 2 * c * nz * ne * 9 * f32  # grids out
        else:
            ne = s.osc.e_grid.shape[0]
            osc.f64_transcendentals = 2 * c * ne * (2 + 6)
            osc.hbm_bytes = 2 * c * ne * 9 * f32
        # per-event gather: read table (above) + write [C, E] weights
        osc.hbm_bytes += c * e * f32
        out.append(osc)

    # ---- norm product
    norm = ComponentBudget(f"{s.name}:norm")
    if s.norm_s is not None:
        norm.hbm_bytes = _nbytes(s.norm_s) + c * e * f32  # S once + [C,E] out
        npp1 = s.norm_s.shape[0]
        norm.mxu_flops = 2 * c * npp1 * e * 3  # log/neg/zero matmuls
    elif s.norm_onehot is not None:
        norm.hbm_bytes = _nbytes(s.norm_onehot) + c * e * f32
        norm.mxu_flops = 2 * c * s.norm_onehot.shape[0] * s.norm_onehot.shape[1]
    out.append(norm)

    # ---- base-weight assembly: mc_weight x osc x norm (x tf1) multiply
    # chains-batched elementwise passes over [C, E]
    passes = 2 + (1 if s.tf1_table is not None else 0)
    out.append(
        ComponentBudget(f"{s.name}:base_w", hbm_bytes=passes * c * e * f32 + e * f32)
    )

    # ---- fused spline kernel: coeffs once + base_w in + hist out
    if s.spline_table is not None:
        k = ComponentBudget(f"{s.name}:kernel")
        tb = s.spline_table.coeffs
        k.hbm_bytes = _nbytes(tb) + c * e * f32 + 2 * c * b * f32
        p_dim, k4 = tb.shape[0], tb.shape[1]  # flat [P, K4, E]
        k.mxu_flops = 2 * c * p_dim * k4 * e
        out.append(k)

    # ---- test statistic: [C, B] in f64
    out.append(ComponentBudget(f"{s.name}:llh", hbm_bytes=3 * c * b * 8))
    return out


def model_budget(model: Any, n_chains: int) -> list[ComponentBudget]:
    out = [
        ComponentBudget(
            "proposal", hbm_bytes=3 * n_chains * model.n_params * 8,
            mxu_flops=2 * n_chains * model.n_params**2,
        )
    ]
    # osc-shared groups: only the group leader pays the grid cost
    groups = model.osc_groups or ()
    for i, s in enumerate(model.samples):
        comps = sample_budget(s, n_chains)
        if groups and groups[i] >= 0 and groups[i] != i:
            comps = [c for c in comps if not c.name.endswith(":osc")]
        out.extend(comps)
    return out


def report(
    model: Any,
    n_chains: int,
    measured_step_ms: float | None = None,
    hbm_gbps: float = V5E_HBM_GBPS,
    mxu_tflops: float = V5E_BF16_TFLOPS,
) -> dict:
    """Budget dict: per-component bytes/FLOPs/floors + totals + (optionally)
    the measured step time's fraction of the memory-bound floor."""
    comps = model_budget(model, n_chains)
    total_bytes = sum(c.hbm_bytes for c in comps)
    total_flops = sum(c.mxu_flops for c in comps)
    total_f64 = sum(c.f64_transcendentals for c in comps)
    floor = sum(c.floor_ms(hbm_gbps, mxu_tflops) for c in comps)
    rep = {
        "n_chains": n_chains,
        "hbm_gbytes_per_step": round(total_bytes / 1e9, 4),
        "mxu_gflops_per_step": round(total_flops / 1e9, 2),
        "f64_transcendentals_per_step": int(total_f64),
        "memory_floor_ms": round(total_bytes / (hbm_gbps * 1e9) * 1e3, 3),
        "mxu_floor_ms": round(total_flops / (mxu_tflops * 1e12) * 1e3, 4),
        "combined_floor_ms": round(floor, 3),
        "components": {
            c.name: {
                "mbytes": round(c.hbm_bytes / 1e6, 2),
                "gflops": round(c.mxu_flops / 1e9, 2),
                "f64_transc": int(c.f64_transcendentals),
                "floor_ms": round(c.floor_ms(hbm_gbps, mxu_tflops), 4),
            }
            for c in comps
        },
    }
    if measured_step_ms is not None:
        rep["measured_step_ms"] = round(measured_step_ms, 3)
        rep["fraction_of_memory_floor"] = round(
            rep["memory_floor_ms"] / measured_step_ms, 3
        )
    return rep
