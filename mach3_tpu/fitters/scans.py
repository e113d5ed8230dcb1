"""Likelihood scans, sigma variations, and micro-benchmarks.

TPU-native equivalent of ``FitterBase``'s validation tools:

* ``RunLLHScan``  (``Fitters/FitterBase.cpp:622-885``) — 1D per-parameter scans
  of total/sample/penalty LLH. The reference loops parameters serially and
  reweights per point; here every scan point of every parameter is one row of
  a batched vmap — the full scan is a single jitted call.
* ``Run2DLLHScan`` (``:936``) and ``RunLLHMap`` (``:1039``) — 2D / n-dim grids.
* ``RunSigmaVar`` (``:1387``) — ±σ spectral variations per parameter.
* ``GetStepScaleBasedOnLLHScan`` (``:887``) — step-size suggestion from scan
  curvature.
* ``DragRace`` (``:461-520``) — per-component timing.
"""
from __future__ import annotations

import time
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core.logging import get_logger
from ..core.precision import ATYPE
from .model import FitModel

_log = get_logger("scans")


def _jit_vmap_with_model(model, fn, *args):
    """vmap ``fn(model, *row)`` over ``args`` with the model passed as a jit
    ARGUMENT: its (GB-scale at reference size) tables travel as device
    buffers instead of baked HLO constants, which the remote TPU compile
    service rejects (see ``mcmc.make_step_fn_args``)."""
    g = jax.jit(lambda m, *a: jax.vmap(lambda *r: fn(m, *r))(*a))
    return g(model, *args)


def _scan_grid(
    model: FitModel, indices: Sequence[int], n_points: int, n_sigma: float
) -> np.ndarray:
    """Per-parameter scan values: prefit ± n_sigma * prior error, clipped to
    bounds (the reference takes ranges from config or the covariance)."""
    prefit = np.asarray(model.prefit_vector())
    grids = []
    for idx in indices:
        # locate the owning prior block for error/bounds
        for prior, (start, size) in zip(model.priors, model.slices):
            if start <= idx < start + size:
                local = idx - start
                # prior stddev from the throw matrix
                cov = np.asarray(prior.chol) @ np.asarray(prior.chol).T
                err = float(np.sqrt(cov[local, local]))
                lo = max(prefit[idx] - n_sigma * err, float(prior.low_bound[local]))
                hi = min(prefit[idx] + n_sigma * err, float(prior.up_bound[local]))
                grids.append(np.linspace(lo, hi, n_points))
                break
    return np.stack(grids)  # [len(indices), n_points]


def llh_scan_1d(
    model: FitModel,
    indices: Sequence[int] | None = None,
    n_points: int = 41,
    n_sigma: float = 3.0,
) -> dict[str, np.ndarray]:
    """1D LLH scans for each requested parameter (default: all).

    Returns {"values": [P, N], "total": [P, N], "penalty": [P, N],
    "samples": [P, N, n_samples]} — the per-sample split the reference offers
    as ``LLHScanBySample``.
    """
    if indices is None:
        indices = list(range(model.n_params))
    prefit = np.asarray(model.prefit_vector())
    grid = _scan_grid(model, indices, n_points, n_sigma)  # [P, N]

    idx_arr = jnp.asarray(np.repeat(indices, n_points), jnp.int32)
    val_arr = jnp.asarray(grid.reshape(-1), ATYPE)
    base = jnp.asarray(prefit, ATYPE)

    def eval_point(m, i, v):
        theta = base.at[i].set(v)
        return (
            m.prior_nll(theta),
            m.sample_nll_breakdown(theta),
        )

    penalty, samples = _jit_vmap_with_model(model, eval_point, idx_arr, val_arr)
    penalty = np.asarray(penalty).reshape(len(indices), n_points)
    samples = np.asarray(samples).reshape(len(indices), n_points, -1)
    total = penalty + samples.sum(axis=-1)
    return {"values": grid, "total": total, "penalty": penalty, "samples": samples}


def llh_scan_2d(
    model: FitModel,
    index_x: int,
    index_y: int,
    n_points: int = 31,
    n_sigma: float = 3.0,
) -> dict[str, np.ndarray]:
    """2D LLH scan over a parameter pair (``Run2DLLHScan``)."""
    gx = _scan_grid(model, [index_x], n_points, n_sigma)[0]
    gy = _scan_grid(model, [index_y], n_points, n_sigma)[0]
    xx, yy = np.meshgrid(gx, gy, indexing="ij")
    base = jnp.asarray(np.asarray(model.prefit_vector()), ATYPE)

    def eval_point(m, vx, vy):
        theta = base.at[index_x].set(vx).at[index_y].set(vy)
        return m.total_nll(theta)

    total = _jit_vmap_with_model(
        model, eval_point,
        jnp.asarray(xx.reshape(-1), ATYPE), jnp.asarray(yy.reshape(-1), ATYPE),
    )
    return {
        "x": gx,
        "y": gy,
        "total": np.asarray(total).reshape(n_points, n_points),
    }


def llh_map(
    model: FitModel, indices: Sequence[int], points_per_axis: int = 11, n_sigma: float = 2.0
) -> dict[str, np.ndarray]:
    """n-dim LLH grid (``RunLLHMap``): full cartesian product, one vmapped call.
    Use few axes — the grid is exponential."""
    grids = _scan_grid(model, indices, points_per_axis, n_sigma)
    mesh = np.meshgrid(*grids, indexing="ij")
    flat = np.stack([m.reshape(-1) for m in mesh], axis=1)  # [N, k]
    base = jnp.asarray(np.asarray(model.prefit_vector()), ATYPE)
    idx = jnp.asarray(list(indices), jnp.int32)

    def eval_point(m, vals):
        theta = base.at[idx].set(vals)
        return m.total_nll(theta)

    total = _jit_vmap_with_model(model, eval_point, jnp.asarray(flat, ATYPE))
    return {
        "grids": grids,
        "total": np.asarray(total).reshape([points_per_axis] * len(indices)),
    }


def step_scale_from_scan(scan: dict[str, np.ndarray], target_dllh: float = 0.5) -> np.ndarray:
    """Suggested per-parameter step scales from scan curvature
    (``GetStepScaleBasedOnLLHScan``): the half-width where ΔLLH crosses
    ``target_dllh``, normalised to the scan's prior width."""
    values, total = scan["values"], scan["total"]
    scales = np.ones(values.shape[0])
    for p in range(values.shape[0]):
        t = total[p] - total[p].min()
        imin = int(np.argmin(t))
        above = np.nonzero(t > target_dllh)[0]
        right = above[above > imin]
        left = above[above < imin]
        if len(right) and len(left):
            width = values[p][right[0]] - values[p][left[-1]]
            full = values[p][-1] - values[p][0]
            scales[p] = max(width / full, 1e-3)
    return scales


def sigma_variations(
    model: FitModel,
    sample_index: int = 0,
    sigmas: Sequence[float] = (-3, -1, 0, 1, 3),
    indices: Sequence[int] | None = None,
) -> dict[str, np.ndarray]:
    """±σ spectral variations (``RunSigmaVar``): for each parameter and each σ,
    the reweighted spectrum of one sample. Returns hists [P, S, B]."""
    if indices is None:
        indices = list(range(model.n_params))
    prefit = np.asarray(model.prefit_vector())
    sample = model.samples[sample_index]

    # Parameter sigma = prior stddev
    grid = []
    for idx in indices:
        for prior, (start, size) in zip(model.priors, model.slices):
            if start <= idx < start + size:
                local = idx - start
                cov = np.asarray(prior.chol) @ np.asarray(prior.chol).T
                err = float(np.sqrt(cov[local, local]))
                lo, hi = float(prior.low_bound[local]), float(prior.up_bound[local])
                grid.append(
                    [np.clip(prefit[idx] + s * err, lo, hi) for s in sigmas]
                )
                break
    grid = np.asarray(grid)  # [P, S]

    base = jnp.asarray(prefit, ATYPE)
    idx_arr = jnp.asarray(np.repeat(indices, len(sigmas)), jnp.int32)
    val_arr = jnp.asarray(grid.reshape(-1), ATYPE)

    def eval_point(smp, i, v):
        theta = base.at[i].set(v)
        mc, _ = smp.reweight(theta)
        return mc

    hists = _jit_vmap_with_model(sample, eval_point, idx_arr, val_arr)
    return {
        "sigmas": np.asarray(sigmas),
        "values": grid,
        "hists": np.asarray(hists).reshape(len(indices), len(sigmas), -1),
    }


def drag_race(model: FitModel, n_laps: int = 20, n_chains: int = 8) -> dict[str, float]:
    """Per-component timing (``DragRace``): average seconds per call for
    reweight, likelihood, and proposal over a chain batch."""
    theta = jnp.tile(model.prefit_vector()[None, :], (n_chains, 1))
    key = jax.random.key(0)

    timings: dict[str, float] = {}

    def timeit(name, fn, *args):
        fn(*args)  # compile
        jax.block_until_ready(fn(*args))
        t0 = time.perf_counter()
        for _ in range(n_laps):
            out = fn(*args)
        jax.block_until_ready(out)
        timings[name] = (time.perf_counter() - t0) / n_laps

    for i, s in enumerate(model.samples):
        # Batched paths — the same code the MCMC step runs (fused Pallas
        # kernel when enabled), not a vmap of the single-chain path. The
        # sample/model ride as jit arguments (buffers, not HLO constants).
        timeit(
            f"reweight[{s.name}]",
            jax.jit(lambda m, t: m.reweight_batch(t)[0]), s, theta,
        )
        timeit(
            f"likelihood[{s.name}]",
            jax.jit(lambda m, t: m.log_likelihood_batch(t)), s, theta,
        )
    keys = jax.random.split(key, n_chains)
    timeit(
        "propose",
        jax.jit(lambda m, t, k: jax.vmap(m.propose)(t, k)), model, theta, keys,
    )
    timeit(
        "prior_nll",
        jax.jit(lambda m, t: jax.vmap(m.prior_nll)(t)), model, theta,
    )
    for name, t in timings.items():
        _log.info("DragRace %-28s %.3f ms/call (%d chains)", name, 1e3 * t, n_chains)
    return timings
