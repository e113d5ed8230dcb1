"""Sample projections and event-rate breakdowns for plotting.

TPU-native equivalent of the reference's plotting/projection API on samples
(``Samples/SampleHandlerFD.h:104-144``: 1D projections by mode / oscillation
channel / kinematic selection; event-rate tables in
``SampleHandlerFD.cpp:2029``). Weights come from the jitted per-event product;
the categorical splits happen host-side in numpy (plot-time code, not the hot
path).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .sample import SampleModel


def event_weights(sample: SampleModel, params: jnp.ndarray) -> np.ndarray:
    """Full per-event weight product at the given parameters [E]."""
    w = jax.jit(
        lambda t: sample.mc_weight
        * sample._norm_weights(t)
        * sample._spline_weights(t)
        * sample._osc_weights(t)
    )(params)
    return np.asarray(w)


def project(
    sample: SampleModel,
    params: jnp.ndarray,
    var_row: int,
    edges: np.ndarray,
    category: np.ndarray | None = None,
    select: np.ndarray | None = None,
) -> dict:
    """1D projection of the reweighted sample onto one kinematic variable.

    category: optional [E] int labels (e.g. interaction mode) -> stacked
    per-category histograms; select: optional [E] bool pre-selection.
    Kinematics are taken at the given parameters (functional shifts applied).
    """
    w = event_weights(sample, params)
    kin = np.asarray(jax.jit(sample._shifted_kinematics)(params))[var_row]
    if select is not None:
        w = np.where(select, w, 0.0)
    total, _ = np.histogram(kin, bins=edges, weights=w)
    out = {"edges": np.asarray(edges), "total": total}
    if category is not None:
        cats = np.unique(category)
        out["categories"] = {}
        for c in cats:
            h, _ = np.histogram(kin[category == c], bins=edges, weights=w[category == c])
            out["categories"][int(c)] = h
    return out


def event_rate_table(
    samples: list[SampleModel],
    params: jnp.ndarray,
    categories: list[np.ndarray] | None = None,
) -> dict:
    """Integrated event rates per sample (and per category), the reference's
    printed rate tables."""
    out = {}
    for i, s in enumerate(samples):
        w = event_weights(s, params)
        entry = {"total": float(w.sum())}
        if categories is not None and categories[i] is not None:
            for c in np.unique(categories[i]):
                entry[f"cat_{int(c)}"] = float(w[categories[i] == c].sum())
        out[s.name] = entry
    return out
