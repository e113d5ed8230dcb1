"""Bin-by-bin spline handler.

TPU-native equivalent of ``Splines/BinnedSplineHandler.h/.cpp``: instead of one
response spline per (event, parameter) — the ``SMonolith`` road — splines are
defined per (kinematic bin, systematic, mode) and every event in that bin
shares the response. The reference maintains a 7-deep index vector
``[sample][oscchan][syst][mode][var1][var2][var3] -> monolith index``
(``BinnedSplineHandler.h:110``) and hands events stable weight pointers via
``GetEventSplines``.

Here the result IS a :class:`~mach3_tpu.splines.monolith.SparseSplineTable`:
the bin-splines form the flat spline list and each event's padded gather row
points at the bin-splines that apply to it — evaluation, chaining, and the
Pallas path are shared with the per-event monolith. Building differs only in
how the event map is constructed (bin assignment instead of identity).
"""
from __future__ import annotations

import dataclasses
from typing import Sequence

import jax.numpy as jnp
import numpy as np

from ..core.logging import get_logger
from ..core.precision import FTYPE, ITYPE
from .coefficients import build_coefficients
from .monolith import SparseSplineTable, _stack_param_knots, SplineParamSpec, is_flat
from ..params.parameterset import SplineInterpolation

_log = get_logger("splines")


@dataclasses.dataclass
class BinnedSplineParamSpec:
    """One binned spline systematic.

    y_knots: [NB, K] responses per spline-bin; event_bins: [E] spline-bin
    index per event (-1 = this systematic does not apply, weight 1). The
    spline-bin axis can encode any (mode x var1 x var2 x ...) flattening —
    the builder does not care, mirroring the reference's token-keyed loading
    (``syst_mode_var1_var2_var3``).
    """

    name: str
    param_index: int
    x_knots: np.ndarray  # [K]
    y_knots: np.ndarray  # [NB, K]
    event_bins: np.ndarray  # [E]
    interpolation: SplineInterpolation = SplineInterpolation.TSPLINE3
    knot_low: float = -np.inf
    knot_high: float = np.inf


def build_binned_table(
    specs: Sequence[BinnedSplineParamSpec], n_events: int, drop_flat: bool = True
) -> SparseSplineTable:
    """Flatten binned splines into a SparseSplineTable (shared eval path)."""
    plain = [
        SplineParamSpec(
            name=s.name,
            param_index=s.param_index,
            x_knots=s.x_knots,
            event_ids=np.arange(len(s.y_knots)),  # placeholder, unused below
            y_knots=s.y_knots,
            interpolation=s.interpolation,
            knot_low=s.knot_low,
            knot_high=s.knot_high,
        )
        for s in specs
    ]
    knots_x, n_knots = _stack_param_knots(plain)
    kmax = knots_x.shape[1]

    coeff_rows: list[np.ndarray] = []
    spline_param: list[int] = []
    # spline index per (param, bin); -1 = flat/dropped
    bin_to_spline: list[np.ndarray] = []
    s_count = 0
    for p, spec in enumerate(specs):
        y = np.clip(np.asarray(spec.y_knots, np.float64), spec.knot_low, spec.knot_high)
        b, c, d = build_coefficients(spec.x_knots, y, spec.interpolation)
        flat = is_flat(y) if drop_flat else np.zeros(len(y), bool)
        k = len(spec.x_knots)
        mapping = np.full(len(y), -1, np.int64)
        for j in range(len(y)):
            if flat[j]:
                continue
            row = np.zeros((kmax, 4), np.float32)
            row[:k, 0] = y[j]
            row[:k, 1] = b[j]
            row[:k, 2] = c[j]
            row[:k, 3] = d[j]
            if k < kmax:
                row[k:] = row[k - 1]
            coeff_rows.append(row)
            spline_param.append(p)
            mapping[j] = s_count
            s_count += 1
        bin_to_spline.append(mapping)

    unit = np.zeros((kmax, 4), np.float32)
    unit[:, 0] = 1.0
    coeff_rows.append(unit)
    spline_param.append(0)

    # Per-event gather rows: one slot per systematic (width = n specs).
    width = max(1, len(specs))
    event_splines = np.full((n_events, width), s_count, np.int32)  # pad -> unit
    for p, spec in enumerate(specs):
        eb = np.asarray(spec.event_bins, np.int64)
        valid = eb >= 0
        spline_idx = np.where(valid, bin_to_spline[p][np.clip(eb, 0, None)], -1)
        has = spline_idx >= 0
        event_splines[has, p] = spline_idx[has]

    coeffs = np.stack(coeff_rows)
    _log.info(
        "Binned spline table: %d bin-splines over %d systematics, %d events, %.1f MB",
        s_count,
        len(specs),
        n_events,
        coeffs.nbytes / 1e6,
    )
    return SparseSplineTable(
        spline_coeffs=jnp.asarray(coeffs, FTYPE),
        spline_param=jnp.asarray(spline_param, ITYPE),
        event_splines=jnp.asarray(event_splines, ITYPE),
        knots_x=jnp.asarray(knots_x, FTYPE),
        n_knots=jnp.asarray(n_knots, ITYPE),
        param_index=jnp.asarray([s.param_index for s in specs], ITYPE),
    )
