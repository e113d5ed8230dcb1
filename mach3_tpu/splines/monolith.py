"""Spline monolith: SoA layouts for per-event systematic-response splines.

TPU-native re-design of the reference's ``SMonolith`` (``Splines/SplineMonolith.h``,
``Splines/SplineMonolith.cpp:53-250``) and its CUDA mirror
(``Splines/gpuSplineUtils.cu:337-439``). The reference flattens a ragged
``[event][param] -> TSpline3*`` master into:

* ``coeff_many`` (nKnots x 4 floats), ``coeff_x`` (shared x-grid per param),
* ``paramNo_arr`` / ``nKnots_arr`` per spline, per-event index maps,

then evaluates one CUDA thread per spline and one thread per event for the
weight product, with a device->host copy of per-event totals every step.

Here the monolith is an array program that never leaves the chip. Two layouts:

**Dense** (``DenseSplineTable``): coefficients stored knot-major
``[P, K, E, 4]`` so that evaluating parameter ``p`` at segment ``s`` is one
contiguous ``[E, 4]`` dynamic slice — *no gather at all*. Missing
(event, param) splines hold identity coefficients (y=1, b=c=d=0) so the
per-event product over parameters just works. Use when ``E*P*K`` fits HBM;
this is the speed-of-light path (the Pallas kernel consumes this layout).

**Sparse** (``SparseSplineTable``): only non-flat splines stored, flat
``[S]`` arrays plus a per-event padded index matrix ``[E, W]`` (W = max
splines/event) mapping into the spline list — the reference's
``cpu_nParamPerEvent`` ragged map turned into a gather-friendly rectangle.
A sentinel column points at a unit spline so padding multiplies by 1.

Both carry the same semantics: response(p) evaluated at the parameter value
with the segment clamped to the knot range (cubic extrapolation at the edges,
matching ``SplineBase::FindSplineSegment`` + the kernel polynomial,
``Splines/SplineBase.cpp:44-110``), knot-capped responses, and per-event
weight = product of its spline responses (events with no splines get 1).
"""
from __future__ import annotations

import dataclasses
from typing import Sequence

import jax.numpy as jnp
import numpy as np
from flax import struct

from ..core.logging import get_logger
from ..core.precision import FTYPE, ITYPE
from ..params.parameterset import SplineInterpolation
from .coefficients import build_coefficients

_log = get_logger("splines")


@dataclasses.dataclass
class SplineParamSpec:
    """Host-side description of one spline systematic before flattening.

    ``x_knots`` is the shared x-grid of this parameter (the reference shares
    ``coeff_x`` across all splines of a parameter, ``SplineCommon.h:30-50``).
    ``event_ids[i]`` and ``y_knots[i]`` give the response of event
    ``event_ids[i]`` at each knot. Events absent from ``event_ids`` have no
    spline for this parameter (weight 1).
    """

    name: str
    param_index: int  # index into the proposed-parameter vector
    x_knots: np.ndarray  # [K]
    event_ids: np.ndarray  # [S_p]
    y_knots: np.ndarray  # [S_p, K]
    interpolation: SplineInterpolation = SplineInterpolation.TSPLINE3
    knot_low: float = -np.inf  # knot-weight capping (SplineStructs.h:49-127)
    knot_high: float = np.inf


@struct.dataclass
class DenseSplineTable:
    """Dense coefficient table in matmul layout ``[P, K*4, E]``.

    The layout is chosen so that evaluation over a chain batch is a batched
    matmul on the MXU: each chain's (segment, t) for parameter p defines a
    sparse coefficient-selector row ``T[c] = onehot(seg) x (1, t, t², t³)`` of
    length K*4, and the per-event responses are ``T @ coeffs[p]`` — the
    coefficient table is read ONCE for all chains instead of gathered per
    chain. Stored FLAT (the (K, 4) axes pre-merged): reshaping a GB-scale
    table inside a jitted program before a ``pallas_call`` forced a full
    copy every step (measured ~1 ms at the large fixture).
    """

    coeffs: jnp.ndarray  # [P, Kmax*4, E] f32 — (y,b,c,d) per knot, flattened
    knots_x: jnp.ndarray  # [P, Kmax] f32, padded with +inf
    n_knots: jnp.ndarray  # [P] i32
    param_index: jnp.ndarray  # [P] i32 — map into the proposal vector

    @property
    def n_spline_params(self) -> int:
        return self.coeffs.shape[0]

    @property
    def n_events(self) -> int:
        return self.coeffs.shape[2]

    @property
    def kmax(self) -> int:
        return self.knots_x.shape[1]


@struct.dataclass
class SparseSplineTable:
    """Flat spline list + per-event padded gather map.

    The coefficient field is named ``spline_coeffs`` (not ``coeffs``) so the
    distributed field-name -> event-axis map can tell it apart from the
    dense table's event-major ``coeffs``."""

    spline_coeffs: jnp.ndarray  # [S+1, Kmax, 4] f32; row S is the unit spline
    spline_param: jnp.ndarray  # [S+1] i32 — local spline-param id per spline
    event_splines: jnp.ndarray  # [E, W] i32 — indices into the spline list (S = pad)
    knots_x: jnp.ndarray  # [P, Kmax] f32, padded with +inf
    n_knots: jnp.ndarray  # [P] i32
    param_index: jnp.ndarray  # [P] i32

    @property
    def n_splines(self) -> int:
        return self.spline_coeffs.shape[0] - 1

    @property
    def n_events(self) -> int:
        return self.event_splines.shape[0]


def _stack_param_knots(specs: Sequence[SplineParamSpec]) -> tuple[np.ndarray, np.ndarray]:
    kmax = max(len(s.x_knots) for s in specs)
    knots_x = np.full((len(specs), kmax), np.inf, np.float64)
    n_knots = np.zeros(len(specs), np.int32)
    for p, s in enumerate(specs):
        k = len(s.x_knots)
        knots_x[p, :k] = s.x_knots
        n_knots[p] = k
    return knots_x, n_knots


def _spec_coefficients(spec: SplineParamSpec) -> tuple[np.ndarray, ...]:
    """Knot-capped (y, b, c, d) for all splines of one parameter: each [S_p, K]."""
    y = np.clip(np.asarray(spec.y_knots, np.float64), spec.knot_low, spec.knot_high)
    b, c, d = build_coefficients(spec.x_knots, y, spec.interpolation)
    return y, b, c, d


def is_flat(y_knots: np.ndarray, tol: float = 0.0) -> np.ndarray:
    """Mask of splines whose response is identically 1 (the reference drops
    these from the monolith entirely, ``SplineMonolith.cpp:53-250``)."""
    return np.all(np.abs(np.asarray(y_knots) - 1.0) <= tol, axis=-1)


def build_dense_table(
    specs: Sequence[SplineParamSpec], n_events: int, low_memory: bool = False
) -> DenseSplineTable:
    """``low_memory=True`` stores coefficients in bfloat16 — the analogue of
    the reference's ``_LOW_MEMORY_STRUCTS_`` float/short build
    (``Manager/Core.h:27-41``): half the HBM footprint and traffic, native
    MXU bf16 rate, at ~3 decimal digits of response precision (response
    errors ~1e-3 relative; fine for scans/studies, NOT for production fits)."""
    knots_x, n_knots = _stack_param_knots(specs)
    kmax = knots_x.shape[1]
    n_params = len(specs)
    coeffs = np.zeros((n_params, kmax, 4, n_events), np.float32)
    coeffs[:, :, 0, :] = 1.0  # identity response for missing splines
    for p, spec in enumerate(specs):
        y, b, c, d = _spec_coefficients(spec)
        ev = np.asarray(spec.event_ids, np.int64)
        k = len(spec.x_knots)
        coeffs[p, :k, 0, ev] = y.astype(np.float32)
        coeffs[p, :k, 1, ev] = b.astype(np.float32)
        coeffs[p, :k, 2, ev] = c.astype(np.float32)
        coeffs[p, :k, 3, ev] = d.astype(np.float32)
        # Pad unused knot rows with the last valid segment so any clamped
        # segment index stays correct.
        if k < kmax:
            coeffs[p, k:, :, :] = coeffs[p, k - 1 : k, :, :]
    coeffs = coeffs.reshape(n_params, kmax * 4, n_events)
    coeff_dtype = jnp.bfloat16 if low_memory else FTYPE
    size_mb = coeffs.nbytes / 1e6 / (2 if low_memory else 1)
    _log.info(
        "Dense spline table: %d params x %d knots x %d events = %.1f MB%s",
        n_params,
        kmax,
        n_events,
        size_mb,
        " (bf16 low-memory)" if low_memory else "",
    )
    return DenseSplineTable(
        coeffs=jnp.asarray(coeffs, coeff_dtype),
        knots_x=jnp.asarray(knots_x, FTYPE),
        n_knots=jnp.asarray(n_knots, ITYPE),
        param_index=jnp.asarray([s.param_index for s in specs], ITYPE),
    )


def build_sparse_table(
    specs: Sequence[SplineParamSpec], n_events: int, drop_flat: bool = True
) -> SparseSplineTable:
    knots_x, n_knots = _stack_param_knots(specs)
    kmax = knots_x.shape[1]

    coeff_rows: list[np.ndarray] = []
    spline_param: list[int] = []
    per_event: list[list[int]] = [[] for _ in range(n_events)]
    s_count = 0
    for p, spec in enumerate(specs):
        y, b, c, d = _spec_coefficients(spec)
        flat = is_flat(y) if drop_flat else np.zeros(len(y), bool)
        k = len(spec.x_knots)
        for j, ev in enumerate(np.asarray(spec.event_ids, np.int64)):
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
            per_event[int(ev)].append(s_count)
            s_count += 1

    # Unit spline at index S: response 1 everywhere (padding target).
    unit = np.zeros((kmax, 4), np.float32)
    unit[:, 0] = 1.0
    coeff_rows.append(unit)
    spline_param.append(0)

    width = max(1, max((len(v) for v in per_event), default=1))
    event_splines = np.full((n_events, width), s_count, np.int32)  # pad -> unit
    for e, lst in enumerate(per_event):
        event_splines[e, : len(lst)] = lst

    coeffs = np.stack(coeff_rows)
    _log.info(
        "Sparse spline table: %d splines (of %d possible), width %d, %.1f MB",
        s_count,
        sum(len(s.event_ids) for s in specs),
        width,
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


# ---------------------------------------------------------------------------
# Preprocessed-monolith fast path: the reference can dump its flattened SoA
# monolith to a ROOT file and reload it to skip the (slow) master-spline scan
# at startup (``Splines/SplineMonolith.h:48-52``). Here the flattened tables
# are plain arrays, so the fast path is a versioned npz round-trip.
# ---------------------------------------------------------------------------

_MONOLITH_FORMAT = 2  # 2: dense coeffs flattened to [P, K*4, E]; sparse field renamed


def save_table(path: str, table: DenseSplineTable | SparseSplineTable) -> None:
    """Dump a prebuilt spline table so startup can skip coefficient
    construction (reference's preprocessed-monolith file)."""
    fields = {}
    bf16_fields = []
    for f in dataclasses.fields(table):
        if f.metadata.get("pytree_node") is False:
            continue
        v = getattr(table, f.name)
        if hasattr(v, "dtype") and "bfloat16" in str(v.dtype):
            # npz has no bfloat16: store as f32, restore the dtype on load
            bf16_fields.append(f.name)
            v = v.astype(jnp.float32)
        fields[f.name] = np.asarray(v)
    kind = "dense" if isinstance(table, DenseSplineTable) else "sparse"
    np.savez_compressed(
        path,
        __format__=np.int32(_MONOLITH_FORMAT),
        __kind__=np.array(kind),
        __bf16__=np.array(",".join(bf16_fields)),
        **fields,
    )
    _log.info("Saved %s spline table to %s", kind, path)


def load_table(path: str) -> DenseSplineTable | SparseSplineTable:
    """Reload a table written by :func:`save_table`."""
    with np.load(path, allow_pickle=False) as f:
        fmt = int(f["__format__"])
        if fmt != _MONOLITH_FORMAT:
            raise ValueError(
                f"{path}: spline-table format {fmt} != supported {_MONOLITH_FORMAT}"
            )
        kind = str(f["__kind__"])
        bf16_fields = set(str(f["__bf16__"]).split(",")) if "__bf16__" in f.files else set()
        arrays = {k: f[k] for k in f.files if not k.startswith("__")}
    cls = DenseSplineTable if kind == "dense" else SparseSplineTable
    def _dtype(name, v):
        if name in bf16_fields:
            return jnp.bfloat16
        return FTYPE if v.dtype.kind == "f" else ITYPE

    jarrays = {k: jnp.asarray(v, _dtype(k, v)) for k, v in arrays.items()}
    _log.info("Loaded %s spline table from %s", kind, path)
    return cls(**jarrays)


def dense_table_activity(table: "DenseSplineTable") -> "np.ndarray":
    """[P, E] bool: True where the table's response is NOT the identity
    (y row != [1, 0, ...] or any b/c/d nonzero). Computed with one device
    reduction (the full bf16 table never crosses to host).

    This is the monolith's sparsity pattern — the reference stores it as
    per-event spline lists (``cpu_nParamPerEvent``, ``SplineCommon.h:30-50``);
    here it drives tile-level coefficient-block skipping in the fused
    kernel (``pallas_reweight.param_block_plan``)."""
    import jax
    import jax.numpy as jnp

    def act(c):
        c4 = c.reshape(c.shape[0], -1, 4, c.shape[2])
        non_y = jnp.any(c4[:, :, 1:, :] != 0, axis=(1, 2))
        y_not1 = jnp.any(c4[:, :, 0, :] != 1, axis=1)
        return non_y | y_not1

    return np.asarray(jax.jit(act)(table.coeffs))
