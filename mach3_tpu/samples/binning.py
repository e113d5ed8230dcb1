"""N-dimensional binning with a global flat bin space.

TPU-native equivalent of the reference's ``BinningHandler``
(``Samples/BinningHandler.h:10-123``, ``Samples/BinningHandler.cpp``): each
sample owns an N-dim rectangular binning (non-uniform edges per axis); all
samples are concatenated into one global flat bin array with per-sample offsets
so the likelihood is a single reduction over the global space.

The reference accelerates event migration with a cached nominal bin and a
same->adjacent->binary search (``Samples/SampleStructs.h:565-614``) — a CPU
cache trick. On TPU we simply recompute the full vectorised ``searchsorted``
for every axis each step; it is a negligible cost next to the spline product
and removes all per-event statefulness.

Out-of-range events map to a per-sample garbage bin (index ``n_bins``) which
the likelihood ignores — this is the reference's selection-cut behaviour
(events failing the binning contribute nothing).
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..core.precision import FTYPE, ITYPE


@struct.dataclass
class SampleBinning:
    """Static binning arrays for one sample.

    edges: [A, Kmax] f32 padded with +inf; n_bins_axis: [A] i32;
    strides: [A] i32 (row-major ravel); axis_vars: [A] i32 — which kinematic
    variable (row of the sample's kinematics matrix) each axis bins.
    """

    edges: jnp.ndarray
    n_bins_axis: jnp.ndarray
    strides: jnp.ndarray
    axis_vars: jnp.ndarray
    n_bins: int = struct.field(pytree_node=False)

    @property
    def n_axes(self) -> int:
        return self.edges.shape[0]

    @classmethod
    def build(cls, edges: Sequence[np.ndarray], axis_vars: Sequence[int]) -> "SampleBinning":
        n_axes = len(edges)
        kmax = max(len(e) for e in edges)
        padded = np.full((n_axes, kmax), np.inf, np.float64)
        n_bins_axis = np.zeros(n_axes, np.int64)
        for a, e in enumerate(edges):
            e = np.asarray(e, np.float64)
            if np.any(np.diff(e) <= 0):
                raise ValueError(f"Bin edges for axis {a} not strictly increasing")
            padded[a, : len(e)] = e
            n_bins_axis[a] = len(e) - 1
        strides = np.ones(n_axes, np.int64)
        for a in range(n_axes - 2, -1, -1):
            strides[a] = strides[a + 1] * n_bins_axis[a + 1]
        n_bins = int(np.prod(n_bins_axis))
        return cls(
            edges=jnp.asarray(padded, FTYPE),
            n_bins_axis=jnp.asarray(n_bins_axis, ITYPE),
            strides=jnp.asarray(strides, ITYPE),
            axis_vars=jnp.asarray(list(axis_vars), ITYPE),
            n_bins=n_bins,
        )

    def find_bins(self, kinematics: jnp.ndarray) -> jnp.ndarray:
        """Flat local bin index per event; ``n_bins`` for out-of-range.

        kinematics: [V, E] — all kinematic variables of the sample; the axes
        select their rows via ``axis_vars``.
        """
        x = kinematics[self.axis_vars]  # [A, E]
        # Per-axis searchsorted against padded (+inf) edges (int32: the TPU
        # backend does not support int64).
        idx = (
            jnp.sum(
                (self.edges[:, :, None] <= x[:, None, :]).astype(ITYPE),
                axis=1,
                dtype=ITYPE,
            )
            - 1
        )  # [A, E]
        valid = (idx >= 0) & (idx < self.n_bins_axis[:, None])
        all_valid = jnp.all(valid, axis=0)
        flat = jnp.sum(
            jnp.clip(idx, 0, self.n_bins_axis[:, None] - 1) * self.strides[:, None], axis=0
        )
        return jnp.where(all_valid, flat, self.n_bins).astype(ITYPE)


@struct.dataclass
class NonUniformBinning:
    """Axis-aligned hyper-rectangle bins of arbitrary extents.

    TPU-native equivalent of the reference's non-uniform scheme
    (``Samples/BinningHandler.h:103-123``): analysis bins are hyper-rects; a
    coarse uniform "MegaBin" grid maps events to candidate bins, then a
    per-event loop tests containment. Here the mapping grid is REFINED to the
    union of all bin edges per axis, so every refined cell lies inside exactly
    one (or zero) analysis bin — the per-event candidate loop collapses to one
    precomputed ``cell -> bin`` gather. Bin lookup is then a per-axis
    ``searchsorted`` plus one ``jnp.take``, identical in cost to the uniform
    path.

    ``cell_edges``: [A, Kmax] refined edges (+inf padded); ``cell_to_bin``:
    [prod(cells)] i32 flat map, ``n_bins`` for uncovered cells; events outside
    the refined grid also map to ``n_bins`` (the garbage bin).
    """

    cell_edges: jnp.ndarray
    n_cells_axis: jnp.ndarray
    cell_strides: jnp.ndarray
    cell_to_bin: jnp.ndarray
    axis_vars: jnp.ndarray
    n_bins: int = struct.field(pytree_node=False)
    # Host-side copies of the hyper-rect extents [B, A, 2] for naming/plots
    # (``BinningHandler::GetNonUniformBins``, ``GetBinName``).
    extents: np.ndarray = struct.field(pytree_node=False, default=None)

    @property
    def n_axes(self) -> int:
        return self.cell_edges.shape[0]

    @classmethod
    def build(
        cls, bins: Sequence[Sequence[Sequence[float]]], axis_vars: Sequence[int]
    ) -> "NonUniformBinning":
        """``bins[b][a] = (low, high)`` — the reference's YAML ``Bins`` layout
        (``Samples/BinningHandler.cpp:207``: bins x dims x 2). Bins must not
        overlap; gaps are allowed (events there fall in the garbage bin)."""
        extents = np.asarray(bins, np.float64)  # [B, A, 2]
        if extents.ndim != 3 or extents.shape[2] != 2:
            raise ValueError("bins must be [n_bins][n_axes][2] (low, high)")
        n_bins, n_axes = extents.shape[:2]
        if np.any(extents[:, :, 0] >= extents[:, :, 1]):
            raise ValueError("every bin must have low < high on every axis")
        edges = [np.unique(extents[:, a, :]) for a in range(n_axes)]
        kmax = max(len(e) for e in edges)
        padded = np.full((n_axes, kmax), np.inf, np.float64)
        n_cells_axis = np.zeros(n_axes, np.int64)
        for a, e in enumerate(edges):
            padded[a, : len(e)] = e
            n_cells_axis[a] = len(e) - 1
        strides = np.ones(n_axes, np.int64)
        for a in range(n_axes - 2, -1, -1):
            strides[a] = strides[a + 1] * n_cells_axis[a + 1]
        # Midpoint of every refined cell -> owning bin (host-side, build once).
        centres = [0.5 * (e[:-1] + e[1:]) for e in edges]
        mesh = np.meshgrid(*centres, indexing="ij")  # A x [cells...]
        pts = np.stack([m.ravel() for m in mesh], axis=0)  # [A, n_cells]
        inside = np.all(
            (extents[:, :, 0, None] <= pts[None, :, :])
            & (pts[None, :, :] < extents[:, :, 1, None]),
            axis=1,
        )  # [B, n_cells]
        owners = inside.sum(axis=0)
        if np.any(owners > 1):
            bad = np.argwhere(owners > 1)[0, 0]
            raise ValueError(f"overlapping bins cover cell {bad}")
        cell_to_bin = np.where(owners == 1, inside.argmax(axis=0), n_bins)
        return cls(
            cell_edges=jnp.asarray(padded, FTYPE),
            n_cells_axis=jnp.asarray(n_cells_axis, ITYPE),
            cell_strides=jnp.asarray(strides, ITYPE),
            cell_to_bin=jnp.asarray(cell_to_bin, ITYPE),
            axis_vars=jnp.asarray(list(axis_vars), ITYPE),
            n_bins=int(n_bins),
            extents=extents,
        )

    def find_bins(self, kinematics: jnp.ndarray) -> jnp.ndarray:
        """Flat analysis-bin index per event; ``n_bins`` for out-of-range or
        uncovered (gap) events. Same interface as ``SampleBinning``."""
        x = kinematics[self.axis_vars]  # [A, E]
        idx = (
            jnp.sum(
                (self.cell_edges[:, :, None] <= x[:, None, :]).astype(ITYPE),
                axis=1,
                dtype=ITYPE,
            )
            - 1
        )
        valid = (idx >= 0) & (idx < self.n_cells_axis[:, None])
        all_valid = jnp.all(valid, axis=0)
        flat_cell = jnp.sum(
            jnp.clip(idx, 0, self.n_cells_axis[:, None] - 1)
            * self.cell_strides[:, None],
            axis=0,
        )
        owner = jnp.take(self.cell_to_bin, flat_cell, axis=0)
        return jnp.where(all_valid, owner, self.n_bins).astype(ITYPE)

    def bin_name(self, b: int) -> str:
        """Human-readable extents, the reference's ``GetBinName``."""
        if b >= self.n_bins:
            return "underflow/overflow"
        parts = [
            f"[{lo:g}, {hi:g})" for lo, hi in self.extents[b]
        ]
        return " x ".join(parts)


@struct.dataclass
class PolygonBinning:
    """Arbitrary-polygon bins on a 2-D kinematic plane — the TH2Poly class
    of binning (``Samples/HistogramUtils.h:17-87``; ``Fitters/SampleSummary.h:23``
    operates on TH2Poly histograms).

    TPU-native design: polygons only exist at BUILD/lookup time. ``find_bins``
    runs an exact even-odd (crossing-number) point-in-polygon test, fully
    vectorised over (events x polygon edges) with a ``segment_sum`` folding
    edge crossings per polygon — no per-event loops, no ragged structures.
    For static-kinematics samples this is evaluated once at build and the fit
    step sees only the resulting integer bin array (the index-array design);
    samples with kinematic shifts can call it per step like any other binning.

    Edges are stored flat: ``ex1/ey1/ex2/ey2`` [V_total] with ``edge_poly``
    [V_total] naming the owning polygon. Points exactly on a shared boundary
    follow the even-odd rule's half-open convention (a vertical ray from the
    point; edges are treated half-open in y), so shared borders assign the
    event to exactly one of the adjacent polygons.
    """

    ex1: jnp.ndarray
    ey1: jnp.ndarray
    ex2: jnp.ndarray
    ey2: jnp.ndarray
    edge_poly: jnp.ndarray
    axis_vars: jnp.ndarray
    n_bins: int = struct.field(pytree_node=False)
    # Host-side polygon vertex lists for naming/plotting (ragged).
    polygons: tuple = struct.field(pytree_node=False, default=None)

    @property
    def n_axes(self) -> int:
        return 2

    @classmethod
    def build(
        cls, polygons: Sequence[Sequence[Sequence[float]]], axis_vars: Sequence[int]
    ) -> "PolygonBinning":
        """``polygons[b] = [(x0, y0), (x1, y1), ...]`` — one closed polygon
        per analysis bin (the closing edge back to vertex 0 is implicit,
        matching TH2Poly's ``AddBin(TGraph)``). Polygons must not overlap;
        gaps are allowed (events there fall in the garbage bin)."""
        if len(axis_vars) != 2:
            raise ValueError("PolygonBinning is 2-D: axis_vars must have 2 entries")
        x1s, y1s, x2s, y2s, owner = [], [], [], [], []
        polys = []
        for b, verts in enumerate(polygons):
            v = np.asarray(verts, np.float64)
            if v.ndim != 2 or v.shape[1] != 2 or v.shape[0] < 3:
                raise ValueError(
                    f"polygon {b} must be [n_vertices >= 3][2], got {v.shape}"
                )
            polys.append(v)
            nxt = np.roll(v, -1, axis=0)  # implicit closing edge
            x1s.append(v[:, 0]); y1s.append(v[:, 1])
            x2s.append(nxt[:, 0]); y2s.append(nxt[:, 1])
            owner.append(np.full(len(v), b, np.int64))
        return cls(
            ex1=jnp.asarray(np.concatenate(x1s), FTYPE),
            ey1=jnp.asarray(np.concatenate(y1s), FTYPE),
            ex2=jnp.asarray(np.concatenate(x2s), FTYPE),
            ey2=jnp.asarray(np.concatenate(y2s), FTYPE),
            edge_poly=jnp.asarray(np.concatenate(owner), ITYPE),
            axis_vars=jnp.asarray(list(axis_vars), ITYPE),
            n_bins=len(polygons),
            polygons=tuple(polys),
        )

    def find_bins(self, kinematics: jnp.ndarray) -> jnp.ndarray:
        """Flat bin index per event; ``n_bins`` (garbage) outside every
        polygon. Same interface as ``SampleBinning.find_bins``."""
        xy = kinematics[self.axis_vars]  # [2, E]
        x, y = xy[0], xy[1]
        # Even-odd rule: an upward vertical ray from (x, y) crosses edge
        # (p1, p2) iff exactly one endpoint is at-or-below y (half-open in
        # y kills double-counting at shared vertices) and the edge's x at
        # height y lies strictly right of the point.
        y1, y2 = self.ey1[:, None], self.ey2[:, None]  # [V, 1]
        x1, x2 = self.ex1[:, None], self.ex2[:, None]
        yb = y[None, :]  # [1, E]
        straddles = (y1 <= yb) != (y2 <= yb)
        dy = jnp.where(straddles, y2 - y1, jnp.ones((), FTYPE))
        x_at = x1 + (yb - y1) * (x2 - x1) / dy
        crossing = straddles & (x[None, :] < x_at)  # [V, E]
        parity = jax.ops.segment_sum(
            crossing.astype(ITYPE), self.edge_poly, num_segments=self.n_bins
        ) % 2  # [B, E]
        inside_any = jnp.any(parity == 1, axis=0)
        owner = jnp.argmax(parity, axis=0).astype(ITYPE)
        return jnp.where(inside_any, owner, self.n_bins).astype(ITYPE)

    def bin_name(self, b: int) -> str:
        if b >= self.n_bins:
            return "underflow/overflow"
        v = self.polygons[b]
        return "poly[" + ", ".join(f"({x:g},{y:g})" for x, y in v) + "]"


def histogram(
    weights: jnp.ndarray, bins: jnp.ndarray, n_bins: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(sum w, sum w²) per bin — the reference's ``FillArray_MP`` OMP array
    reduction (``Samples/SampleHandlerFD.cpp:390-448``) as two segment_sums.
    The garbage bin (index n_bins) is dropped."""
    w = weights.astype(FTYPE)
    mc = jax.ops.segment_sum(w, bins, num_segments=n_bins + 1)[:n_bins]
    w2 = jax.ops.segment_sum(w * w, bins, num_segments=n_bins + 1)[:n_bins]
    return mc, w2
