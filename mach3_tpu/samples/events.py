"""Host-side event store and SampleModel builders.

TPU-native equivalent of the reference's sample-init pipeline
(``Samples/SampleHandlerFD.cpp:169-202``): load MC into a struct-of-arrays,
match normalisation parameters to events once at setup
(``CalcNormsBins``, ``SampleHandlerFD.cpp:637-747``), wire oscillation channels
(``InitialiseNuOscillatorObjects``/``SetupNuOscillatorPointers``,
``:1047-1122``), and produce the static device arrays of a
:class:`~mach3_tpu.samples.sample.SampleModel`.

The reference's per-event pointer wiring becomes padded integer index arrays.
"""
from __future__ import annotations

import dataclasses
import os
from typing import Mapping, Sequence

import jax.numpy as jnp
import numpy as np

from ..core.exceptions import ConfigError
from ..core.logging import get_logger
from ..core.precision import ATYPE, FTYPE, ITYPE
from ..params.parameterset import ParamMeta
from .binning import SampleBinning
from .sample import AtmoOscConfig, OscConfig, SampleModel, ShiftSpec
from .teststats import TestStatistic

_log = get_logger("samples")

#: PDG -> flavour index (e, mu, tau); sign = antineutrino.
_FLAVOUR = {12: 0, 14: 1, 16: 2}


@dataclasses.dataclass
class EventData:
    """Struct-of-arrays MC event record (``EventInfo``,
    ``Samples/FarDetectorCoreInfoStruct.h:82-126`` — minus the pointers)."""

    kinematics: dict[str, np.ndarray]  # e.g. {"e_true": ..., "e_reco": ...}
    mode: np.ndarray  # [E] generator interaction mode
    target: np.ndarray  # [E] target nucleus Z
    pdg: np.ndarray  # [E] post-oscillation neutrino PDG (±12/±14/±16)
    preosc_pdg: np.ndarray  # [E] flux (pre-oscillation) PDG
    mc_weight: np.ndarray  # [E] nominal MC weight

    @property
    def n_events(self) -> int:
        return len(self.mode)


def match_event_mask(
    events: EventData, meta: ParamMeta, sample_name: str
) -> np.ndarray:
    """[E] bool mask of the events a parameter applies to.

    The matching rules of ``CalcNormsBins`` (``SampleHandlerFD.cpp:667-747``),
    shared by norm and weight-valued functional parameters: empty selection
    lists match everything; kinematic cuts test the *nominal* kinematics."""
    mask = np.ones(events.n_events, dtype=bool)
    if meta.modes:
        mask &= np.isin(events.mode, meta.modes)
    if meta.pdgs:
        mask &= np.isin(events.pdg, meta.pdgs)
    if meta.preosc_pdgs:
        mask &= np.isin(events.preosc_pdg, meta.preosc_pdgs)
    if meta.targets:
        mask &= np.isin(events.target, meta.targets)
    for cut in meta.kinematic_cuts:
        if cut.variable not in events.kinematics:
            raise ConfigError(
                f"Kinematic cut variable '{cut.variable}' unknown to sample {sample_name}"
            )
        v = events.kinematics[cut.variable]
        mask &= (v >= cut.low) & (v < cut.high)
    return mask


def match_norm_params(
    events: EventData,
    metas: Sequence[tuple[ParamMeta, int]],
    sample_name: str,
) -> np.ndarray:
    """Build the padded norm-index matrix [E, W] of *global* parameter indices.

    metas: (meta, global_index) pairs for norm-type parameters. Matching rules
    follow ``CalcNormsBins``: empty selection lists match everything; kinematic
    cuts test the event's *nominal* kinematics.
    """
    e = events.n_events
    masks: list[np.ndarray] = []
    gidxs: list[int] = []
    for meta, gidx in metas:
        if not meta.applies_to_sample(sample_name):
            continue
        masks.append(match_event_mask(events, meta, sample_name))
        gidxs.append(gidx)
    pad = -1  # replaced by the unit slot downstream
    if not masks:
        return np.full((e, 1), pad, np.int64)
    # Vectorised row-packing (a python per-event loop is minutes at the
    # reference's 500k+ events): np.nonzero of the [E, M] mask matrix is
    # row-major, so within an event the meta order is preserved; the position
    # of each hit within its row is its rank among equal row ids.
    m = np.stack(masks, axis=1)  # [E, M]
    width = max(1, int(m.sum(axis=1).max(initial=0)))
    out = np.full((e, width), pad, np.int64)
    rows, cols = np.nonzero(m)
    pos = np.arange(len(rows)) - np.searchsorted(rows, rows)
    out[rows, pos] = np.asarray(gidxs, np.int64)[cols]
    n_assoc = len(rows)
    _log.info(
        "%s: matched %d norm-param/event associations (width %d)",
        sample_name,
        n_assoc,
        width,
    )
    return out


def build_osc_config(
    events: EventData,
    e_grid: np.ndarray,
    osc_param_gidx: Sequence[int],
    baseline: float,
    density: float,
    electron_fraction: float = 0.5,
    nc_modes: Sequence[int] = (),
    e_true_var: str = "e_true",
    phase_dtype=None,
) -> OscConfig:
    """Wire per-event oscillation-channel and energy-grid gather indices.

    Channels are the unique (preosc_pdg, pdg) pairs (``OscChannelInfo``,
    ``FarDetectorCoreInfoStruct.h:8-37``); both PDGs must share the sign.
    """
    pairs = np.stack([events.preosc_pdg, events.pdg], axis=1)
    uniq, inverse = np.unique(pairs, axis=0, return_inverse=True)
    alpha, beta, anti = [], [], []
    for gen, det in uniq:
        if (gen > 0) != (det > 0):
            raise ConfigError(f"Oscillation channel mixes nu and nubar: {gen} -> {det}")
        alpha.append(_FLAVOUR[abs(int(gen))])
        beta.append(_FLAVOUR[abs(int(det))])
        anti.append(gen < 0)

    e_true = np.asarray(events.kinematics[e_true_var], np.float64)
    grid = np.asarray(e_grid, np.float64)
    gidx = np.clip(np.searchsorted(grid, e_true), 0, len(grid) - 1)
    # Snap to nearest grid centre rather than insertion point.
    left = np.clip(gidx - 1, 0, len(grid) - 1)
    use_left = np.abs(grid[left] - e_true) < np.abs(grid[gidx] - e_true)
    gidx = np.where(use_left, left, gidx)

    nc_mask = np.isin(events.mode, list(nc_modes))
    return OscConfig(
        e_grid=jnp.asarray(grid, ATYPE),
        event_grid_idx=jnp.asarray(gidx, ITYPE),
        event_channel=jnp.asarray(inverse.reshape(-1), ITYPE),
        chan_alpha=jnp.asarray(alpha, ITYPE),
        chan_beta=jnp.asarray(beta, ITYPE),
        chan_anti=jnp.asarray(anti),
        nc_mask=jnp.asarray(nc_mask),
        baseline=float(baseline),
        density=float(density),
        electron_fraction=float(electron_fraction),
        osc_param_idx=jnp.asarray(list(osc_param_gidx), ITYPE),
        **({"phase_dtype": phase_dtype} if phase_dtype is not None else {}),
    )


def build_atmo_osc_config(
    events: EventData,
    e_grid: np.ndarray,
    cosz_grid: np.ndarray,
    osc_param_gidx: Sequence[int],
    nc_modes: Sequence[int] = (),
    e_true_var: str = "e_true",
    cosz_var: str = "cos_zenith",
    production_height_km: float = 15.0,
    production_heights: Sequence[float] | None = None,
    height_weights: Sequence[float] | None = None,
) -> AtmoOscConfig:
    """Atmospheric wiring: PREM layered paths per zenith bin + per-event
    (channel, cosZ, E) gather indices (CUDAProb3-equivalent setup).

    production_heights / height_weights: quadrature nodes + weights for
    production-height averaging (CUDAProb3's averaged-height mode,
    ``README.md:119-123``) — probabilities become Σ_h w_h P(h). Omit for a
    single fixed height (``production_height_km``)."""
    import jax.numpy as jnp

    from ..osc.prem import path_through_earth

    pairs = np.stack([events.preosc_pdg, events.pdg], axis=1)
    uniq, inverse = np.unique(pairs, axis=0, return_inverse=True)
    alpha, beta, anti = [], [], []
    for gen, det in uniq:
        if (gen > 0) != (det > 0):
            raise ConfigError(f"Oscillation channel mixes nu and nubar: {gen} -> {det}")
        alpha.append(_FLAVOUR[abs(int(gen))])
        beta.append(_FLAVOUR[abs(int(det))])
        anti.append(gen < 0)

    hw = None
    if production_heights is not None:
        if height_weights is None:
            height_weights = np.full(len(production_heights), 1.0 / len(production_heights))
        hw = np.asarray(height_weights, np.float64)
        hw = hw / hw.sum()
        per_h = [
            path_through_earth(np.asarray(cosz_grid), production_height_km=float(h))
            for h in production_heights
        ]
        # Pad every height's segment axis to the common maximum.
        nl = max(p[0].shape[1] for p in per_h)

        def padl(a):
            return np.pad(a, ((0, 0), (0, nl - a.shape[1])))

        lengths = np.stack([padl(p[0]) for p in per_h])  # [H, NZ, NL]
        rho = np.stack([padl(p[1]) for p in per_h])
        ye = np.stack([np.pad(p[2], ((0, 0), (0, nl - p[2].shape[1])),
                              constant_values=0.5) for p in per_h])
    else:
        lengths, rho, ye = path_through_earth(
            np.asarray(cosz_grid), production_height_km=production_height_km
        )
    rho_eff = rho * (ye / 0.5)

    def nearest(grid, vals):
        g = np.asarray(grid, np.float64)
        idx = np.clip(np.searchsorted(g, vals), 0, len(g) - 1)
        left = np.clip(idx - 1, 0, len(g) - 1)
        use_left = np.abs(g[left] - vals) < np.abs(g[idx] - vals)
        return np.where(use_left, left, idx)

    e_idx = nearest(e_grid, np.asarray(events.kinematics[e_true_var], np.float64))
    z_idx = nearest(cosz_grid, np.asarray(events.kinematics[cosz_var], np.float64))
    nz, ne = len(cosz_grid), len(e_grid)
    flat = (inverse.reshape(-1) * nz + z_idx) * ne + e_idx

    rho_u, rho_inv = np.unique(np.asarray(rho_eff).ravel(), return_inverse=True)

    # Static zenith partition by segment count: down-going bins have ONE air
    # segment but would otherwise pay the full NL-layer padded matmul chain.
    # Groups of equal count evaluate with their own (shorter) unroll and the
    # grid is reassembled in original order (osc/prob.py z_groups).
    nseg = (np.asarray(lengths) > 0).sum(axis=-1)  # [NZ] or [H, NZ]
    if nseg.ndim == 2:
        nseg = nseg.max(axis=0)
    nseg = np.maximum(nseg, 1)
    groups = []
    for nl in sorted(set(int(v) for v in nseg)):
        idxs = tuple(int(i) for i in np.nonzero(nseg == nl)[0])
        assert np.all(np.asarray(lengths)[..., list(idxs), nl:] == 0.0)
        groups.append((idxs, nl))
    z_groups = tuple(groups) if len(groups) > 1 else None

    return AtmoOscConfig(
        e_grid=jnp.asarray(e_grid, ATYPE),
        layer_lengths=jnp.asarray(lengths, ATYPE),
        layer_rho=jnp.asarray(rho_eff, ATYPE),
        rho_unique=jnp.asarray(rho_u, ATYPE),
        rho_idx=jnp.asarray(rho_inv.reshape(rho_eff.shape).astype(np.int32)),
        event_flat_idx=jnp.asarray(flat, ITYPE),
        chan_alpha=jnp.asarray(alpha, ITYPE),
        chan_beta=jnp.asarray(beta, ITYPE),
        chan_anti=jnp.asarray(anti),
        nc_mask=jnp.asarray(np.isin(events.mode, list(nc_modes))),
        osc_param_idx=jnp.asarray(list(osc_param_gidx), ITYPE),
        height_weights=None if hw is None else jnp.asarray(hw, ATYPE),
        z_groups=z_groups,
    )


def build_sample_model(
    name: str,
    events: EventData,
    var_order: Sequence[str],
    binning_edges: Sequence[np.ndarray],
    binning_vars: Sequence[str],
    n_total_params: int,
    norm_idx: np.ndarray | None = None,
    spline_table=None,
    tf1_table=None,
    osc: OscConfig | None = None,
    shifts: Sequence[ShiftSpec] = (),
    weight_fns: Sequence = (),
    data: np.ndarray | None = None,
    test_statistic: TestStatistic = TestStatistic.BARLOW_BEESTON,
    use_pallas: bool | str = "auto",
    binning=None,
    stat_dtype=None,
) -> SampleModel:
    """Assemble the static SampleModel arrays.

    var_order fixes the row layout of the kinematics matrix; binning_vars and
    ShiftSpec.var_row refer to rows of that matrix.

    use_pallas: ``"auto"`` (default) routes to the fused Pallas kernel when on
    TPU and statically feasible (``routing.choose_kernel_route``); ``True``
    prefers Pallas on any backend but still falls back when infeasible;
    ``False`` forces the XLA path.
    """
    var_index = {v: i for i, v in enumerate(var_order)}
    kin = np.stack([np.asarray(events.kinematics[v], np.float32) for v in var_order])
    if binning is None:
        # Default rectangular binning from the edge lists; a prebuilt
        # NonUniformBinning / PolygonBinning object overrides it (its
        # axis_vars must name rows of var_order via binning_vars).
        binning = SampleBinning.build(
            binning_edges, [var_index[v] for v in binning_vars]
        )

    if norm_idx is None:
        norm_idx = np.full((events.n_events, 1), -1, np.int64)
    # Map pad (-1) to the unit slot (= n_total_params, appended 1.0).
    norm_idx = np.where(norm_idx < 0, n_total_params, norm_idx)

    # Compress the extended-vector axis to the norm parameters that actually
    # match THIS sample (NA of NP; spline/func/osc params never appear in
    # norm_idx, and norms are usually sample-filtered). The [*, NP+1] norm
    # structures become [*, NA+1]; ``norm_applied`` records the global
    # indices for the per-chain take. At the 700-parameter envelope this is
    # the difference between a ~3 GB [NP+1, E] match matrix per sample and
    # a ~20 MB one — and it shrinks the log-matmul K dimension to match.
    applied = np.unique(norm_idx)
    applied = applied[applied < n_total_params]
    norm_applied = None
    if len(applied) + 1 < n_total_params + 1:
        remap = np.full(n_total_params + 1, len(applied), np.int64)
        remap[applied] = np.arange(len(applied))
        norm_idx = remap[norm_idx]
        norm_applied = jnp.asarray(applied, ITYPE)
    na1 = (len(applied) + 1) if norm_applied is not None else n_total_params + 1

    # One-hot form for the MXU path (see SampleModel.norm_onehot) when the
    # dense [E*W, NA+1] matrix is cheap; the match-count matrix S [NA+1, E]
    # (in-kernel + XLA log-matmul product) whenever IT is cheap. At reference
    # scale (500k+ events, 100+ params) the one-hot would be ~0.5 GB of HBM
    # read per step while S stays ~100 MB read ONCE for all chains — so the
    # one-hot is size-gated and the log-matmul takes over (the gather
    # fallback is a measured catastrophe on TPU: select-expansion chains).
    norm_onehot = None
    norm_s = None
    if na1 <= 128 and events.n_events * norm_idx.shape[1] * na1 * 4 <= 128 << 20:
        flat = norm_idx.reshape(-1)
        oh = np.zeros((len(flat), na1), np.float32)
        oh[np.arange(len(flat)), flat] = 1.0
        norm_onehot = jnp.asarray(oh)
    if na1 * events.n_events * 4 <= 512 << 20:
        s = np.zeros((na1, events.n_events), np.float32)
        for w_col in range(norm_idx.shape[1]):
            np.add.at(s, (norm_idx[:, w_col], np.arange(events.n_events)), 1.0)
        norm_s = jnp.asarray(s)

    if data is None:
        data = np.zeros(binning.n_bins)

    # Bin-map precomputation. If no functional shift touches a binned axis the
    # event->bin map never changes during the fit (shared-bins fast path).
    # With exactly ONE elementwise shift on ONE binned axis, the binning moves
    # into the fused kernel: bake the shifted axis's edges as static floats
    # and precompute the static axes' summed contribution.
    static_bins = None
    kernel_shift = None
    shift_static_base = None
    binned_rows = [int(var_index[v]) for v in binning_vars]
    shifted_binned = [s for s in shifts if s.var_row in binned_rows]
    if not shifted_binned:
        static_bins = binning.find_bins(jnp.asarray(kin, FTYPE))
    elif not isinstance(binning, SampleBinning):
        # Custom binnings (polygon / hyper-rect) with shifted binned axes
        # recompute find_bins per step on the XLA route.
        pass
    elif len(shifts) == 1 and len(shifted_binned) == 1:
        s = shifts[0]
        fn = s.fn
        try:  # the shift must be elementwise in (value, x) — kin unavailable in-kernel
            import jax as _jax

            _jax.eval_shape(
                lambda: fn(jnp.zeros((2, 1), FTYPE), jnp.zeros((1, 4), FTYPE), None)
            )
            ok = True
        except Exception:
            ok = False
        if ok:
            axis_j = binned_rows.index(s.var_row)
            edges_np = np.asarray(binning.edges)
            n_axis = np.asarray(binning.n_bins_axis)
            strides = np.asarray(binning.strides)
            static_base = np.zeros(events.n_events, np.int64)
            valid = np.ones(events.n_events, bool)
            for a, r in enumerate(binned_rows):
                if a == axis_j:
                    continue
                real_edges = edges_np[a][: n_axis[a] + 1]
                idx = np.searchsorted(real_edges, kin[r], side="right") - 1
                valid &= (idx >= 0) & (idx < n_axis[a])
                static_base += np.clip(idx, 0, n_axis[a] - 1) * strides[a]
            static_base = np.where(valid, static_base, -1)
            edges_j = tuple(float(x) for x in edges_np[axis_j][: n_axis[axis_j] + 1])
            kernel_shift = (
                lambda v, x, _fn=fn: _fn(v, x, None),
                int(s.param_index),
                edges_j,
                int(strides[axis_j]),
                int(n_axis[axis_j]),
            )
            shift_static_base = jnp.asarray(static_base, ITYPE)

    from .routing import choose_kernel_route

    route = choose_kernel_route(
        binning.n_bins,
        spline_table,
        has_static_bins=static_bins is not None,
        has_kernel_shift=kernel_shift is not None,
        n_norm_in_kernel=na1
        if (norm_s is not None and (kernel_shift is not None or static_bins is not None))
        else 0,
        requested=use_pallas,
    )

    # SORT events by static bin for the shared fused route: each event tile
    # then spans a handful of bins and the kernel's histogram narrows from
    # [ET, BP] to [NBL, ET] (one-hot build + MXU contraction both shrink
    # ~BP/NBL-fold — measured the dominant kernel cost at the large
    # fixture). Event order is irrelevant to every histogram/likelihood
    # (sums over events); the secondary osc-index key keeps the per-event
    # oscillation gather piecewise-monotonic for DMA locality.
    hist_tile_starts = None
    hist_nbl = None
    hist_block_plan = None
    hist_block_nact = None
    if (
        route.use_pallas
        and route.variant == "shared"
        and route.param_tile is not None
        and static_bins is not None
    ):
        from ..splines.monolith import dense_table_activity
        from ..splines.pallas_reweight import (
            event_block_signature,
            hist_tile_plan,
            param_block_order,
            param_block_plan,
        )

        # Activity pattern of the monolith (True where a param's response is
        # not identity) drives BOTH orderings: params regrouped so blocks
        # are activity-pure, events clustered by which blocks touch them.
        act = dense_table_activity(spline_table)
        pperm = param_block_order(act)
        if not np.array_equal(pperm, np.arange(act.shape[0])):
            act = act[pperm]
            jpperm = jnp.asarray(pperm)
            spline_table = spline_table.replace(
                coeffs=jnp.take(spline_table.coeffs, jpperm, axis=0),
                knots_x=jnp.take(spline_table.knots_x, jpperm, axis=0),
                n_knots=jnp.take(spline_table.n_knots, jpperm, axis=0),
                param_index=jnp.take(spline_table.param_index, jpperm, axis=0),
            )

        bins_np = np.asarray(static_bins)
        sig = event_block_signature(act, route.param_tile)
        osc_key = np.zeros(events.n_events, np.int64)
        if osc is not None:
            if hasattr(osc, "event_flat_idx"):
                osc_key = np.asarray(osc.event_flat_idx, np.int64)
            elif hasattr(osc, "event_grid_idx"):
                osc_key = np.asarray(osc.event_channel, np.int64) * (
                    int(np.asarray(osc.e_grid).shape[0])
                ) + np.asarray(osc.event_grid_idx, np.int64)
        order = np.lexsort((osc_key, bins_np, sig))
        # Pad every activity-signature GROUP to a multiple of the event tile
        # with zero-weight copies of its last event: tiles never straddle a
        # group boundary, so each tile is activity-pure (min active blocks)
        # AND bin-narrow (bins sorted within the group). On top of that,
        # WINDOW-AWARE tile cuts (``plan_window_cuts``): the histogram
        # window width is the static max span over tiles, so tiles are also
        # cut whenever their bin span would exceed the cost-model-chosen W —
        # a few extra padded tiles buy a W-fold narrower one-hot for every
        # tile (r4: one sparse atmo group forced a 640-bin window on all
        # ~200 tiles, ~2.7 ms/step).
        from ..splines.pallas_reweight import plan_window_cuts

        et_ = route.event_tile
        sig_sorted = sig[order]
        cuts = np.flatnonzero(np.diff(sig_sorted)) + 1
        pieces = np.split(order, cuts)
        n_blocks_act = -(-act.shape[0] // route.param_tile)
        # popcount of the block bitmask ~ active blocks (exact for <=62
        # blocks; the fold onto bit 62 only skews the cost model above that)
        group_nact = [
            min(bin(int(sig[pc[0]])).count("1"), n_blocks_act) for pc in pieces
        ]
        force_w = os.environ.get("MACH3_HIST_WINDOW")
        w_sel, piece_cuts = plan_window_cuts(
            [bins_np[idx] for idx in pieces], group_nact, et_, binning.n_bins,
            force_w=int(force_w) if force_w else None,
        )
        take_parts = []
        pad_parts = []
        for idx, cuts_g in zip(pieces, piece_cuts):
            for i0, j0 in cuts_g:
                seg = idx[i0:j0]
                take_parts.append(seg)
                pad_parts.append(np.zeros(len(seg), bool))
                padn = -len(seg) % et_
                if padn:
                    take_parts.append(np.full(padn, seg[-1]))
                    pad_parts.append(np.ones(padn, bool))
        perm = np.concatenate(take_parts)
        pad_mask = np.concatenate(pad_parts)
        if len(pieces) > 1 or pad_mask.any():
            _log.info(
                "%s: %d activity groups, window target %d bins, %d pad "
                "events (%.1f%%)",
                name, len(pieces), w_sel, int(pad_mask.sum()),
                100.0 * pad_mask.sum() / len(perm),
            )
        if True:
            n_old = events.n_events
            act = act[:, perm]
            act[:, pad_mask] = False  # padded events are inert
            jperm = jnp.asarray(perm)
            kin = np.asarray(kin)[:, perm]
            mc_w = np.asarray(events.mc_weight)[perm]
            mc_w[pad_mask] = 0.0  # zero weight: pad events contribute nothing
            events = EventData(
                kinematics={k: np.asarray(v)[perm] for k, v in events.kinematics.items()},
                mode=events.mode[perm],
                target=events.target[perm],
                pdg=events.pdg[perm],
                preosc_pdg=events.preosc_pdg[perm],
                mc_weight=mc_w,
            )
            norm_idx = norm_idx[perm]
            if norm_onehot is not None:
                w_cols = norm_idx.shape[1]
                rows = (perm[:, None] * w_cols + np.arange(w_cols)).reshape(-1)
                norm_onehot = norm_onehot[jnp.asarray(rows)]
            if norm_s is not None:
                norm_s = jnp.take(norm_s, jperm, axis=1)
            static_bins = jnp.take(static_bins, jperm)
            if spline_table is not None and hasattr(spline_table, "coeffs"):
                spline_table = spline_table.replace(
                    coeffs=jnp.take(spline_table.coeffs, jperm, axis=2)
                )
            if tf1_table is not None:
                tf1_table = tf1_table.replace(
                    slope=jnp.take(tf1_table.slope, jperm, axis=1),
                    intercept=jnp.take(tf1_table.intercept, jperm, axis=1),
                )
            if osc is not None:
                fields = {}
                for f in ("event_grid_idx", "event_channel", "event_flat_idx", "nc_mask"):
                    if hasattr(osc, f) and getattr(osc, f) is not None:
                        arr = getattr(osc, f)
                        if hasattr(arr, "shape") and arr.shape[:1] == (n_old,):
                            fields[f] = jnp.take(arr, jperm)
                osc = osc.replace(**fields)
            weight_fns = tuple(
                ws.replace(mask=jnp.take(ws.mask, jperm)) for ws in weight_fns
            )
        # Narrow-histogram windows and the activity block plan are
        # independent wins; take each when it helps. A refused window
        # (span ~ full bin axis, e.g. few bins) degrades to start=0 /
        # nbl=BP — the planned kernel then behaves like the wide one for
        # the histogram while still skipping inactive coefficient blocks.
        bins_sorted = np.asarray(static_bins)
        n_etiles = -(-events.n_events // route.event_tile)
        bp = -(-(binning.n_bins + 1) // 128) * 128
        plan = hist_tile_plan(bins_sorted, binning.n_bins, route.event_tile)
        if plan is not None:
            starts_np, hist_nbl = plan[0], int(plan[1])
        else:
            starts_np, hist_nbl = np.zeros(n_etiles, np.int32), bp
        bplan, bnact = param_block_plan(
            act, route.event_tile, route.param_tile
        )
        n_blocks = -(-act.shape[0] // route.param_tile)
        if plan is not None or bplan.shape[1] < n_blocks:
            hist_tile_starts = jnp.asarray(starts_np)
            hist_block_plan = jnp.asarray(bplan)
            hist_block_nact = jnp.asarray(bnact)
            _log.info(
                "%s: sorted fused route — hist window %d of %d bins, "
                "active blocks/tile %.2f of %d (planned grid %d)",
                name, hist_nbl, bp,
                float(bnact.mean()), n_blocks, bplan.shape[1],
            )
        else:
            hist_nbl = None

    return SampleModel(
        name=name,
        kin=jnp.asarray(kin, FTYPE),
        mc_weight=jnp.asarray(events.mc_weight, FTYPE),
        norm_idx=jnp.asarray(norm_idx, ITYPE),
        norm_onehot=norm_onehot,
        norm_s=norm_s,
        norm_applied=norm_applied,
        binning=binning,
        data=jnp.asarray(data, ATYPE),
        spline_table=spline_table,
        tf1_table=tf1_table,
        osc=osc,
        shifts=tuple(shifts),
        weight_fns=tuple(weight_fns),
        test_statistic=test_statistic,
        stat_dtype=stat_dtype,
        use_pallas=route.use_pallas,
        kernel_route=route,
        static_bins=static_bins,
        kernel_shift=kernel_shift,
        shift_static_base=shift_static_base,
        hist_tile_starts=hist_tile_starts,
        hist_nbl=hist_nbl,
        hist_block_plan=hist_block_plan,
        hist_block_nact=hist_block_nact,
    )
