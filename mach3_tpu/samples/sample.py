"""The binned-sample likelihood engine.

TPU-native redesign of ``SampleHandlerFD`` (``Samples/SampleHandlerFD.h:21``,
``Samples/SampleHandlerFD.cpp:316-448,1284-1300``). The reference's per-step
pipeline is::

    Reweight(): osc eval -> spline eval -> func-param prep -> GPU sync
                -> FillArray_MP (OMP over events: shifts, selection, pointer
                   weight product, bin lookup, array reduction)
    GetLikelihood(): OMP sum of the test statistic over the flat bin array

Here the whole pipeline is ONE pure jitted function of the proposed parameter
vector. The reference's pointer network (``FarDetectorCoreInfoStruct.h:108-117``:
per-event ``norm_pointers`` / ``total_weight_pointers`` into other objects'
memory) becomes integer index arrays + gathers:

* norm systematics  -> ``norm_idx [E, Wn]`` into an extended parameter vector
  (built once at init like ``CalcNormsBins``, ``SampleHandlerFD.cpp:637-747``),
* spline systematics -> the spline monolith (``splines/``),
* oscillation       -> per-event gather from per-channel probability grids,
* functional shifts -> registered pure functions transforming kinematics
  (``RegisterFunctionalParameters``, ``SampleHandlerFD.cpp:465-564``),

and the OMP histogram reduction becomes ``segment_sum`` into the sample's flat
bin space. Events migrate bins each step by full recomputation of the binning
(see ``binning.py``). Everything is vmappable over a chain batch axis.
"""
from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from flax import struct

from ..core.precision import ATYPE, FTYPE, ITYPE
from ..osc.prob import OscParams, probabilities_const_density, probabilities_layered
from ..splines.eval import eval_dense, eval_sparse
from ..splines.monolith import DenseSplineTable, SparseSplineTable
from ..splines.tf1 import TF1Table
from .binning import NonUniformBinning, SampleBinning, histogram
from .teststats import TestStatistic, get_test_stat_fn

#: A functional shift: (param_value, var_values [E], kin [V, E]) -> new var values.
ShiftFn = Callable[[jnp.ndarray, jnp.ndarray, jnp.ndarray], jnp.ndarray]


@struct.dataclass
class ShiftSpec:
    """One functional parameter applied to one kinematic variable."""

    fn: ShiftFn = struct.field(pytree_node=False)
    param_index: int = struct.field(pytree_node=False)
    var_row: int = struct.field(pytree_node=False)


@struct.dataclass
class WeightSpec:
    """One weight-valued functional parameter.

    The reference's ``FuncParFuncType`` callbacks are arbitrary per-event
    functions that either shift kinematics OR compute weights directly,
    matched to events by mode/PDG/target/kinematic bounds like norms
    (``Samples/SampleHandlerFD.cpp:465-564``). :class:`ShiftSpec` covers the
    kinematic-shift half; this covers the weight half: a registered pure
    function ``fn(value, kin [V, E]) -> w [E]`` whose result multiplies the
    event weight product on the matched events (``mask``) only. Applied on
    the XLA side of the base weight, so the fused kernels are untouched.
    ``kin`` is the NOMINAL kinematics matrix (weight responses see unshifted
    values, like the reference's callbacks which run before the fill)."""

    fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray] = struct.field(
        pytree_node=False
    )
    param_index: int = struct.field(pytree_node=False)
    mask: jnp.ndarray  # [E] bool — events this parameter applies to


@struct.dataclass
class OscConfig:
    """Per-sample oscillation setup (beam / constant-density case).

    The reference shares one NuOscillator calcer across channels with equal
    binning (``OscillationHandler.cpp:18-35``); here all channels share the
    energy grid by construction, and nu/nubar grids are both evaluated
    (2 x NE x 3 x 3 — negligible) so channels just gather.
    """

    e_grid: jnp.ndarray  # [NE] true-energy grid centres
    event_grid_idx: jnp.ndarray  # [E] i32 gather index into e_grid
    event_channel: jnp.ndarray  # [E] i32 channel id
    chan_alpha: jnp.ndarray  # [NC] i32 production flavour (0=e,1=mu,2=tau)
    chan_beta: jnp.ndarray  # [NC] i32 detection flavour
    chan_anti: jnp.ndarray  # [NC] bool
    nc_mask: jnp.ndarray  # [E] bool — NC events get unit osc weight
    baseline: float = struct.field(pytree_node=False)
    density: float = struct.field(pytree_node=False)
    electron_fraction: float = struct.field(pytree_node=False, default=0.5)
    osc_param_idx: jnp.ndarray | None = None  # [6] i32 into the proposal vector
    # Grid compute dtype. float32 by default: float64 is software-emulated on
    # TPU (measured 16x slower) and the f32 probability error (<1e-5) is far
    # below MC statistics. Set to jnp.float64 for exact-parity studies.
    dtype: jnp.dtype = struct.field(pytree_node=False, default=jnp.float32)
    # Eigenvalue/phase dtype. Beam-scale λL (a few rad) is exact to ~1e-7 rad
    # in f32; f64 (default) stays safe for any baseline.
    phase_dtype: jnp.dtype = struct.field(pytree_node=False, default=jnp.float64)

    def prob_grids(self, params: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Raw (nu, antinu) probability grids [NE, 3, 3] — the expensive part,
        shareable between all samples with equal (grid, baseline, density)
        regardless of which channels each reads
        (``OscillationHandler.cpp:18-35`` shared calcer)."""
        osc_pars = OscParams.from_array(params[self.osc_param_idx].astype(ATYPE))
        p_nu = probabilities_const_density(
            osc_pars, self.e_grid, length=self.baseline, rho=self.density,
            ye=self.electron_fraction, antineutrino=False, dtype=self.dtype,
            phase_dtype=self.phase_dtype,
        )
        p_bar = probabilities_const_density(
            osc_pars, self.e_grid, length=self.baseline, rho=self.density,
            ye=self.electron_fraction, antineutrino=True, dtype=self.dtype,
            phase_dtype=self.phase_dtype,
        )
        return p_nu, p_bar

    def chan_table(
        self, params: jnp.ndarray, grids: tuple | None = None
    ) -> jnp.ndarray:
        """Per-channel probability rows [NC, NE]; channel selection is a cheap
        slice on top of (possibly shared) grids."""
        p_nu, p_bar = self.prob_grids(params) if grids is None else grids
        chan_nu = p_nu[:, self.chan_alpha, self.chan_beta].T
        chan_bar = p_bar[:, self.chan_alpha, self.chan_beta].T
        return jnp.where(self.chan_anti[:, None], chan_bar, chan_nu)  # [NC, NE]

    def share_signature(self) -> tuple:
        """Host-side key: configs with equal keys produce identical grids."""
        import numpy as _np

        return (
            "beam",
            _np.asarray(self.e_grid).tobytes(),
            _np.asarray(self.osc_param_idx).tobytes(),
            float(self.baseline),
            float(self.density),
            float(self.electron_fraction),
            str(self.dtype),
            str(self.phase_dtype),
        )


@struct.dataclass
class AtmoOscConfig:
    """Atmospheric oscillation setup: probabilities on an (E, cosZ) grid
    through a layered earth (the reference's CUDAProb3 road,
    ``README.md:119-123``; path geometry from ``osc/prem.py``).

    Events gather by (channel, zenith-bin, energy-bin) flat index.
    """

    e_grid: jnp.ndarray  # [NE]
    layer_lengths: jnp.ndarray  # [NZ, NL] km (0-padded); [H, NZ, NL] with heights
    layer_rho: jnp.ndarray  # [NZ, NL] g/cm^3 (Ye-folded effective density)
    event_flat_idx: jnp.ndarray  # [E] i32 = (chan * NZ + z_idx) * NE + e_idx
    chan_alpha: jnp.ndarray  # [NC] i32
    chan_beta: jnp.ndarray  # [NC] i32
    chan_anti: jnp.ndarray  # [NC] bool
    nc_mask: jnp.ndarray  # [E] bool
    osc_param_idx: jnp.ndarray | None = None  # [6] i32
    # Unique layer densities + per-segment index: the f64 eigensolve runs once
    # per (density, energy) pair instead of per (zenith, layer, energy).
    rho_unique: jnp.ndarray | None = None  # [NR]
    rho_idx: jnp.ndarray | None = None  # [NZ, NL] i32
    # Production-height averaging (CUDAProb3's averaged-height mode): when
    # set, layer_lengths/layer_rho/rho_idx carry a leading [H] axis and the
    # grids are the height-weighted average Σ_h w_h P(h). None = single
    # fixed height (no extra axis, no extra cost).
    height_weights: jnp.ndarray | None = None  # [H], sums to 1
    # Static zenith partition ((z indices, n_layers), ...): each group's layer
    # chain unrolls only to its own segment count — down-going bins (one air
    # segment) skip the padded-identity products of the full PREM chain.
    # Precomputed by build_atmo_osc_config; None evaluates all bins at NL.
    z_groups: tuple | None = struct.field(pytree_node=False, default=None)
    dtype: jnp.dtype = struct.field(pytree_node=False, default=jnp.float32)

    def prob_grids(self, params: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Raw (nu, antinu) probability grids [NZ, NE, 3, 3] — the expensive
        part, shareable between samples with identical path/energy grids
        regardless of channels (``OscillationHandler.cpp:18-35``). With
        production-height averaging the [H, NZ, NE, 3, 3] grids are reduced
        over the height nodes before the per-event gather."""
        osc_pars = OscParams.from_array(params[self.osc_param_idx].astype(ATYPE))

        def one(antineutrino):
            p = probabilities_layered(
                osc_pars, self.e_grid, self.layer_lengths, self.layer_rho,
                antineutrino=antineutrino, dtype=self.dtype,
                rho_unique=self.rho_unique, rho_idx=self.rho_idx,
                z_groups=self.z_groups,
            )
            if self.height_weights is not None:
                w = self.height_weights.astype(p.dtype)
                p = jnp.tensordot(w, p, axes=(0, 0))
            return p

        return one(False), one(True)

    def chan_table(
        self, params: jnp.ndarray, grids: tuple | None = None
    ) -> jnp.ndarray:
        """Flat per-channel table [NC*NZ*NE] from (possibly shared) grids."""
        p_nu, p_bar = self.prob_grids(params) if grids is None else grids
        chan_nu = p_nu[:, :, self.chan_alpha, self.chan_beta]  # [NZ, NE, NC]
        chan_bar = p_bar[:, :, self.chan_alpha, self.chan_beta]
        chan = jnp.where(self.chan_anti[None, None, :], chan_bar, chan_nu)
        # reorder to [NC, NZ, NE] then flatten for the single static gather
        return jnp.moveaxis(chan, -1, 0).reshape(-1)

    def share_signature(self) -> tuple:
        """Host-side key: configs with equal keys produce identical grids."""
        import numpy as _np

        return (
            "atmo",
            _np.asarray(self.e_grid).tobytes(),
            _np.asarray(self.layer_lengths).tobytes(),
            _np.asarray(self.layer_rho).tobytes(),
            _np.asarray(self.osc_param_idx).tobytes(),
            None
            if self.height_weights is None
            else _np.asarray(self.height_weights).tobytes(),
            self.z_groups,
            str(self.dtype),
        )

    def weights(
        self, params: jnp.ndarray, n_events: int, grids: tuple | None = None
    ) -> jnp.ndarray:
        table = self.chan_table(params, grids)
        w = jnp.take(table, self.event_flat_idx, axis=0).astype(FTYPE)
        return jnp.where(self.nc_mask, jnp.ones((), FTYPE), w)


@struct.dataclass
class SampleModel:
    """Static arrays + config for one binned sample; methods are jit-safe."""

    name: str = struct.field(pytree_node=False)
    kin: jnp.ndarray  # [V, E] f32 kinematic variables
    mc_weight: jnp.ndarray  # [E] f32 nominal MC weight
    norm_idx: jnp.ndarray  # [E, Wn] i32 into the (compressed) extended vector
    binning: SampleBinning | NonUniformBinning
    data: jnp.ndarray  # [B] f64 observed histogram
    # One-hot form of norm_idx ([E*Wn, NA+1] f32) when NA is small: gathering
    # from a tiny parameter vector lowers to a catastrophic select-expansion
    # on TPU (measured 12.5 GB/step); as a one-hot matmul it is one MXU
    # product with the indices baked in. None -> use the gather.
    norm_onehot: jnp.ndarray | None = None
    # Match-count matrix [NA+1, E] f32 (S[na, e] = #slots of event e matched
    # to applied-param na) for the in-kernel log-matmul norm product.
    norm_s: jnp.ndarray | None = None
    # Global parameter indices of the NA norm params that match this sample
    # ([NA] i32); the norm structures above index the COMPRESSED extended
    # vector theta[norm_applied] ++ [1.0]. None -> no compression (all NP).
    norm_applied: jnp.ndarray | None = None
    spline_table: DenseSplineTable | SparseSplineTable | None = None
    # Linear functional responses (the reference's TF1_red splines evaluated
    # by EvalOnGPU_TF1); multiplied into the same per-event weight product.
    tf1_table: TF1Table | None = None
    osc: OscConfig | None = None
    shifts: tuple[ShiftSpec, ...] = struct.field(pytree_node=False, default=())
    # Weight-valued functional parameters (masks are pytree leaves).
    weight_fns: tuple = ()
    test_statistic: TestStatistic = struct.field(
        pytree_node=False, default=TestStatistic.BARLOW_BEESTON
    )
    # Dtype of the PER-BIN test-statistic evaluation; the bin sum is always
    # f64 (ATYPE). Default f64 matches the reference's double LLH exactly.
    # "float32" evaluates the stat's transcendentals (log/sqrt — ~20x
    # software-emulated in f64 on TPU) in hardware f32: per-bin error
    # ~1e-7 relative, total-NLL error ~1e-4 absolute at 2k bins —
    # negligible against O(0.1-1) acceptance scales. The low-memory
    # fixture policy (bf16 tables) turns this on.
    stat_dtype: Any = struct.field(pytree_node=False, default=None)
    # Route chain-batched reweights through the fused Pallas kernel
    # (splines/pallas_reweight.py). TPU-only; requires a dense spline table.
    use_pallas: bool = struct.field(pytree_node=False, default=False)
    # Static routing decision (variant + tile sizes) made once at build time
    # by samples/routing.py from n_bins/P/VMEM estimates; None keeps the
    # kernels' built-in default tiles.
    kernel_route: Any = struct.field(pytree_node=False, default=None)
    # Precomputed event->bin map [E] when no functional shift touches a binned
    # axis: bins are then proposal-independent, find_bins vanishes from the
    # step, and the fused kernel takes the shared-bins fast path.
    static_bins: jnp.ndarray | None = None
    # In-kernel shifted binning (exactly one elementwise shift on one binned
    # axis): static descriptor (fn, param_index, edges tuple, stride, n_axis)
    # plus the static-axis bin contribution. Bin edges are baked into the
    # kernel; no [C, E] bin array ever reaches HBM.
    kernel_shift: tuple | None = struct.field(pytree_node=False, default=None)
    shift_static_base: jnp.ndarray | None = None
    # Sorted narrow-histogram plan (shared route only): events were SORTED
    # by static bin at build, each event tile's bins span a small window.
    # hist_tile_starts [ceil(E/event_tile)] i32 (128-aligned window starts),
    # hist_nbl the static window width. None -> wide-histogram kernel.
    hist_tile_starts: jnp.ndarray | None = None
    hist_nbl: int | None = struct.field(pytree_node=False, default=None)
    # Activity plan (params regrouped + events clustered by which coefficient
    # blocks touch them): per event tile, the ACTIVE block indices (padding
    # repeats the last) and the active count gating the kernel's multiplies.
    # The monolith's sparsity, exploited at tile level.
    hist_block_plan: jnp.ndarray | None = None  # [n_etiles, PEmax] i32
    hist_block_nact: jnp.ndarray | None = None  # [n_etiles] i32

    @property
    def n_events(self) -> int:
        return self.kin.shape[1]

    @property
    def n_bins(self) -> int:
        return self.binning.n_bins

    # ------------------------------------------------------------ weights
    def _norm_ext(self, params: jnp.ndarray) -> jnp.ndarray:
        """Extended norm-parameter vector [NA+1]: the sample's applied norm
        params (compressed; tiny static take) plus the literal 1.0 unit
        slot that the padding index multiplies by."""
        if self.norm_applied is not None:
            params = jnp.take(params, self.norm_applied)
        return jnp.concatenate([params.astype(FTYPE), jnp.ones((1,), FTYPE)])

    def _norm_ext_batch(self, thetas: jnp.ndarray) -> jnp.ndarray:
        """[C, NP] -> [C, NA+1] extended norm values for the in-kernel path."""
        t = thetas
        if self.norm_applied is not None:
            t = jnp.take(t, self.norm_applied, axis=1)
        ones = jnp.ones((t.shape[0], 1), FTYPE)
        return jnp.concatenate([t.astype(FTYPE), ones], axis=1)

    def _norm_weights(self, params: jnp.ndarray) -> jnp.ndarray:
        """Product of applicable normalisation parameters per event.

        The extended vector appends a literal 1.0 so the padding index NA
        multiplies by unity (replaces the reference's per-event
        ``norm_pointers`` vector-of-pointers product, ``FillArray_MP``).
        """
        ext = self._norm_ext(params)
        if self.norm_onehot is not None:
            vals = jnp.matmul(
                self.norm_onehot, ext,
                precision=jax.lax.Precision.HIGH,
            ).reshape(self.norm_idx.shape)
            return jnp.prod(vals, axis=1)
        if self.norm_s is not None:
            # Log-matmul product (reference-scale path): |w| = exp(S^T log|v|)
            # with the sign from the parity of matched negative values and an
            # exact zero for any matched zero. One [NP+1] @ [NP+1, E] matvec
            # per chain (XLA batches the vmap into a single matmul); S is read
            # once for all chains, unlike the [E*W, NP+1] one-hot.
            absext = jnp.abs(ext)
            # 1e-30 floor: f32 denormals flush to zero on TPU and
            # 0 * log(0) = NaN would poison the dot.
            logext = jnp.log(jnp.maximum(absext, jnp.asarray(1e-30, FTYPE)))
            hi = jax.lax.Precision.HIGH
            logw = jnp.matmul(logext, self.norm_s, precision=hi)  # [E]
            neg = jnp.matmul((ext < 0).astype(FTYPE), self.norm_s, precision=hi)
            zero = jnp.matmul((absext <= 1e-30).astype(FTYPE), self.norm_s, precision=hi)
            sign = 1.0 - 2.0 * (neg - 2.0 * jnp.floor(neg * 0.5))
            w = jnp.exp(logw) * sign
            return jnp.where(zero > 0.5, jnp.zeros((), FTYPE), w)
        vals = ext[self.norm_idx]  # [E, Wn]
        return jnp.prod(vals, axis=1)

    def _spline_weights(self, params: jnp.ndarray) -> jnp.ndarray:
        if self.spline_table is None:
            return jnp.ones((self.n_events,), FTYPE)
        if isinstance(self.spline_table, DenseSplineTable):
            return eval_dense(self.spline_table, params)
        return eval_sparse(self.spline_table, params)

    def _osc_weights(
        self, params: jnp.ndarray, osc_grids: tuple | None = None
    ) -> jnp.ndarray:
        """``osc_grids`` optionally injects precomputed (nu, antinu)
        probability grids (see ``prob_grids``) so samples sharing a grid
        compute them once per step — the reference's shared-calcer saving
        (``OscillationHandler.cpp:18-35``). Channel selection stays
        per-sample."""
        if self.osc is None:
            return jnp.ones((self.n_events,), FTYPE)
        if isinstance(self.osc, AtmoOscConfig):
            return self.osc.weights(params, self.n_events, grids=osc_grids)
        o = self.osc
        chan = o.chan_table(params, grids=osc_grids)  # [NC, NE]
        # Per-event lookup as ONE flat 1-D gather with static indices: the 2-D
        # advanced-index form lowered to a pathological expansion on TPU
        # (measured 14 GB of traffic for a 20k-event sample).
        ne = o.e_grid.shape[0]
        flat_idx = o.event_channel * ne + o.event_grid_idx  # [E] i32, static
        w = jnp.take(chan.reshape(-1), flat_idx, axis=0).astype(FTYPE)
        # NC events do not oscillate: unit weight (``SampleHandlerFD.cpp:1127-1133``).
        return jnp.where(o.nc_mask, jnp.ones((), FTYPE), w)

    def _func_weights(self, params: jnp.ndarray) -> jnp.ndarray | None:
        """Product of weight-valued functional responses on matched events
        (None when the sample has none). See :class:`WeightSpec`."""
        if not self.weight_fns:
            return None
        w = jnp.ones((self.n_events,), FTYPE)
        one = jnp.ones((), FTYPE)
        for ws in self.weight_fns:
            wf = ws.fn(params[ws.param_index], self.kin).astype(FTYPE)
            w = w * jnp.where(ws.mask, wf, one)
        return w

    def _shifted_kinematics(self, params: jnp.ndarray) -> jnp.ndarray:
        kin = self.kin
        for s in self.shifts:
            shifted = s.fn(params[s.param_index], kin[s.var_row], kin)
            kin = kin.at[s.var_row].set(shifted.astype(FTYPE))
        return kin

    # ---------------------------------------------------------- reweight
    def event_weights(
        self, params: jnp.ndarray, osc_grids: tuple | None = None
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Per-event (weight [E], bin [E]) before the histogram fill — the
        reference's per-event state inside ``FillArray_MP``, exposed for
        projections and by-mode predictive breakdowns."""
        w = (
            self.mc_weight
            * self._norm_weights(params)
            * self._spline_weights(params)
            * self._osc_weights(params, osc_grids)
        )
        if self.tf1_table is not None:
            w = w * self.tf1_table.eval(params)
        fw = self._func_weights(params)
        if fw is not None:
            w = w * fw
        if self.static_bins is not None:
            return w, self.static_bins
        kin = self._shifted_kinematics(params)
        bins = self.binning.find_bins(kin)
        return w, bins

    def reweight(
        self, params: jnp.ndarray, osc_grids: tuple | None = None
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Full event reweight + histogram fill: params [NP] -> (mc [B], w2 [B])."""
        w, bins = self.event_weights(params, osc_grids)
        return histogram(w, bins, self.n_bins)

    def _stat_sum(self, mc: jnp.ndarray, w2: jnp.ndarray) -> jnp.ndarray:
        """Per-bin test statistic (in ``stat_dtype``, default f64) summed
        over bins in f64 — the reference's double LLH accumulation
        (``SampleHandlerFD.cpp:1284-1300``). Works batched ([C, B] -> [C])
        and unbatched ([B] -> scalar)."""
        sd = self.stat_dtype or ATYPE
        stat_fn = get_test_stat_fn(self.test_statistic)
        data = self.data if mc.ndim == 1 else self.data[None, :]
        per_bin = stat_fn(data.astype(sd), mc.astype(sd), w2.astype(sd))
        return jnp.sum(per_bin, axis=-1, dtype=ATYPE)

    def log_likelihood(
        self, params: jnp.ndarray, osc_grids: tuple | None = None
    ) -> jnp.ndarray:
        """-logL of this sample (f64 scalar), ``GetLikelihood`` equivalent."""
        mc, w2 = self.reweight(params, osc_grids)
        return self._stat_sum(mc, w2)

    # ------------------------------------------------------ batched (chains)
    def reweight_batch(
        self, thetas: jnp.ndarray, osc_grids_batch: tuple | None = None
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Chain-batched reweight: thetas [C, NP] -> (mc [C, B], w2 [C, B]).

        With ``use_pallas`` and a dense spline table, the spline product +
        histogram run in the fused kernel (one VMEM pass); the osc/norm/bin
        pieces are computed with vmapped XLA either way.
        ``osc_grids_batch`` optionally injects per-chain (nu, antinu)
        probability grids computed once for all samples sharing a grid.
        """
        oc = (None,) if osc_grids_batch is None else (osc_grids_batch,)
        in_axes = (0, None if osc_grids_batch is None else 0)
        if not (self.use_pallas and isinstance(self.spline_table, DenseSplineTable)):
            return jax.vmap(self.reweight, in_axes=in_axes)(thetas, *oc)
        from ..splines.pallas_reweight import (
            fused_reweight_histogram,
            fused_reweight_histogram_shared,
            spline_selector,
        )

        # The norm product moves in-kernel (log-matmul) when norm_s exists AND
        # the kernel variant supports it (the shared/static-bins and shifted
        # paths); otherwise it is part of the XLA-side base weight.
        norm_in_kernel = self.norm_s is not None and (
            self.kernel_shift is not None or self.static_bins is not None
        )

        def _base(t, c):
            w = self.mc_weight * self._osc_weights(t, c)
            if not norm_in_kernel:
                w = w * self._norm_weights(t)
            if self.tf1_table is not None:
                w = w * self.tf1_table.eval(t)
            fw = self._func_weights(t)
            if fw is not None:
                w = w * fw
            return w

        base_w = jax.vmap(_base, in_axes=in_axes)(thetas, *oc)
        selector = spline_selector(self.spline_table, thetas)
        table = self.spline_table
        coeffs = table.coeffs  # stored flat [P, K4, E]
        tiles = {}
        if self.kernel_route is not None and self.kernel_route.use_pallas:
            tiles = dict(
                chain_tile=self.kernel_route.chain_tile,
                event_tile=self.kernel_route.event_tile,
            )
        if self.static_bins is not None:
            if self.kernel_route is not None:
                tiles["param_tile"] = self.kernel_route.param_tile
            norm_kwargs = {}
            if norm_in_kernel:
                norm_kwargs = dict(
                    norm_ext=self._norm_ext_batch(thetas),
                    norm_s=self.norm_s,
                )
            if self.hist_tile_starts is not None and self.hist_nbl is not None:
                norm_kwargs["tile_starts"] = self.hist_tile_starts
                norm_kwargs["nbl"] = self.hist_nbl
                if self.hist_block_plan is not None:
                    norm_kwargs["block_plan"] = self.hist_block_plan
                    norm_kwargs["block_nact"] = self.hist_block_nact
            return fused_reweight_histogram_shared(
                selector, coeffs, base_w, self.static_bins, n_bins=self.n_bins,
                **norm_kwargs, **tiles,
            )
        if self.kernel_shift is not None:
            from ..splines.pallas_reweight import fused_reweight_histogram_shifted

            if self.kernel_route is not None:
                tiles["param_tile"] = self.kernel_route.param_tile
            fn, param_index, edges, stride_j, n_axis_j = self.kernel_shift
            norm_kwargs = {}
            if norm_in_kernel:
                norm_kwargs = dict(
                    norm_ext=self._norm_ext_batch(thetas),
                    norm_s=self.norm_s,
                )
            return fused_reweight_histogram_shifted(
                selector,
                coeffs,
                base_w,
                thetas[:, param_index].astype(FTYPE),
                self.kin[self.shifts[0].var_row],
                self.shift_static_base,
                n_bins=self.n_bins,
                shift_fn=fn,
                edges=edges,
                stride_j=stride_j,
                n_axis_j=n_axis_j,
                **norm_kwargs,
                **tiles,
            )
        bins = jax.vmap(
            lambda t: self.binning.find_bins(self._shifted_kinematics(t))
        )(thetas)
        return fused_reweight_histogram(
            selector, coeffs, base_w, bins, n_bins=self.n_bins, **tiles
        )

    def log_likelihood_batch(
        self,
        thetas: jnp.ndarray,
        osc_grids_batch: tuple | None = None,
        event_axis: str | None = None,
    ) -> jnp.ndarray:
        """[C, NP] -> [C] -logL.

        event_axis: shard_map mesh axis when this sample's event arrays are
        sharded — the local partial histograms (each shard reweights its own
        events) are psum'd over ICI before the test statistic, which needs
        the full per-bin Σw / Σw² (Barlow-Beeston beta depends on both)."""
        mc, w2 = self.reweight_batch(thetas, osc_grids_batch)
        if event_axis is not None:
            mc = jax.lax.psum(mc, event_axis)
            w2 = jax.lax.psum(w2, event_axis)
        return self._stat_sum(mc, w2)

    def log_likelihood_batch_xla(
        self, thetas: jnp.ndarray, osc_grids_batch: tuple | None = None
    ) -> jnp.ndarray:
        """[C, NP] -> [C] -logL via the pure-XLA (non-Pallas) batched path.

        The differentiable twin of :meth:`log_likelihood_batch`: identical
        math, but the spline product + histogram run as vmapped XLA ops that
        ``jax.grad`` can reverse. Fallback for samples the fused
        differentiable path (:meth:`log_likelihood_batch_diff`) cannot take,
        and the parity anchor for its tests."""
        oc = (None,) if osc_grids_batch is None else (osc_grids_batch,)
        in_axes = (0, None if osc_grids_batch is None else 0)
        mc, w2 = jax.vmap(self.reweight, in_axes=in_axes)(thetas, *oc)
        return self._stat_sum(mc, w2)

    @staticmethod
    def _diff_shared_event_tile(
        n_bins: int, chain_tile: int, event_tile: int, p_tile: int, k4: int,
        budget_bytes: int = 12 * 2**20,
    ) -> int | None:
        """Largest event tile (<= event_tile, >= 256) whose backward pass A
        fits scoped VMEM (~16 MB; 12 MB budget leaves Mosaic headroom), or
        None when even 256 does not fit (-> XLA fallback). Pass A holds an
        in-kernel one-hot [BP, ET], the [CT, BP] cotangent blocks, the
        [PT, K4, ET] coefficient tile, and ~10 [CT, ET] f32 fields; with the
        unrouted default ET=4096 the one-hot alone exceeds VMEM from
        n_bins ~ 900 (advisor r3, medium)."""
        bp = -(-(n_bins + 1) // 128) * 128
        et = event_tile
        while et >= 256:
            words = (
                bp * et                      # in-kernel one-hot [BP, ET]
                + 2 * chain_tile * bp        # gmc/gw2 cotangent blocks
                + 2 * p_tile * k4 * et       # coeff tile (+ transpose in B)
                + chain_tile * p_tile * k4   # selector block
                + 10 * chain_tile * et       # base/bins/outputs/scratch/G
            )
            if words * 4 <= budget_bytes:
                return et
            et //= 2
        return None

    def _diff_route(self) -> tuple | None:
        """(kind, static) for the fused differentiable path, or None for the
        XLA fallback. Shared-bins samples use the route's tiles (any P via
        param blocking), with the event tile shrunk — or the route refused —
        when the backward's bin-proportional VMEM footprint would not fit;
        shifted-route samples use the in-kernel-binning forward (any P) with
        the mask-loop backward gather; other per-chain-bins samples qualify
        only when small enough for the unblocked generic kernel."""
        from ..splines.pallas_grad import MAX_PERCHAIN_BINS

        if not (self.use_pallas and isinstance(self.spline_table, DenseSplineTable)):
            return None
        kr = self.kernel_route
        routed = kr is not None and kr.use_pallas
        if self.static_bins is not None:
            ct = kr.chain_tile if routed else 64
            et0 = kr.event_tile if routed else 4096
            pt = kr.param_tile if routed else None
            n_params = self.spline_table.coeffs.shape[0]
            k4 = self.spline_table.coeffs.shape[1]
            eff_pt = pt if (pt is not None and pt < n_params) else n_params
            et = self._diff_shared_event_tile(self.n_bins, ct, et0, eff_pt, k4)
            if et is None:
                return None
            return "shared", (self.n_bins, ct, et, pt, True)
        if self.kernel_shift is not None and self.n_bins <= MAX_PERCHAIN_BINS:
            fn, _, edges, stride_j, n_axis_j = self.kernel_shift
            return "shifted", (
                self.n_bins,
                kr.chain_tile if routed else 16,
                kr.event_tile if routed else 2048,
                kr.param_tile if routed else None,
                fn, edges, stride_j, n_axis_j,
            )
        if (
            self.spline_table.coeffs.shape[0] <= 16
            and self.n_bins <= MAX_PERCHAIN_BINS
        ):
            return "generic", (self.n_bins, 16, 2048, None, False)
        return None

    def log_likelihood_batch_diff(
        self, thetas: jnp.ndarray, osc_grids_batch: tuple | None = None
    ) -> jnp.ndarray:
        """[C, NP] -> [C] -logL, differentiable at fused-kernel speed.

        Forward runs the fused Pallas reweight+histogram; backward is the
        analytic two-pass kernel (``splines/pallas_grad.py``). Unlike the
        sampling path, the norm product stays in XLA-side ``base_w`` so its
        gradient rides ordinary autodiff. Gradient samplers
        (HMC/MALA/ChEES) and the minimiser ride this; samples without a
        fused route fall back to :meth:`log_likelihood_batch_xla`.
        Bin indices are integer outputs (piecewise-constant in θ), so
        functional-shift parameters get their a.e.-zero binning gradient in
        both paths."""
        route = self._diff_route()
        if route is None:
            return self.log_likelihood_batch_xla(thetas, osc_grids_batch)
        kind, static = route
        from ..splines.pallas_grad import (
            fused_reweight_diff,
            fused_reweight_diff_shifted,
        )
        from ..splines.pallas_reweight import spline_selector

        oc = (None,) if osc_grids_batch is None else (osc_grids_batch,)
        in_axes = (0, None if osc_grids_batch is None else 0)

        def _base(t, c):
            w = self.mc_weight * self._osc_weights(t, c) * self._norm_weights(t)
            if self.tf1_table is not None:
                w = w * self.tf1_table.eval(t)
            fw = self._func_weights(t)
            if fw is not None:
                w = w * fw
            return w

        base_w = jax.vmap(_base, in_axes=in_axes)(thetas, *oc)
        selector = spline_selector(self.spline_table, thetas)
        table = self.spline_table
        coeffs = table.coeffs  # stored flat [P, K4, E]
        if kind == "shifted":
            bins_xla = jax.vmap(
                lambda t: self.binning.find_bins(self._shifted_kinematics(t))
            )(thetas)
            mc, w2 = fused_reweight_diff_shifted(
                static, selector, coeffs, base_w,
                thetas[:, self.kernel_shift[1]].astype(FTYPE),
                self.kin[self.shifts[0].var_row],
                self.shift_static_base,
                bins_xla,
            )
        else:
            if kind == "shared":
                bins = self.static_bins
            else:
                bins = jax.vmap(
                    lambda t: self.binning.find_bins(self._shifted_kinematics(t))
                )(thetas)
            mc, w2 = fused_reweight_diff(static, selector, coeffs, base_w, bins)
        return self._stat_sum(mc, w2)

    def osc_prob_grids(self, params: jnp.ndarray) -> tuple | None:
        """This sample's raw probability grids (None without oscillation)."""
        if self.osc is None:
            return None
        return self.osc.prob_grids(params)

    def osc_share_signature(self) -> tuple | None:
        """Host-side sharing key; equal keys -> identical ``chan_table``."""
        if self.osc is None:
            return None
        return self.osc.share_signature()

    def with_data(self, data) -> "SampleModel":
        return self.replace(data=jnp.asarray(data, ATYPE))

    def with_binning(self, binning) -> "SampleModel":
        """Swap the binning, recomputing the static event->bin map (use this
        instead of ``replace(binning=...)`` which would keep a stale map)."""
        from .routing import choose_kernel_route

        static_bins = None
        if not self.shifts:
            static_bins = binning.find_bins(self.kin)
        requested = (
            self.kernel_route.requested
            if self.kernel_route is not None
            else self.use_pallas
        )
        route = choose_kernel_route(
            binning.n_bins,
            self.spline_table,
            has_static_bins=static_bins is not None,
            has_kernel_shift=False,
            requested=requested,
        )
        return self.replace(
            binning=binning,
            static_bins=static_bins,
            kernel_shift=None,  # conservative: rebuilt only by build_sample_model
            shift_static_base=None,
            data=jnp.zeros((binning.n_bins,), ATYPE),
            use_pallas=route.use_pallas,
            kernel_route=route,
        )

    def asimov_data(self, params: jnp.ndarray) -> jnp.ndarray:
        """MC prediction at the given parameters, for Asimov fits (the
        reference's default: data = nominal MC, ``MaCh3Factory.h:134-157``)."""
        mc, _ = self.reweight(params)
        return mc.astype(ATYPE)


def total_log_likelihood(
    samples: Sequence[SampleModel], params: jnp.ndarray
) -> jnp.ndarray:
    """Sum of sample -logLs (f64)."""
    total = jnp.zeros((), ATYPE)
    for s in samples:
        total = total + s.log_likelihood(params)
    return total
