"""The fit model: parameter handlers + samples as one functional posterior.

Replaces the reference's object wiring (``FitterBase::AddSystObj`` /
``AddSampleHandler``, ``Fitters/FitterBase.cpp:262-345``): instead of handler
objects exchanging pointers, a :class:`FitModel` holds

* a tuple of :class:`PriorModel` blocks, each owning a static slice of the
  concatenated parameter vector θ (the reference's multiple
  ``ParameterHandler`` objects, e.g. xsec + osc), and
* a tuple of :class:`SampleModel` likelihood terms.

Everything a step needs is a pure function of θ.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..core.precision import ATYPE, LARGE_LOGL
from ..params.parameterset import ParameterSet
from ..params.state import PriorModel, propose_step
from ..samples.sample import SampleModel


def _flatten_priors(priors: Sequence[PriorModel]) -> PriorModel:
    """Assemble per-handler blocks into one full-vector PriorModel."""

    def cat(field):
        return jnp.concatenate([getattr(p, field) for p in priors])

    def blockdiag(field):
        mats = [np.asarray(getattr(p, field)) for p in priors]
        n = sum(m.shape[0] for m in mats)
        k = sum(m.shape[1] for m in mats)
        out = np.zeros((n, k))
        i = j = 0
        for m in mats:
            out[i : i + m.shape[0], j : j + m.shape[1]] = m
            i += m.shape[0]
            j += m.shape[1]
        return jnp.asarray(out, ATYPE)

    return PriorModel(
        prefit=cat("prefit"),
        inv_cov=blockdiag("inv_cov"),
        chol=blockdiag("chol"),
        step_scale=cat("step_scale"),
        low_bound=cat("low_bound"),
        up_bound=cat("up_bound"),
        flat_prior=cat("flat_prior"),
        fixed=cat("fixed"),
        circ_mask=cat("circ_mask"),
        circ_low=cat("circ_low"),
        circ_high=cat("circ_high"),
        flip_mask=cat("flip_mask"),
        flip_point=cat("flip_point"),
    )


@struct.dataclass
class FitModel:
    priors: tuple[PriorModel, ...]
    samples: tuple[SampleModel, ...]
    slices: tuple[tuple[int, int], ...] = struct.field(pytree_node=False)  # (start, size)
    # All handler blocks assembled into ONE full-vector PriorModel
    # (block-diagonal Cholesky / inverse covariance, concatenated masks): the
    # proposal and prior become single whole-vector ops instead of a python
    # loop of per-block slices — measured ~1.7 ms/step of small-op overhead
    # at 256 chains. Per-block paths remain for breakdowns.
    flat: PriorModel | None = None
    # STATIC osc-grid sharing map: osc_groups[i] = index of the first sample
    # with an identical oscillation signature (-1 = no oscillation). Computed
    # at build time from concrete arrays — the model is passed as a TRACED
    # pytree argument to jitted steps, so signatures cannot be read at trace
    # time (tracer arrays have no bytes).
    osc_groups: tuple | None = struct.field(pytree_node=False, default=None)

    @property
    def n_params(self) -> int:
        start, size = self.slices[-1]
        return start + size

    @staticmethod
    def _compute_osc_groups(samples: Sequence[SampleModel]) -> tuple:
        by_sig: dict = {}
        groups = []
        for i, s in enumerate(samples):
            sig = s.osc_share_signature()
            if sig is None:
                groups.append(-1)
            else:
                groups.append(by_sig.setdefault(sig, i))
        return tuple(groups)

    @classmethod
    def build(
        cls, parameter_sets: Sequence[ParameterSet], samples: Sequence[SampleModel]
    ) -> "FitModel":
        priors = []
        slices = []
        start = 0
        for ps in parameter_sets:
            priors.append(PriorModel.from_parameter_set(ps))
            slices.append((start, len(ps)))
            start += len(ps)
        return cls(
            priors=tuple(priors),
            samples=tuple(samples),
            slices=tuple(slices),
            flat=_flatten_priors(priors),
            osc_groups=cls._compute_osc_groups(samples),
        )

    def prefit_vector(self) -> jnp.ndarray:
        return jnp.concatenate([p.prefit for p in self.priors]).astype(ATYPE)

    def _flat(self) -> PriorModel:
        # `flat` is None only for FitModels deserialised from old pytrees.
        return self.flat if self.flat is not None else _flatten_priors(self.priors)

    def _block_onehot(self) -> jnp.ndarray:
        """[H, P] one-hot handler membership (static). Per-block reductions
        run as a tiny matmul — TPU scatter (segment_sum) lowering is slow."""
        ids = np.concatenate(
            [np.full(size, h, np.int32) for h, (_, size) in enumerate(self.slices)]
        )
        oh = (ids[None, :] == np.arange(len(self.slices))[:, None]).astype(np.float64)
        return jnp.asarray(oh)

    # ----------------------------------------------------------- proposal
    def propose(self, theta: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
        """Correlated proposal over all handlers as ONE whole-vector op
        (block-diagonal Cholesky): θ [P] -> θ' [P]. Identical semantics to the
        per-handler loop — flips/wraps are independent per parameter."""
        return propose_step(self._flat(), theta, key)

    # --------------------------------------------------------- likelihood
    def prior_nll(self, theta: jnp.ndarray) -> jnp.ndarray:
        """Total prior -logL incl. out-of-bounds sentinels — the reference's
        per-handler sum (``MR2T2::ProposeStep`` systematics loop,
        ``Fitters/MR2T2.cpp:25-50``: in-bounds handlers contribute their
        quadratic form, out-of-bounds ones ``NOutside * LARGE_LOGL``) — as
        whole-vector ops: the block-diagonal inverse covariance makes each
        handler's quadratic form a segment-sum of ``d * (V⁻¹ d)``."""
        return jnp.sum(self.prior_nll_breakdown(theta))

    def sample_nll(self, theta: jnp.ndarray) -> jnp.ndarray:
        """Sum of sample -logLs at one θ, sharing oscillation grids across
        samples with equal signatures (``OscillationHandler.cpp:18-35``) —
        the single-point path for the minimiser (``LikelihoodFit::CalcChi2``)."""
        tables = self._shared_osc_tables_single(theta)
        total = jnp.zeros((), ATYPE)
        for i, s in enumerate(self.samples):
            total = total + s.log_likelihood(theta, osc_grids=tables[i])
        return total

    def sample_nll_breakdown(self, theta: jnp.ndarray) -> jnp.ndarray:
        """Per-sample -logL vector (the reference's ``sample_llh`` branches)."""
        if not self.samples:
            return jnp.zeros((0,), ATYPE)
        return jnp.stack([s.log_likelihood(theta) for s in self.samples])

    def prior_nll_breakdown(self, theta: jnp.ndarray) -> jnp.ndarray:
        """[H] per-handler prior -logL (``GetLikelihood`` per handler) from
        whole-vector ops + segment sums over the static block ids."""
        flat = self._flat()
        onehot = self._block_onehot()  # [H, P]
        d = jnp.where(flat.flat_prior, 0.0, theta.astype(ATYPE) - flat.prefit)
        contrib = d * (flat.inv_cov @ d)  # block-diag: per-block quad pieces
        quad = 0.5 * (onehot @ contrib)
        outside = (theta > flat.up_bound) | (theta < flat.low_bound)
        n_out = onehot @ outside.astype(ATYPE)
        return jnp.where(n_out > 0.5, n_out * LARGE_LOGL, quad)

    def total_nll(self, theta: jnp.ndarray) -> jnp.ndarray:
        """Full -logL with the out-of-bounds short-circuit semantics of
        ``MR2T2::ProposeStep`` (``Fitters/MR2T2.cpp:51-99``): when the prior is
        at the sentinel, the sample term is replaced (not skipped — compute is
        uniform on TPU) so the result matches the reference's
        ``prior + n_samples * _LARGE_LOGL_``."""
        prior = self.prior_nll(theta)
        oob = prior >= LARGE_LOGL
        sample = self.sample_nll(theta)
        n_samples = len(self.samples)
        return prior + jnp.where(oob, n_samples * jnp.asarray(LARGE_LOGL, ATYPE), sample)

    # --------------------------------------------------- chain-batched paths
    def total_nll_batch(self, thetas: jnp.ndarray) -> jnp.ndarray:
        """[C, NP] -> [C], using each sample's batched (possibly Pallas) path.

        Semantics identical to ``vmap(total_nll)``; preferred inside the MCMC
        step so fused kernels engage.
        """
        total, _, _ = self.total_nll_batch_parts(thetas)
        return total

    def total_nll_batch_parts(
        self, thetas: jnp.ndarray, want_parts: bool = True,
        event_axis: str | None = None,
    ) -> tuple[jnp.ndarray, jnp.ndarray | None, jnp.ndarray]:
        """Batched -logL plus its per-handler and per-sample pieces
        ([C], [C, H], [C, S]) from ONE evaluation — the pieces feed the
        reference's ``LogL_systematic_*`` / ``LogL_sample_*`` chain branches
        (``Fitters/FitterBase.cpp:185-197``). With ``want_parts=False`` the
        per-handler breakdown (a per-block loop) is skipped and the prior is
        one whole-vector op. ``event_axis``: shard_map mesh axis carrying the
        event shards (partial histograms are psum'd before the test
        statistic)."""
        prior_parts = jax.vmap(self.prior_nll_breakdown)(thetas)  # [C, H]
        prior = jnp.sum(prior_parts, axis=1)
        if not want_parts:
            prior_parts = None
        oob = prior >= LARGE_LOGL
        if self.samples:
            osc_tables = self._shared_osc_tables(thetas)
            sample_parts = jnp.stack(
                [
                    s.log_likelihood_batch(
                        thetas, osc_grids_batch=osc_tables[i],
                        event_axis=event_axis,
                    )
                    for i, s in enumerate(self.samples)
                ],
                axis=1,
            )  # [C, S]
        else:
            sample_parts = jnp.zeros((thetas.shape[0], 0), ATYPE)
        sample = jnp.sum(sample_parts, axis=1)
        n_samples = len(self.samples)
        total = prior + jnp.where(
            oob, n_samples * jnp.asarray(LARGE_LOGL, ATYPE), sample
        )
        return total, prior_parts, sample_parts

    def _shared_osc_tables(self, thetas: jnp.ndarray) -> list:
        """Per-sample oscillation tables, computed ONCE per unique grid.

        The reference shares NuOscillator calcers across samples/channels with
        equal binning — "up to 12x" time saving (``OscillationHandler.cpp:18-35``).
        Grouping is STATIC (``osc_groups``, computed at build); each unique
        table is evaluated once per chain batch and handed to every sample in
        its group.
        """
        groups = self.osc_groups
        if groups is None:
            # Legacy pytree without the static map: derive it now (requires
            # concrete arrays, i.e. an unjitted/closure context).
            groups = self._compute_osc_groups(self.samples)
        tables: list = [None] * len(self.samples)
        cache: dict = {}
        for i, g in enumerate(groups):
            if g < 0:
                continue
            if g not in cache:
                cache[g] = jax.vmap(self.samples[g].osc_prob_grids)(thetas)
            tables[i] = cache[g]
        return tables

    def _shared_osc_tables_single(self, theta: jnp.ndarray) -> list:
        """Unbatched form of :meth:`_shared_osc_tables` (one θ, no vmap)."""
        groups = self.osc_groups
        if groups is None:
            groups = self._compute_osc_groups(self.samples)
        tables: list = [None] * len(self.samples)
        cache: dict = {}
        for i, g in enumerate(groups):
            if g < 0:
                continue
            if g not in cache:
                cache[g] = self.samples[g].osc_prob_grids(theta)
            tables[i] = cache[g]
        return tables

    # Convenience for HMC/NUTS: differentiable log-density (no sentinel).
    def log_posterior(self, theta: jnp.ndarray) -> jnp.ndarray:
        total = jnp.zeros((), ATYPE)
        for prior, (start, size) in zip(self.priors, self.slices):
            block = jax.lax.dynamic_slice(theta, (start,), (size,))
            d = jnp.where(prior.flat_prior, 0.0, block - prior.prefit)
            total = total - 0.5 * d @ (prior.inv_cov @ d)
        return total - self.sample_nll(theta)

    def log_posterior_batch(self, thetas: jnp.ndarray) -> jnp.ndarray:
        """[C, NP] -> [C] differentiable log-density — the gradient-sampler
        (HMC/MALA/ChEES/L-BFGS) analogue of :meth:`total_nll_batch`.

        Semantics identical to ``vmap(log_posterior)`` but built from the
        batched machinery: oscillation grids are computed once per unique
        signature and shared across samples (``OscillationHandler.cpp:18-35``),
        the prior is one whole-vector quadratic form on the block-diagonal
        flattened model, and each sample's reweight runs fused: forward is
        the Pallas kernel, backward the analytic two-pass gradient kernel
        (:meth:`SampleModel.log_likelihood_batch_diff`; samples without a
        fused route fall back to the batched XLA twin). No out-of-bounds
        sentinel — hard bounds are the caller's job (HMC applies them as a
        -inf mask outside the gradient)."""
        flat = self._flat()
        th = thetas.astype(ATYPE)
        d = jnp.where(flat.flat_prior[None, :], 0.0, th - flat.prefit[None, :])
        prior = 0.5 * jnp.sum(d * (d @ flat.inv_cov.T), axis=1)  # [C]
        total = -prior
        if self.samples:
            osc_tables = self._shared_osc_tables(thetas)
            for i, s in enumerate(self.samples):
                total = total - s.log_likelihood_batch_diff(
                    thetas, osc_grids_batch=osc_tables[i]
                )
        return total

    # ------------------------------------------------------------- numpy
    def parameter_names(self, parameter_sets: Sequence[ParameterSet]) -> list[str]:
        names: list[str] = []
        for ps in parameter_sets:
            names.extend(f"{ps.name}_{n}" for n in ps.names)
        return names
