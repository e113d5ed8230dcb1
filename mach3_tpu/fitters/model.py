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
from ..params.state import PriorModel, get_likelihood, propose_step
from ..samples.sample import SampleModel


@struct.dataclass
class FitModel:
    priors: tuple[PriorModel, ...]
    samples: tuple[SampleModel, ...]
    slices: tuple[tuple[int, int], ...] = struct.field(pytree_node=False)  # (start, size)

    @property
    def n_params(self) -> int:
        start, size = self.slices[-1]
        return start + size

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
        return cls(priors=tuple(priors), samples=tuple(samples), slices=tuple(slices))

    def prefit_vector(self) -> jnp.ndarray:
        return jnp.concatenate([p.prefit for p in self.priors]).astype(ATYPE)

    # ----------------------------------------------------------- proposal
    def propose(self, theta: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
        """Blockwise correlated proposal over all handlers: θ [P] -> θ' [P]."""
        keys = jax.random.split(key, len(self.priors))
        parts = []
        for prior, (start, size), k in zip(self.priors, self.slices, keys):
            parts.append(propose_step(prior, jax.lax.dynamic_slice(theta, (start,), (size,)), k))
        return jnp.concatenate(parts)

    # --------------------------------------------------------- likelihood
    def prior_nll(self, theta: jnp.ndarray) -> jnp.ndarray:
        """Sum of handler prior -logLs incl. out-of-bounds sentinels
        (``MR2T2::ProposeStep`` systematics loop, ``Fitters/MR2T2.cpp:25-50``)."""
        total = jnp.zeros((), ATYPE)
        for prior, (start, size) in zip(self.priors, self.slices):
            total = total + get_likelihood(prior, jax.lax.dynamic_slice(theta, (start,), (size,)))
        return total

    def sample_nll(self, theta: jnp.ndarray) -> jnp.ndarray:
        total = jnp.zeros((), ATYPE)
        for s in self.samples:
            total = total + s.log_likelihood(theta)
        return total

    def sample_nll_breakdown(self, theta: jnp.ndarray) -> jnp.ndarray:
        """Per-sample -logL vector (the reference's ``sample_llh`` branches)."""
        if not self.samples:
            return jnp.zeros((0,), ATYPE)
        return jnp.stack([s.log_likelihood(theta) for s in self.samples])

    def prior_nll_breakdown(self, theta: jnp.ndarray) -> jnp.ndarray:
        return jnp.stack(
            [
                get_likelihood(p, jax.lax.dynamic_slice(theta, (s,), (z,)))
                for p, (s, z) in zip(self.priors, self.slices)
            ]
        )

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
        self, thetas: jnp.ndarray
    ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Batched -logL plus its per-handler and per-sample pieces
        ([C], [C, H], [C, S]) from ONE evaluation — the pieces feed the
        reference's ``LogL_systematic_*`` / ``LogL_sample_*`` chain branches
        (``Fitters/FitterBase.cpp:185-197``)."""
        prior_parts = jax.vmap(self.prior_nll_breakdown)(thetas)  # [C, H]
        prior = jnp.sum(prior_parts, axis=1)
        oob = prior >= LARGE_LOGL
        if self.samples:
            osc_tables = self._shared_osc_tables(thetas)
            sample_parts = jnp.stack(
                [
                    s.log_likelihood_batch(thetas, osc_grids_batch=osc_tables[i])
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
        Grouping happens at trace time via host-side signatures; each unique
        table is evaluated once per chain batch and handed to every sample in
        its group.
        """
        tables: list = [None] * len(self.samples)
        by_sig: dict = {}
        for i, s in enumerate(self.samples):
            sig = s.osc_share_signature()
            if sig is None:
                continue
            if sig not in by_sig:
                by_sig[sig] = jax.vmap(s.osc_prob_grids)(thetas)
            tables[i] = by_sig[sig]
        return tables

    # Convenience for HMC/NUTS: differentiable log-density (no sentinel).
    def log_posterior(self, theta: jnp.ndarray) -> jnp.ndarray:
        total = jnp.zeros((), ATYPE)
        for prior, (start, size) in zip(self.priors, self.slices):
            block = jax.lax.dynamic_slice(theta, (start,), (size,))
            d = jnp.where(prior.flat_prior, 0.0, block - prior.prefit)
            total = total - 0.5 * d @ (prior.inv_cov @ d)
        return total - self.sample_nll(theta)

    # ------------------------------------------------------------- numpy
    def parameter_names(self, parameter_sets: Sequence[ParameterSet]) -> list[str]:
        names: list[str] = []
        for ps in parameter_sets:
            names.extend(f"{ps.name}_{n}" for n in ps.names)
        return names
