"""Delayed-rejection MR2T2 (DRAM-style).

TPU-native equivalent of ``Fitters/DelayedMR2T2.cpp``: on rejection, retry
with the step scale multiplied by ``decay_rate``, up to ``max_rejections``
times; later attempts use the DRAM acceptance ratio (arXiv:2010.04190)

    alpha_2 = min(1, max(0, e^{Lmin - Lprop} - 1) / (e^{Lmin - Lcurr} - 1))

where ``Lmin`` is the best (lowest) -logL among the rejected proposals so far.
Retries "leapfrog": each retry proposes from the last rejected point
(``DelayedMR2T2.cpp`` AcceptStep-between-attempts hack), and on final
rejection the original state is restored.

Vectorised: all chains run the full retry cascade in lockstep; chains that
already accepted are masked out (uniform compute — the TPU way). ``max_rejections``
is a static unroll.

Note: the reference's ``ProbabilisticDelay`` gates on ``Rndm() > delay_probability``
which inverts its documented meaning (delay_probability = 1 would never delay);
we implement the documented semantics: delay with probability ``delay_probability``.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..core.precision import ATYPE, LARGE_LOGL
from .mcmc import (
    MCMCConfig,
    make_chunk_runner,
    MR2T2,
    ChainState,
    _update_adaptive,
    adaption_block_mask,
    adaptive_propose,
)
from .model import FitModel


@dataclasses.dataclass(frozen=True)
class DelayedConfig(MCMCConfig):
    decay_rate: float = 0.1
    max_rejections: int = 1
    initial_scale: float = 1.0
    delay_probability: float = 1.0


def make_delayed_step_fn_args(config: DelayedConfig):
    """``step(model, state)`` with the model as a traced pytree argument
    (keeps GB-scale tables out of compiled-program constants; see
    ``mcmc.make_step_fn_args``)."""

    def _scaled_propose(model, theta, key, scale):
        """Blockwise proposal with a global extra scale factor."""
        keys = jax.random.split(key, len(model.priors))
        parts = []
        from ..params.state import circular_wrap

        for prior, (start, size), k in zip(model.priors, model.slices, keys):
            cur = jax.lax.dynamic_slice(theta, (start,), (size,))
            kn, kf = jax.random.split(k)
            # z follows the throw-factor columns (rectangular under PCA).
            z = jax.random.normal(kn, (prior.chol.shape[1],), ATYPE)
            prop = cur + (prior.chol @ z) * prior.step_scale * scale
            wrapped = circular_wrap(prop, prior.circ_low, prior.circ_high)
            prop = jnp.where(prior.circ_mask & ~prior.fixed, wrapped, prop)
            do_flip = jax.random.uniform(kf, (size,)) < 0.5
            flipped = 2.0 * prior.flip_point - prop
            prop = jnp.where(prior.flip_mask & ~prior.fixed & do_flip, flipped, prop)
            parts.append(prop)
        return jnp.concatenate(parts)

    def step_fn(model: FitModel, state: ChainState):
        block_mask = adaption_block_mask(model.n_params, config.adaption_blocks)

        def nll_fn(theta):
            return model.total_nll(theta)

        def scaled_propose(theta, key, scale):
            return _scaled_propose(model, theta, key, scale)

        key = state.key
        n_chains = state.theta.shape[0]

        theta0 = state.theta  # restore point on total rejection
        nll0 = state.nll

        # Per-chain cascade state
        base = state.theta  # proposal origin (leapfrogs through rejections)
        accepted = jnp.zeros((n_chains,), bool)
        theta_acc = theta0
        nll_acc = nll0
        min_nll = jnp.full((n_chains,), LARGE_LOGL, ATYPE)
        delayed_accept = jnp.zeros((n_chains,), bool)
        first_acc_prob = jnp.zeros((n_chains,), ATYPE)

        scale = config.initial_scale
        for attempt in range(config.max_rejections + 1):
            key, k_prop, k_u, k_delay = jax.random.split(key, 4)
            if state.adaptive is not None:
                # Throw from the ADAPTED matrix — the reference keeps
                # adaptation in the parameter handler so delayed rejection
                # uses it too (``ParameterHandlerBase.cpp:652-684``).
                proposed = adaptive_propose(
                    model._flat(), state.adaptive, base, k_prop, extra_scale=scale
                )
            else:
                prop_keys = jax.random.split(k_prop, n_chains)
                proposed = jax.vmap(lambda t, k: scaled_propose(t, k, scale))(
                    base, prop_keys
                )
            nll_prop = jax.vmap(nll_fn)(proposed)
            oob = nll_prop >= LARGE_LOGL
            # Skip condition from the reference: OOB or worse than the best
            # rejected proposal so far.
            skip = oob | (nll_prop > min_nll)

            if attempt == 0:
                acc_prob = jnp.minimum(1.0, jnp.exp(jnp.minimum(nll0 - nll_prop, 0.0)))
                first_acc_prob = acc_prob
            else:
                # DRAM second-stage ratio (guarded like the reference).
                num = jnp.maximum(0.0, jnp.exp(min_nll - nll_prop) - 1.0)
                den = jnp.exp(min_nll - nll0) - 1.0
                standard = jnp.minimum(1.0, jnp.exp(jnp.minimum(nll0 - nll_prop, 0.0)))
                ratio = jnp.where(den <= 0.0, 1.0, jnp.minimum(num / jnp.where(den == 0, 1.0, den), 1.0))
                inf_guard = jnp.isinf(num) | jnp.isinf(den)
                acc_prob = jnp.where(inf_guard, standard, ratio)

            u = jax.random.uniform(k_u, (n_chains,), ATYPE)
            accept_now = (~accepted) & (~skip) & (u < acc_prob)
            theta_acc = jnp.where(accept_now[:, None], proposed, theta_acc)
            nll_acc = jnp.where(accept_now, nll_prop, nll_acc)
            delayed_accept = delayed_accept | (accept_now & (attempt > 0))
            accepted = accepted | accept_now

            # Probabilistic delay gate (documented semantics).
            if attempt < config.max_rejections:
                keep_delaying = (
                    jax.random.uniform(k_delay, (n_chains,), ATYPE)
                    < config.delay_probability
                )
                # Chains that stop delaying are frozen as rejected: mark
                # accepted-with-original to exclude further attempts.
                frozen = (~accepted) & (~keep_delaying)
                accepted = accepted | frozen
            # Leapfrog: next attempt proposes from this proposal.
            base = jnp.where(accepted[:, None], base, proposed)
            min_nll = jnp.where(accepted, min_nll, jnp.minimum(min_nll, nll_prop))
            scale = scale * config.decay_rate

        new_step = state.step + 1
        adaptive = state.adaptive
        if adaptive is not None:
            # Moments/RM-scale update from the step's OUTCOME, exactly as the
            # plain MR2T2 post-step does (``MCMCBase::PostStepProcess``).
            adaptive = _update_adaptive(
                adaptive, theta_acc, new_step, config, first_acc_prob, block_mask
            )

        out_state = ChainState(
            theta=theta_acc,
            nll=nll_acc,
            key=key,
            step=new_step,
            n_accepted=state.n_accepted
            + (jnp.any(theta_acc != theta0, axis=1)).astype(jnp.int32),
            adaptive=adaptive,
        )
        outputs = {
            "theta": theta_acc,
            "nll": nll_acc,
            "acc_prob": first_acc_prob,
            "accepted": jnp.any(theta_acc != theta0, axis=1),
            "delayed_accept": delayed_accept,
        }
        return out_state, outputs

    return step_fn


def make_delayed_step_fn(model: FitModel, config: DelayedConfig):
    """Convenience closure form (tests/small models)."""
    inner = make_delayed_step_fn_args(config)

    def step_fn(state: ChainState):
        return inner(model, state)

    return step_fn


class DelayedMR2T2(MR2T2):
    """Chunked driver reusing the MR2T2 harness with the delayed step."""

    def __init__(self, model: FitModel, config: DelayedConfig, init_theta: np.ndarray, seed: int = 0):
        # Initialise the plain driver then swap in the delayed step.
        super().__init__(model, config, init_theta, seed)
        step_fn = make_delayed_step_fn_args(config)

        def run_chunk(mdl: FitModel, state: ChainState, n_steps: int):
            return jax.lax.scan(
                lambda s, _: step_fn(mdl, s), state, None, length=n_steps
            )

        self._run_chunk = make_chunk_runner(run_chunk, model)
