"""Affine-invariant ensemble sampler (Goodman & Weare stretch move).

A chain-ensemble capability beyond the reference (BASELINE.json's "ensemble
MR2T2" north star): walkers propose along directions defined by OTHER walkers,
making the sampler invariant to linear reparameterisation — no covariance
tuning at all. The two half-ensembles update alternately (the standard
parallel scheme), each half-update being one batched likelihood evaluation —
a perfect fit for the TPU chain axis.

Walker count must be >= 2 * n_params (and even).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..core.precision import ATYPE, LARGE_LOGL
from .mcmc import make_chunk_runner
from .model import FitModel


@dataclasses.dataclass(frozen=True)
class EnsembleConfig:
    n_steps: int = 1000
    chunk_size: int = 100
    stretch_a: float = 2.0  # stretch-move scale parameter


class EnsembleSampler:
    def __init__(
        self, model: FitModel, config: EnsembleConfig, init_theta: np.ndarray, seed: int = 0
    ):
        n_walkers, n_params = init_theta.shape
        if n_walkers % 2:
            raise ValueError("Walker count must be even")
        if n_walkers < 2 * n_params:
            raise ValueError(f"Need >= {2 * n_params} walkers for {n_params} params")
        self.model = model
        self.config = config
        half = n_walkers // 2
        a = config.stretch_a

        def half_update(mdl, theta_move, nll_move, theta_ref, key):
            """Stretch-move update of one half against the other."""
            k_z, k_pick, k_u = jax.random.split(key, 3)
            m = theta_move.shape[0]
            # z ~ g(z) ∝ 1/sqrt(z) on [1/a, a]
            u = jax.random.uniform(k_z, (m,), ATYPE)
            z = (u * (jnp.sqrt(a) - jnp.sqrt(1.0 / a)) + jnp.sqrt(1.0 / a)) ** 2
            pick = jax.random.randint(k_pick, (m,), 0, theta_ref.shape[0])
            anchor = theta_ref[pick]
            proposed = anchor + z[:, None] * (theta_move - anchor)
            nll_prop = mdl.total_nll_batch(proposed)
            # log acceptance: (d-1) log z + logp_prop - logp_curr
            log_acc = (n_params - 1.0) * jnp.log(z) - (nll_prop - nll_move)
            accept = (jnp.log(jax.random.uniform(k_u, (m,), ATYPE)) < log_acc) & (
                nll_prop < LARGE_LOGL
            )
            theta_new = jnp.where(accept[:, None], proposed, theta_move)
            nll_new = jnp.where(accept, nll_prop, nll_move)
            return theta_new, nll_new, accept

        def step(mdl, state, key):
            theta, nll, n_acc = state
            k1, k2 = jax.random.split(key)
            t0, n0, a0 = half_update(mdl, theta[:half], nll[:half], theta[half:], k1)
            t1, n1, a1 = half_update(mdl, theta[half:], nll[half:], t0, k2)
            theta = jnp.concatenate([t0, t1])
            nll = jnp.concatenate([n0, n1])
            n_acc = n_acc + jnp.concatenate([a0, a1]).astype(jnp.int32)
            return (theta, nll, n_acc), {"theta": theta, "nll": nll}

        # Model as a jit argument: tables ride as buffers, not HLO
        # constants (see mcmc.make_step_fn_args).
        def run_chunk(mdl, state, keys):
            return jax.lax.scan(lambda s, k: step(mdl, s, k), state, keys)

        self._run_chunk = make_chunk_runner(run_chunk, model, n_static=0)
        theta0 = jnp.asarray(init_theta, ATYPE)
        nll0 = jax.jit(lambda m, t: m.total_nll_batch(t))(model, theta0)
        self._state = (theta0, nll0, jnp.zeros((n_walkers,), jnp.int32))
        self._key = jax.random.key(seed)
        self._steps_done = 0

    def run(self, n_steps: int | None = None, callback=None) -> dict[str, np.ndarray]:
        n_steps = n_steps or self.config.n_steps
        outs = []
        done = 0
        while done < n_steps:
            n = min(self.config.chunk_size, n_steps - done)
            self._key, sub = jax.random.split(self._key)
            keys = jax.random.split(sub, n)
            self._state, out = self._run_chunk(self.model, self._state, keys)
            host = {k: np.asarray(v) for k, v in out.items()}
            outs.append(host)
            done += n
            if callback is not None:
                callback(done, self._state, host)
        self._steps_done += done
        return {k: np.concatenate([o[k] for o in outs], axis=0) for k in outs[0]}

    @property
    def acceptance_rate(self) -> np.ndarray:
        return np.asarray(self._state[2]) / max(self._steps_done, 1)
