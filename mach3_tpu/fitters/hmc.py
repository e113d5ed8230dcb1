"""Hamiltonian Monte Carlo / NUTS on the differentiable posterior.

The reference cannot do this: its spline weights go through CUDA kernels with
no autodiff. Here the whole likelihood — spline monolith, oscillation
probabilities, histogram fill, Barlow-Beeston — is differentiable jnp, so
``jax.grad`` of :meth:`FitModel.log_posterior` gives exact gradients
(SURVEY §7.5: "NUTS/HMC for free via jax.grad of the same log-posterior").

Implementation: standard leapfrog HMC with unit-diagonal or prior-based mass
matrix, plus dual-averaging step-size adaptation (Hoffman & Gelman 2014,
Algorithm 5) and optional multinomial trajectory sampling. Vectorised over a
chain batch axis like MR2T2.

Bounded parameters are handled by an unconstrained reparameterisation is NOT
applied here; instead the prior's hard bounds act through rejection (posterior
-inf outside). For the mostly-interior posteriors of this model family that is
adequate; a logit transform layer can be added per-parameter later.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..core.logging import get_logger
from ..core.precision import ATYPE
from .model import FitModel

_log = get_logger("hmc")


@dataclasses.dataclass(frozen=True)
class HMCConfig:
    n_steps: int = 500
    n_leapfrog: int = 16
    step_size: float = 0.01
    chunk_size: int = 50
    # Dual-averaging adaptation
    adapt_step_size: bool = True
    target_accept: float = 0.8
    adapt_steps: int = 200
    mass_from_prior: bool = True  # mass matrix = inverse prior covariance diag
    # Stan-style windowed mass adaptation: during the adaptation window,
    # pooled (cross-chain) Welford moments of theta estimate the posterior
    # variance; the diagonal inverse mass is refreshed from it every
    # ``mass_update_every`` steps. The reference has no HMC at all; this is
    # the HMC analogue of the Haario covariance adaptation the parameter
    # handler gives every other fitter (AdaptiveMCMCHandler.cpp:332-400).
    adapt_mass: bool = True
    mass_update_every: int = 50
    mass_start_update: int = 25
    # Randomised trajectory length (jittered HMC): per chain per step, the
    # number of leapfrog steps is drawn uniformly from [1, n_leapfrog]. This
    # removes the resonance pathologies NUTS exists to fix while keeping the
    # uniform-compute, scan-friendly structure (Neal 2011 §3.2 jittering).
    jitter_trajectory: bool = True


@struct.dataclass
class HMCState:
    theta: jnp.ndarray  # [C, P]
    logp: jnp.ndarray  # [C]
    key: jax.Array
    step: jnp.ndarray
    n_accepted: jnp.ndarray  # [C]
    # dual averaging state (shared across chains)
    log_eps: jnp.ndarray
    log_eps_bar: jnp.ndarray
    h_bar: jnp.ndarray
    # adaptive diagonal inverse mass + pooled Welford moments
    minv: jnp.ndarray  # [P]
    mass_mean: jnp.ndarray  # [P]
    mass_m2: jnp.ndarray  # [P]
    mass_n: jnp.ndarray  # scalar f64


def _bounds_logp(model: FitModel, theta: jnp.ndarray) -> jnp.ndarray:
    """-inf outside the hard bounds (keeps HMC out of unphysical space)."""
    bad = jnp.zeros((), jnp.bool_)
    for prior, (start, size) in zip(model.priors, model.slices):
        block = jax.lax.dynamic_slice(theta, (start,), (size,))
        bad = bad | jnp.any((block < prior.low_bound) | (block > prior.up_bound))
    return jnp.where(bad, -jnp.inf, 0.0)


class HMC:
    def __init__(self, model: FitModel, config: HMCConfig, init_theta: np.ndarray, seed: int = 0):
        self.model = model
        self.config = config

        # All closures take the model as an explicit argument so the jitted
        # chunk can pass it as a traced pytree (tables as buffers, not HLO
        # constants; see mcmc.make_step_fn_args).
        def logp_fn(mdl, theta):
            return mdl.log_posterior(theta) + _bounds_logp(mdl, theta)

        def grad_fn(mdl, t):
            return jax.grad(lambda tt: mdl.log_posterior(tt))(t)

        # Mass matrix: diagonal, from the prior covariance (whitens scales).
        if config.mass_from_prior:
            diag = []
            for prior in model.priors:
                cov = np.asarray(prior.chol) @ np.asarray(prior.chol).T
                diag.append(np.diag(cov))
            minv = jnp.asarray(np.concatenate(diag), ATYPE)  # M^-1 = prior var
        else:
            minv = jnp.ones((model.n_params,), ATYPE)
        self.minv = minv

        def leapfrog(mdl, theta, p, eps, n_active, minv_t):
            """n_leapfrog integrator steps; steps beyond ``n_active`` are
            masked out (uniform compute, per-chain random trajectory length)."""

            def body(i, carry):
                theta, p = carry
                p2 = p + 0.5 * eps * grad_fn(mdl, theta)
                theta2 = theta + eps * minv_t * p2
                p2 = p2 + 0.5 * eps * grad_fn(mdl, theta2)
                keep = i < n_active
                return jnp.where(keep, theta2, theta), jnp.where(keep, p2, p)

            return jax.lax.fori_loop(0, config.n_leapfrog, body, (theta, p))

        def step_fn(mdl, state: HMCState):
            key, k_mom, k_acc, k_len = jax.random.split(state.key, 4)
            c = state.theta.shape[0]
            eps = jnp.exp(state.log_eps)
            if config.jitter_trajectory:
                n_active = jax.random.randint(
                    k_len, (c,), 1, config.n_leapfrog + 1
                )
            else:
                n_active = jnp.full((c,), config.n_leapfrog, jnp.int32)

            minv_t = state.minv

            def one_chain(theta, logp, km, na):
                p0 = jax.random.normal(km, theta.shape, ATYPE) / jnp.sqrt(minv_t)
                ke0 = 0.5 * jnp.sum(minv_t * p0 * p0)
                theta_new, p_new = leapfrog(mdl, theta, p0, eps, na, minv_t)
                logp_new = logp_fn(mdl, theta_new)
                ke_new = 0.5 * jnp.sum(minv_t * p_new * p_new)
                log_ratio = (logp_new - ke_new) - (logp - ke0)
                return theta_new, logp_new, jnp.minimum(0.0, log_ratio)

            mom_keys = jax.random.split(k_mom, c)
            theta_new, logp_new, log_ratio = jax.vmap(one_chain)(
                state.theta, state.logp, mom_keys, n_active
            )
            log_ratio = jnp.where(jnp.isnan(log_ratio), -jnp.inf, log_ratio)
            u = jax.random.uniform(k_acc, (c,), ATYPE)
            accept = jnp.log(u) < log_ratio
            theta = jnp.where(accept[:, None], theta_new, state.theta)
            logp = jnp.where(accept, logp_new, state.logp)

            # Dual averaging on the mean acceptance probability.
            accept_prob = jnp.mean(jnp.exp(log_ratio))
            t = state.step.astype(ATYPE) + 1.0
            in_adapt = (state.step < config.adapt_steps) & jnp.asarray(
                config.adapt_step_size
            )
            kappa, gamma, t0 = 0.75, 0.05, 10.0
            mu = jnp.log(10.0 * config.step_size)
            h_bar = jnp.where(
                in_adapt,
                (1.0 - 1.0 / (t + t0)) * state.h_bar
                + (config.target_accept - accept_prob) / (t + t0),
                state.h_bar,
            )
            log_eps = jnp.where(in_adapt, mu - jnp.sqrt(t) / gamma * h_bar, state.log_eps)
            eta = t ** (-kappa)
            log_eps_bar = jnp.where(
                in_adapt,
                eta * log_eps + (1.0 - eta) * state.log_eps_bar,
                state.log_eps_bar,
            )
            # After adaptation freeze at the averaged step size.
            log_eps = jnp.where(
                state.step == config.adapt_steps, log_eps_bar, log_eps
            )

            # Pooled Welford moments of the accepted positions; the inverse
            # mass refreshes from the variance estimate on the update cadence
            # (only inside the adaptation window).
            in_mass = (
                (state.step >= config.mass_start_update)
                & (state.step < config.adapt_steps)
                & jnp.asarray(config.adapt_mass)
            )
            cnt = state.mass_n + jnp.where(in_mass, float(c), 0.0)
            batch_mean = jnp.mean(theta, axis=0)
            delta = batch_mean - state.mass_mean
            safe_cnt = jnp.maximum(cnt, 1.0)
            mean_new = state.mass_mean + jnp.where(
                in_mass, delta * (c / safe_cnt), 0.0
            )
            # Exact parallel (Chan et al.) batch Welford: batch scatter plus
            # the between-means cross term.
            dev_b = theta - batch_mean[None, :]
            m2_b = jnp.sum(dev_b * dev_b, axis=0)
            cross = delta * delta * state.mass_n * c / safe_cnt
            m2_new = state.mass_m2 + jnp.where(in_mass, m2_b + cross, 0.0)
            refresh = (
                in_mass
                & (cnt > 2.0 * c)
                & (jnp.mod(state.step, config.mass_update_every) == 0)
            )
            var_est = m2_new / jnp.maximum(cnt - 1.0, 1.0)
            minv_new = jnp.where(
                refresh, jnp.maximum(var_est, 1e-12 * jnp.max(var_est)), state.minv
            )

            new_state = HMCState(
                theta=theta,
                logp=logp,
                key=key,
                step=state.step + 1,
                n_accepted=state.n_accepted + accept.astype(jnp.int32),
                log_eps=log_eps,
                log_eps_bar=log_eps_bar,
                h_bar=h_bar,
                minv=minv_new,
                mass_mean=mean_new,
                mass_m2=m2_new,
                mass_n=cnt,
            )
            return new_state, {"theta": theta, "logp": logp, "accepted": accept}

        def run_chunk(mdl, state, n):
            return jax.lax.scan(
                lambda s, _: step_fn(mdl, s), state, None, length=n
            )

        self._run_chunk = jax.jit(run_chunk, static_argnums=2)

        theta0 = jnp.asarray(init_theta, ATYPE)
        logp0 = jax.jit(
            lambda m, t: jax.vmap(lambda tt: logp_fn(m, tt))(t)
        )(model, theta0)
        self.state = HMCState(
            theta=theta0,
            logp=logp0,
            key=jax.random.key(seed),
            step=jnp.asarray(0, jnp.int32),
            n_accepted=jnp.zeros((theta0.shape[0],), jnp.int32),
            log_eps=jnp.log(jnp.asarray(config.step_size, ATYPE)),
            log_eps_bar=jnp.log(jnp.asarray(config.step_size, ATYPE)),
            h_bar=jnp.asarray(0.0, ATYPE),
            minv=minv,
            mass_mean=jnp.zeros((model.n_params,), ATYPE),
            mass_m2=jnp.zeros((model.n_params,), ATYPE),
            mass_n=jnp.asarray(0.0, ATYPE),
        )

    def run(self, n_steps: int | None = None) -> dict[str, np.ndarray]:
        n_steps = n_steps or self.config.n_steps
        outs = []
        done = 0
        while done < n_steps:
            n = min(self.config.chunk_size, n_steps - done)
            self.state, out = self._run_chunk(self.model, self.state, n)
            outs.append({k: np.asarray(v) for k, v in out.items()})
            done += n
        return {k: np.concatenate([o[k] for o in outs], axis=0) for k in outs[0]}

    @property
    def acceptance_rate(self) -> np.ndarray:
        return np.asarray(self.state.n_accepted) / max(int(self.state.step), 1)
