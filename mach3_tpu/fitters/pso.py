"""Particle swarm optimisation over the chi2 surface.

TPU-native equivalent of ``Fitters/PSO.cpp`` (particle class with
position/velocity/personal best, ``PSO.h:17-69``): the whole swarm is two
arrays and the update loop is a ``lax.scan`` — every particle's chi2 is one
row of a vmapped likelihood evaluation (the reference evaluates particles
serially).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..core.logging import get_logger
from ..core.precision import ATYPE
from .minimize import _chi2_fn, bounds_of
from .model import FitModel

_log = get_logger("pso")


@dataclasses.dataclass(frozen=True)
class PSOConfig:
    n_particles: int = 64
    n_iterations: int = 500
    inertia: float = 0.72
    cognitive: float = 1.49  # c1: pull to personal best
    social: float = 1.49  # c2: pull to global best
    init_spread: float = 1.0  # initial scatter in units of prior sigma


@dataclasses.dataclass
class PSOResult:
    x: np.ndarray
    chi2: float
    history: np.ndarray  # [iters] best chi2 per iteration


def run_pso(
    model: FitModel, config: PSOConfig = PSOConfig(), seed: int = 0
) -> PSOResult:
    from .minimize import _chi2_of

    # Model as a jit argument (buffers, not HLO constants).
    chi2_batch_m = jax.jit(
        lambda m, x: jax.vmap(lambda xx: _chi2_of(m, xx))(x)
    )
    chi2_batch = lambda x: chi2_batch_m(model, x)
    bounds = np.asarray(bounds_of(model))
    lo = jnp.asarray(bounds[:, 0], ATYPE)
    hi = jnp.asarray(bounds[:, 1], ATYPE)

    key = jax.random.key(seed)
    k_init, k_vel, k_run = jax.random.split(key, 3)
    prefit = model.prefit_vector()
    # Initial scatter by prior sigma
    sigma = []
    for prior in model.priors:
        cov = np.asarray(prior.chol) @ np.asarray(prior.chol).T
        sigma.append(np.sqrt(np.diag(cov)))
    sigma = jnp.asarray(np.concatenate(sigma), ATYPE)

    n, p = config.n_particles, model.n_params
    x0 = prefit[None, :] + config.init_spread * sigma[None, :] * jax.random.normal(
        k_init, (n, p), ATYPE
    )
    x0 = jnp.clip(x0, lo, hi)
    v0 = 0.1 * sigma[None, :] * jax.random.normal(k_vel, (n, p), ATYPE)

    f0 = chi2_batch(x0)

    def step(mdl, carry, k):
        x, v, pbest_x, pbest_f, gbest_x, gbest_f = carry
        k1, k2 = jax.random.split(k)
        r1 = jax.random.uniform(k1, (n, p), ATYPE)
        r2 = jax.random.uniform(k2, (n, p), ATYPE)
        v = (
            config.inertia * v
            + config.cognitive * r1 * (pbest_x - x)
            + config.social * r2 * (gbest_x[None, :] - x)
        )
        x = jnp.clip(x + v, lo, hi)
        f = jax.vmap(lambda xx: _chi2_of(mdl, xx))(x)
        better = f < pbest_f
        pbest_x = jnp.where(better[:, None], x, pbest_x)
        pbest_f = jnp.where(better, f, pbest_f)
        i_best = jnp.argmin(pbest_f)
        gbest_x = pbest_x[i_best]
        gbest_f = pbest_f[i_best]
        return (x, v, pbest_x, pbest_f, gbest_x, gbest_f), gbest_f

    i0 = jnp.argmin(f0)
    carry0 = (x0, v0, x0, f0, x0[i0], f0[i0])
    keys = jax.random.split(k_run, config.n_iterations)
    (x, v, pbx, pbf, gx, gf), hist = jax.jit(
        lambda m, c, ks: jax.lax.scan(lambda cc, kk: step(m, cc, kk), c, ks)
    )(model, carry0, keys)

    _log.info("PSO: chi2 %.4f after %d iterations", float(gf), config.n_iterations)
    return PSOResult(x=np.asarray(gx), chi2=float(gf), history=np.asarray(hist))
