"""Prior/posterior predictive distributions and Bayesian p-values.

TPU-native equivalent of ``Fitters/PredictiveThrower.cpp`` and the p-value
machinery of ``Fitters/SampleSummary.cpp``: draw parameter sets from a chain
(or the prior), reweight every sample per toy, build predictive spectra, and
compute posterior-predictive p-values from the (LLH(data|toy),
LLH(fluctuation|toy)) comparison.

Where the reference loops toys serially (``ProduceToys``), every toy here is a
row of one vmapped reweight — the full predictive pass is a single jitted
call per chunk of toys.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..core.logging import get_logger
from ..core.precision import ATYPE
from ..fitters.model import FitModel
from ..samples.teststats import get_test_stat_fn

_log = get_logger("predictive")


@dataclasses.dataclass
class PredictiveResult:
    spectra: list[np.ndarray]  # per sample: [T, B] toy MC spectra
    fluctuated: list[np.ndarray]  # per sample: [T, B] Poisson-fluctuated draws
    llh_data: np.ndarray  # [T] -logL(data | toy)
    llh_draw: np.ndarray  # [T] -logL(fluctuated | toy)
    p_value: float  # P(llh_draw > llh_data)
    p_value_per_sample: np.ndarray  # [n_samples]

    def predictive_mean(self, sample: int) -> np.ndarray:
        return self.spectra[sample].mean(axis=0)

    def predictive_band(self, sample: int, quantiles=(0.16, 0.84)) -> np.ndarray:
        return np.quantile(self.spectra[sample], quantiles, axis=0)


def draw_parameter_sets(
    chain_theta: np.ndarray, n_toys: int, rng: np.random.Generator, burn_in: float = 0.2
) -> np.ndarray:
    """Sample toy parameter vectors from chain draws [S, C, P] (with burn-in),
    matching ``PredictiveThrower``'s random chain-entry draws."""
    s = chain_theta.shape[0]
    flat = chain_theta[int(burn_in * s) :].reshape(-1, chain_theta.shape[-1])
    idx = rng.integers(0, len(flat), size=n_toys)
    return flat[idx]


def run_predictive(
    model: FitModel,
    toys_theta: np.ndarray,
    seed: int = 0,
    chunk: int = 64,
) -> PredictiveResult:
    """Posterior- (or prior-) predictive analysis over toy parameter vectors."""
    n_toys = toys_theta.shape[0]
    key = jax.random.key(seed)

    def one_toy(theta, k):
        spectra = []
        fluct = []
        llh_data = jnp.zeros((), ATYPE)
        llh_draw = jnp.zeros((), ATYPE)
        per_sample_data = []
        per_sample_draw = []
        keys = jax.random.split(k, len(model.samples))
        for s, sk in zip(model.samples, keys):
            mc, w2 = s.reweight(theta)
            draw = jax.random.poisson(sk, jnp.maximum(mc, 0.0)).astype(ATYPE)
            stat = get_test_stat_fn(s.test_statistic)
            ld = jnp.sum(stat(s.data, mc.astype(ATYPE), w2.astype(ATYPE)))
            lf = jnp.sum(stat(draw, mc.astype(ATYPE), w2.astype(ATYPE)))
            spectra.append(mc)
            fluct.append(draw)
            per_sample_data.append(ld)
            per_sample_draw.append(lf)
            llh_data += ld
            llh_draw += lf
        return (
            tuple(spectra),
            tuple(fluct),
            llh_data,
            llh_draw,
            jnp.stack(per_sample_data),
            jnp.stack(per_sample_draw),
        )

    batched = jax.jit(jax.vmap(one_toy))
    all_spec = [[] for _ in model.samples]
    all_fluct = [[] for _ in model.samples]
    llh_data_parts, llh_draw_parts = [], []
    ps_data_parts, ps_draw_parts = [], []
    for at in range(0, n_toys, chunk):
        block = jnp.asarray(toys_theta[at : at + chunk], ATYPE)
        key, sub = jax.random.split(key)
        keys = jax.random.split(sub, block.shape[0])
        spec, fluct, ld, lf, psd, psf = batched(block, keys)
        for i in range(len(model.samples)):
            all_spec[i].append(np.asarray(spec[i]))
            all_fluct[i].append(np.asarray(fluct[i]))
        llh_data_parts.append(np.asarray(ld))
        llh_draw_parts.append(np.asarray(lf))
        ps_data_parts.append(np.asarray(psd))
        ps_draw_parts.append(np.asarray(psf))

    llh_data = np.concatenate(llh_data_parts)
    llh_draw = np.concatenate(llh_draw_parts)
    ps_data = np.concatenate(ps_data_parts)
    ps_draw = np.concatenate(ps_draw_parts)
    p_value = float(np.mean(llh_draw > llh_data))
    p_per_sample = (ps_draw > ps_data).mean(axis=0)
    _log.info("Predictive p-value: %.3f over %d toys", p_value, n_toys)
    return PredictiveResult(
        spectra=[np.concatenate(s) for s in all_spec],
        fluctuated=[np.concatenate(f) for f in all_fluct],
        llh_data=llh_data,
        llh_draw=llh_draw,
        p_value=p_value,
        p_value_per_sample=np.asarray(p_per_sample),
    )
