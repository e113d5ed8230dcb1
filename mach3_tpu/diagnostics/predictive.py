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
    # Per-bin Bayesian p-values (SampleSummary's bin-by-bin comparison,
    # ``Fitters/SampleSummary.h:23-80``): P(fluctuated >= data) per bin.
    p_value_per_bin: list[np.ndarray] | None = None  # per sample: [B]
    # By-mode predictive spectra (SampleSummary's by-mode breakdowns):
    # per sample [T, M+1, B] (last row = unknown/sentinel category).
    spectra_by_mode: list[np.ndarray] | None = None
    # SampleSummary's full fluctuated-throw battery
    # (``Fitters/SampleSummary.h:264-321`` branch inventory), per throw [T]:
    llh_fluctpred_vs_draw: np.ndarray | None = None  # Fluctuated Predictive vs Draw
    llh_data_vs_fluctdraw: np.ndarray | None = None  # Data vs Fluctuated Draw
    llh_fluctdata_vs_draw: np.ndarray | None = None  # Fluctuated Data vs Draw
    llh_fluctdraw_vs_pred: np.ndarray | None = None  # Fluctuated Draw vs Predictive
    llh_rate_data: np.ndarray | None = None  # rate-only: -logL(total rate)
    llh_rate_fluct: np.ndarray | None = None
    # p-values in both fluctuation directions + rate-only
    p_value_fluct_pred: float | None = None  # P(FluctPred-vs-Draw > Data-vs-Draw)
    p_value_fluct_data: float | None = None  # P(FluctData-vs-Draw > Data-vs-Draw)
    p_value_rate: float | None = None  # P(rate(FluctDraw) llh > rate(Data) llh)

    def predictive_mean(self, sample: int) -> np.ndarray:
        return self.spectra[sample].mean(axis=0)

    def predictive_band(self, sample: int, quantiles=(0.16, 0.84)) -> np.ndarray:
        return np.quantile(self.spectra[sample], quantiles, axis=0)

    def violin(self, sample: int, quantiles: np.ndarray | None = None) -> np.ndarray:
        """[Q, B] per-bin quantiles of the toy spectra — the reference's
        violin spectra (``SampleSummary``/``PredictiveThrower`` violins) in
        array form (each bin's column is the violin body)."""
        q = np.linspace(0.025, 0.975, 39) if quantiles is None else np.asarray(quantiles)
        return np.quantile(self.spectra[sample], q, axis=0)


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
    categories: list[np.ndarray] | None = None,
) -> PredictiveResult:
    """Posterior- (or prior-) predictive analysis over toy parameter vectors.

    ``categories`` optionally gives per-sample [E] int labels (e.g. analysis
    modes from ``core.modes``); when set, per-toy spectra are also broken down
    by category (the reference ``SampleSummary`` by-mode machinery). Labels
    must be in [0, M]; M is treated as the unknown sentinel.
    """
    n_toys = toys_theta.shape[0]
    key = jax.random.key(seed)

    cat_arrays = None
    if categories is not None:
        if len(categories) != len(model.samples):
            raise ValueError("categories must have one [E] array per sample")
        cat_arrays = [jnp.asarray(c, jnp.int32) for c in categories]
        n_cats = max(int(np.max(np.asarray(c))) for c in categories) + 1

    def one_toy(mdl, theta, k):
        spectra = []
        fluct = []
        w2s = []
        by_mode = []
        llh_data = jnp.zeros((), ATYPE)
        llh_draw = jnp.zeros((), ATYPE)
        per_sample_data = []
        per_sample_draw = []
        keys = jax.random.split(k, len(mdl.samples))
        for i, (s, sk) in enumerate(zip(mdl.samples, keys)):
            if cat_arrays is not None:
                from ..samples.binning import histogram as _hist

                w, bins = s.event_weights(theta)
                mc, w2 = _hist(w, bins, s.n_bins)
                # category-offset flat fill: bin + cat * (B+1); garbage bin
                # (index B) of every category is dropped by the reshape slice
                flat = bins + cat_arrays[i] * jnp.int32(s.n_bins + 1)
                per_cat = jax.ops.segment_sum(
                    w, flat, num_segments=n_cats * (s.n_bins + 1)
                ).reshape(n_cats, s.n_bins + 1)[:, : s.n_bins]
                by_mode.append(per_cat)
            else:
                mc, w2 = s.reweight(theta)
            draw = jax.random.poisson(sk, jnp.maximum(mc, 0.0)).astype(ATYPE)
            stat = get_test_stat_fn(s.test_statistic)
            ld = jnp.sum(stat(s.data, mc.astype(ATYPE), w2.astype(ATYPE)))
            lf = jnp.sum(stat(draw, mc.astype(ATYPE), w2.astype(ATYPE)))
            spectra.append(mc)
            fluct.append(draw)
            w2s.append(w2)
            per_sample_data.append(ld)
            per_sample_draw.append(lf)
            llh_data += ld
            llh_draw += lf
        return (
            tuple(spectra),
            tuple(fluct),
            tuple(w2s),
            llh_data,
            llh_draw,
            jnp.stack(per_sample_data),
            jnp.stack(per_sample_draw),
            tuple(by_mode),
        )

    # The model rides as a jit argument (buffers, not HLO constants — the
    # remote TPU compile service rejects constant-laden programs at scale).
    batched = jax.jit(
        lambda m, block, ks: jax.vmap(lambda t, k: one_toy(m, t, k))(block, ks)
    )
    all_spec = [[] for _ in model.samples]
    all_fluct = [[] for _ in model.samples]
    all_w2 = [[] for _ in model.samples]
    all_by_mode = [[] for _ in model.samples]
    llh_data_parts, llh_draw_parts = [], []
    ps_data_parts, ps_draw_parts = [], []
    for at in range(0, n_toys, chunk):
        block = jnp.asarray(toys_theta[at : at + chunk], ATYPE)
        key, sub = jax.random.split(key)
        keys = jax.random.split(sub, block.shape[0])
        spec, fluct, w2s, ld, lf, psd, psf, bym = batched(model, block, keys)
        for i in range(len(model.samples)):
            all_spec[i].append(np.asarray(spec[i]))
            all_fluct[i].append(np.asarray(fluct[i]))
            all_w2[i].append(np.asarray(w2s[i]))
            if cat_arrays is not None:
                all_by_mode[i].append(np.asarray(bym[i]))
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
    spectra = [np.concatenate(s) for s in all_spec]
    fluctuated = [np.concatenate(f) for f in all_fluct]
    # Bin-by-bin Bayesian p-value: the predictive distribution of the
    # fluctuated bin content vs the observed count (SampleSummary per-bin
    # comparison); 0.5-credit at equality keeps discrete counts unbiased.
    p_per_bin = [
        (f > np.asarray(s.data)[None, :]).mean(axis=0)
        + 0.5 * (f == np.asarray(s.data)[None, :]).mean(axis=0)
        for f, s in zip(fluctuated, model.samples)
    ]
    w2_arrays = [np.concatenate(w) for w in all_w2]

    # ---- SampleSummary fluctuated-throw battery (host-side second pass;
    # ``Fitters/SampleSummary.h:264-321``). "Predictive" = the mean toy
    # spectrum; fluctuations are Poisson draws of (Draw, Predictive, Data).
    npr = np.random.default_rng(seed + 1)
    l_fluctpred_draw = np.zeros(n_toys)
    l_data_fluctdraw = np.zeros(n_toys)
    l_fluctdata_draw = np.zeros(n_toys)
    l_fluctdraw_pred = np.zeros(n_toys)
    l_rate_data = np.zeros(n_toys)
    l_rate_fluct = np.zeros(n_toys)
    for i, s in enumerate(model.samples):
        stat = get_test_stat_fn(s.test_statistic)
        data = np.asarray(s.data)
        mc_t = spectra[i]  # [T, B]
        w2_t = w2_arrays[i]
        fl_t = fluctuated[i]
        pred = mc_t.mean(axis=0)  # predictive-mean spectrum [B]
        w2_pred = w2_t.mean(axis=0)
        fluct_pred = npr.poisson(np.maximum(pred, 0.0)[None, :].repeat(n_toys, 0))
        fluct_data = npr.poisson(np.maximum(data, 0.0)[None, :].repeat(n_toys, 0))
        arr = lambda f, d, m, w: np.asarray(
            jnp.sum(f(jnp.asarray(d, ATYPE), jnp.asarray(m, ATYPE), jnp.asarray(w, ATYPE)), axis=-1)
        )
        l_fluctpred_draw += arr(stat, fluct_pred, mc_t, w2_t)
        l_data_fluctdraw += arr(stat, data[None, :], fl_t, w2_t)
        l_fluctdata_draw += arr(stat, fluct_data, mc_t, w2_t)
        l_fluctdraw_pred += arr(stat, fl_t, pred[None, :], w2_pred[None, :])
        # rate-only comparison (SampleSummary's "using rate only" branches):
        # Stirling Poisson -logL of the TOTAL event count (the full
        # normalised form — comparisons mix different observed counts, so
        # the N-dependent terms must be kept)
        from ..samples.teststats import poisson_llh

        rate_mc = mc_t.sum(axis=1)
        rate_fl = fl_t.sum(axis=1)
        l_rate_data += np.asarray(
            poisson_llh(jnp.full(n_toys, data.sum()), jnp.asarray(rate_mc))
        )
        l_rate_fluct += np.asarray(
            poisson_llh(jnp.asarray(rate_fl, np.float64), jnp.asarray(rate_mc))
        )
    p_fluct_pred = float(np.mean(l_fluctpred_draw > llh_data))
    p_fluct_data = float(np.mean(l_fluctdata_draw > llh_data))
    p_rate = float(np.mean(l_rate_fluct > l_rate_data))

    return PredictiveResult(
        spectra=spectra,
        fluctuated=fluctuated,
        llh_data=llh_data,
        llh_draw=llh_draw,
        p_value=p_value,
        p_value_per_sample=np.asarray(p_per_sample),
        p_value_per_bin=p_per_bin,
        spectra_by_mode=(
            [np.concatenate(b) for b in all_by_mode] if cat_arrays is not None else None
        ),
        llh_fluctpred_vs_draw=l_fluctpred_draw,
        llh_data_vs_fluctdraw=l_data_fluctdraw,
        llh_fluctdata_vs_draw=l_fluctdata_draw,
        llh_fluctdraw_vs_pred=l_fluctdraw_pred,
        llh_rate_data=l_rate_data,
        llh_rate_fluct=l_rate_fluct,
        p_value_fluct_pred=p_fluct_pred,
        p_value_fluct_data=p_fluct_data,
        p_value_rate=p_rate,
    )
