"""Diagnostics: autocorrelation/ESS/R-hat/Geweke validated on synthetic chains
with known properties (reference: ``MCMCProcessor::DiagMCMC``, ``RHat.cpp``)."""
import numpy as np
import pytest

from mach3_tpu.diagnostics.autocorr import (
    autocorrelation_fft,
    batched_means,
    effective_sample_size,
    geweke,
    power_spectrum,
)
from mach3_tpu.diagnostics.processor import ChainProcessor
from mach3_tpu.diagnostics.rhat import StreamingRhat, folded_rhat, rhat, split_rhat


def _ar1(n, phi, size=1, seed=0):
    """AR(1) chain with known integrated autocorrelation time (1+phi)/(1-phi)."""
    rng = np.random.default_rng(seed)
    x = np.zeros((n, size))
    e = rng.normal(size=(n, size))
    for t in range(1, n):
        x[t] = phi * x[t - 1] + e[t]
    return x


def test_autocorrelation_of_ar1():
    phi = 0.8
    x = _ar1(200_000, phi)
    rho = np.asarray(autocorrelation_fft(x, max_lag=20))[:, 0]
    expected = phi ** np.arange(20)
    assert np.allclose(rho, expected, atol=0.03)


def test_ess_of_iid_is_n():
    x = np.random.default_rng(1).normal(size=(20_000, 3))
    ess = np.asarray(effective_sample_size(x))
    assert np.all(ess > 0.8 * 20_000)


def test_ess_of_correlated_chain():
    phi = 0.9  # tau = (1+phi)/(1-phi) = 19
    x = _ar1(100_000, phi, seed=2)
    ess = float(np.asarray(effective_sample_size(x))[0])
    assert ess == pytest.approx(100_000 / 19.0, rel=0.25)


def test_rhat_converged_vs_not():
    rng = np.random.default_rng(3)
    good = rng.normal(size=(5000, 4, 2))  # 4 chains same distribution
    r_good = np.asarray(rhat(good))
    assert np.all(r_good < 1.01)

    bad = good.copy()
    bad[:, 0, 0] += 5.0  # one chain offset in param 0
    r_bad = np.asarray(rhat(bad))
    assert r_bad[0] > 1.5
    assert r_bad[1] < 1.01


def test_split_rhat_detects_drift():
    rng = np.random.default_rng(4)
    s = 4000
    drift = np.linspace(0, 3, s)[:, None, None]
    chains = rng.normal(size=(s, 4, 1)) + drift  # all chains drift together
    plain = float(np.asarray(rhat(chains))[0])
    split = float(np.asarray(split_rhat(chains))[0])
    assert plain < 1.05  # plain R-hat is fooled (between-chain means agree)
    assert split > 1.15  # split catches the within-chain drift
    assert split > plain


def test_folded_rhat_detects_scale_mismatch():
    rng = np.random.default_rng(5)
    chains = rng.normal(size=(5000, 4, 1))
    chains[:, 0] *= 3.0  # same mean, wrong scale
    assert float(np.asarray(folded_rhat(chains))[0]) > 1.1
    assert float(np.asarray(split_rhat(chains))[0]) < 1.2


def test_streaming_rhat_matches_full():
    rng = np.random.default_rng(6)
    chains = rng.normal(size=(3000, 3, 2)) + np.array([0.0, 0.1, -0.1])[None, :, None]
    sr = StreamingRhat(2)
    for c in range(3):
        sr.add_chain(chains[:, c])
    full = np.asarray(rhat(chains))
    stream = sr.finalize()
    assert np.allclose(stream, full, rtol=1e-10)


def test_geweke_flags_nonstationarity():
    rng = np.random.default_rng(7)
    stat = rng.normal(size=(20_000, 1))
    z_stat = float(np.asarray(geweke(stat))[0])
    assert abs(z_stat) < 3.0
    burn = stat.copy()
    burn[:2000] += 4.0  # un-burned start
    z_burn = float(np.asarray(geweke(burn))[0])
    assert abs(z_burn) > 4.0


def test_batched_means_shape():
    x = np.random.default_rng(8).normal(size=(1000, 5))
    bm = np.asarray(batched_means(x, 10))
    assert bm.shape == (10, 5)
    assert np.allclose(bm.mean(axis=0), x[:1000].mean(axis=0), atol=1e-10)


def test_power_spectrum_white_noise_flat():
    x = np.random.default_rng(9).normal(size=(4096, 1))
    freqs, p = power_spectrum(x)
    lo = np.asarray(p)[: len(p) // 4].mean()
    hi = np.asarray(p)[-len(p) // 4 :].mean()
    assert lo == pytest.approx(hi, rel=0.2)


# ---------------------------------------------------------------- processor
def test_processor_summaries_gaussian():
    rng = np.random.default_rng(10)
    draws = rng.normal(loc=[1.0, -2.0], scale=[0.5, 2.0], size=(20_000, 2))
    proc = ChainProcessor(draws, names=["a", "b"], burn_in=0)
    s = proc.summary(0)
    assert s.arithmetic_mean == pytest.approx(1.0, abs=0.02)
    assert s.arithmetic_std == pytest.approx(0.5, rel=0.05)
    assert s.gaussian_mean == pytest.approx(1.0, abs=0.03)
    assert s.hpd_mode == pytest.approx(1.0, abs=0.1)
    assert s.median == pytest.approx(1.0, abs=0.02)
    lo, hi = proc.credible_interval(0)
    assert lo == pytest.approx(0.5, abs=0.08)
    assert hi == pytest.approx(1.5, abs=0.08)


def test_processor_covariance():
    rng = np.random.default_rng(11)
    cov = np.array([[1.0, 0.6], [0.6, 2.0]])
    draws = rng.multivariate_normal([0, 0], cov, size=30_000)
    proc = ChainProcessor(draws, burn_in=0)
    assert np.allclose(proc.covariance(), cov, atol=0.08)
    corr = proc.correlation()
    assert corr[0, 1] == pytest.approx(0.6 / np.sqrt(2.0), abs=0.03)


def test_processor_burn_in_and_reweight():
    rng = np.random.default_rng(12)
    draws = rng.normal(size=(10_000, 1))
    draws[:2000] += 10.0
    proc = ChainProcessor(draws, burn_in=0.2)
    assert proc.summary(0).arithmetic_mean == pytest.approx(0.0, abs=0.05)

    # reweight towards mean 1: w = exp(x - x^2/2 + ...) ~ N(1,1)/N(0,1)
    rw = proc.reweight(lambda t: t[0] - 0.5)
    m = (rw.flat[:, 0] * rw.weights).sum() / rw.weights.sum()
    assert m == pytest.approx(1.0, abs=0.1)


def test_bayes_factor_octant():
    rng = np.random.default_rng(13)
    draws = np.concatenate(
        [rng.normal(0.45, 0.02, (7000, 1)), rng.normal(0.55, 0.02, (3000, 1))]
    )
    proc = ChainProcessor(draws, burn_in=0)
    bf = proc.bayes_factor(0, (0.0, 0.5), (0.5, 1.0))
    assert bf == pytest.approx(7.0 / 3.0, rel=0.1)


def test_credible_region_2d_mass():
    rng = np.random.default_rng(14)
    draws = rng.multivariate_normal([0, 0], np.eye(2), size=50_000)
    proc = ChainProcessor(draws, burn_in=0)
    xc, yc, counts, level = proc.credible_region_2d(0, 1, mass=0.6827)
    enclosed = counts[counts >= level].sum() / counts.sum()
    assert enclosed == pytest.approx(0.6827, abs=0.04)


def test_gaussian_estimator_is_a_fit_not_moments():
    """On a skewed distribution the Gaussian FIT tracks the core; plain
    moments are dragged by the tail (reference TF1-gaus-fit semantics)."""
    rng = np.random.default_rng(8)
    # exponential-tailed: core N(0,1) plus a long right tail
    x = np.concatenate([rng.normal(0, 1, 80_000), rng.exponential(3.0, 20_000) + 1])
    counts, edges = np.histogram(x, bins=120)
    centers = 0.5 * (edges[1:] + edges[:-1])
    from mach3_tpu.diagnostics.processor import _gaussian_fit

    mu, sig = _gaussian_fit(centers, counts.astype(float))
    moment_mu = float(x.mean())
    assert abs(mu) < 0.35  # fit stays near the core
    assert abs(moment_mu) > 0.5  # moments do not
    assert 0.7 < sig < 1.6
