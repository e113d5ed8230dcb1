"""Chain convergence diagnostics: autocorrelation, ESS, batched means, Geweke,
power spectrum, acceptance tracking.

TPU-native equivalent of the reference ``MCMCProcessor::DiagMCMC`` suite
(``Fitters/MCMCProcessor.cpp:3346-4472``) and the CUDA autocorrelation kernel
(``Fitters/gpuMCMCProcessorUtils.cu``: one thread per (param, lag)). Here every
diagnostic is a batched FFT / reduction over a chain array ``[S, C, P]`` or
``[S, P]`` — the lag loop the reference parallelises by hand is one
``jnp.fft`` convolution.

All functions accept numpy or jnp arrays; shapes are (steps, ..., params).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def autocorrelation_fft(chain: jnp.ndarray, max_lag: int | None = None) -> jnp.ndarray:
    """Normalised autocorrelation via FFT (``AutoCorrelation_FFT``,
    ``MCMCProcessor.cpp:3647``): chain [S, ...] -> rho [L, ...]."""
    chain = jnp.asarray(chain, jnp.float64)
    s = chain.shape[0]
    if max_lag is None:
        max_lag = min(s - 1, 1000)
    x = chain - jnp.mean(chain, axis=0, keepdims=True)
    nfft = 1 << int(np.ceil(np.log2(2 * s)))
    f = jnp.fft.rfft(x, n=nfft, axis=0)
    acf = jnp.fft.irfft(f * jnp.conj(f), n=nfft, axis=0)[:max_lag]
    return acf / jnp.maximum(acf[0:1], 1e-30)


def integrated_autocorr_time(rho: jnp.ndarray, c: float = 5.0) -> jnp.ndarray:
    """Sokal self-consistent window: tau = 1 + 2 sum rho, window M: M >= c*tau.

    rho: [L, ...] -> tau [...]. (The reference reports raw autocorrelation
    curves + ESS; Sokal windowing is the standard robust estimator.)
    """
    rho = jnp.asarray(rho)
    cum = 2.0 * jnp.cumsum(rho, axis=0) - 1.0  # tau estimate per window
    lags = jnp.arange(rho.shape[0], dtype=jnp.float64).reshape(
        (-1,) + (1,) * (rho.ndim - 1)
    )
    # first window where lag >= c * tau_window
    ok = lags >= c * cum
    first = jnp.argmax(ok, axis=0)
    never = ~jnp.any(ok, axis=0)
    first = jnp.where(never, rho.shape[0] - 1, first)
    return jnp.take_along_axis(cum, first[None, ...], axis=0)[0]


def effective_sample_size(chain: jnp.ndarray) -> jnp.ndarray:
    """ESS = S / tau per parameter (``CalculateESS``, ``MCMCProcessor.cpp:3949``).

    chain [S, ...] -> ess [...].
    """
    rho = autocorrelation_fft(chain)
    tau = integrated_autocorr_time(rho)
    return chain.shape[0] / jnp.maximum(tau, 1.0)


def batched_means(chain: jnp.ndarray, n_batches: int = 20) -> jnp.ndarray:
    """Batched means (``BatchedMeans``, ``MCMCProcessor.cpp:4047``):
    chain [S, ...] -> [n_batches, ...]."""
    chain = jnp.asarray(chain)
    s = chain.shape[0]
    usable = (s // n_batches) * n_batches
    return jnp.mean(
        chain[:usable].reshape((n_batches, usable // n_batches) + chain.shape[1:]), axis=1
    )


def batched_means_variance_ratio(chain: jnp.ndarray, n_batches: int = 20) -> jnp.ndarray:
    """Ratio of batch-mean variance to naive variance/S — ~1 for iid, >1 for
    correlated chains (the reference plots batched means for this purpose)."""
    bm = batched_means(chain, n_batches)
    s = chain.shape[0]
    var_bm = jnp.var(bm, axis=0, ddof=1) * (s // n_batches)
    var = jnp.var(chain, axis=0, ddof=1)
    return var_bm / jnp.maximum(var, 1e-30)


def geweke(chain: jnp.ndarray, first: float = 0.1, last: float = 0.5) -> jnp.ndarray:
    """Geweke z-score (``GewekeDiagnostic``, ``MCMCProcessor.cpp:4339``):
    compare means of the first 10% and last 50% of the chain, normalised by
    spectral std estimates. chain [S, ...] -> z [...]."""
    chain = jnp.asarray(chain, jnp.float64)
    s = chain.shape[0]
    a = chain[: int(first * s)]
    b = chain[int((1.0 - last) * s) :]

    def spectral_var(x):
        # variance inflated by the integrated autocorrelation time
        rho = autocorrelation_fft(x)
        tau = integrated_autocorr_time(rho)
        return jnp.var(x, axis=0, ddof=1) * tau / x.shape[0]

    return (jnp.mean(a, axis=0) - jnp.mean(b, axis=0)) / jnp.sqrt(
        jnp.maximum(spectral_var(a) + spectral_var(b), 1e-30)
    )


def power_spectrum(chain: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Chain power spectrum (``PowerSpectrumAnalysis``, ``MCMCProcessor.cpp:4219``):
    returns (frequencies [S//2], P(f) [S//2, ...])."""
    chain = jnp.asarray(chain, jnp.float64)
    s = chain.shape[0]
    x = chain - jnp.mean(chain, axis=0, keepdims=True)
    f = jnp.fft.rfft(x, axis=0)
    power = jnp.abs(f) ** 2 / s
    freqs = jnp.fft.rfftfreq(s)
    return freqs[1:], power[1:]


def acceptance_rate_trace(accepted: np.ndarray, window: int = 100) -> np.ndarray:
    """Windowed acceptance-rate trace (``AcceptanceProbabilities``,
    ``MCMCProcessor.cpp:4472``): accepted [S, ...] (0/1) -> [S//window, ...]."""
    accepted = np.asarray(accepted, np.float64)
    s = (accepted.shape[0] // window) * window
    return accepted[:s].reshape((-1, window) + accepted.shape[1:]).mean(axis=1)
