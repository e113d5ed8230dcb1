"""High-precision special functions.

``jax.scipy.special.gammaln`` is only ~1e-7 accurate in places, while the
reference's IceCube test statistic uses ``lgammal`` (long double,
``Samples/SampleHandlerBase.cpp:147``). For exact LLH parity we provide a
float64 Lanczos log-gamma (g = 7, 9 coefficients — the standard public-domain
Lanczos approximation, ~1e-13 relative accuracy for positive arguments).
"""
from __future__ import annotations

import jax.numpy as jnp

# Standard Lanczos (g=7, n=9) coefficients (Numerical Recipes / Boost lineage).
_LANCZOS_G = 7.0
_LANCZOS_COEF = (
    0.99999999999980993,
    676.5203681218851,
    -1259.1392167224028,
    771.32342877765313,
    -176.61502916214059,
    12.507343278686905,
    -0.13857109526572012,
    9.9843695780195716e-6,
    1.5056327351493116e-7,
)

_HALF_LOG_2PI = 0.9189385332046727417803297364  # 0.5*log(2*pi)


def gammaln(z: jnp.ndarray) -> jnp.ndarray:
    """log|Gamma(z)| for z > 0, float64, ~1e-13 relative accuracy."""
    z = jnp.asarray(z, jnp.float64)
    zm1 = z - 1.0
    series = jnp.full_like(z, _LANCZOS_COEF[0])
    for i, c in enumerate(_LANCZOS_COEF[1:], start=1):
        series = series + c / (zm1 + i)
    t = zm1 + _LANCZOS_G + 0.5
    return _HALF_LOG_2PI + (zm1 + 0.5) * jnp.log(t) - t + jnp.log(series)
