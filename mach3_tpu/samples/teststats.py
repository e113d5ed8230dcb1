"""Binned test statistics (negative log-likelihood per bin).

TPU-native re-implementation of the reference's test-statistic library
(``Samples/SampleHandlerBase.h:95-187``, ``Samples/SampleHandlerBase.cpp:35-190``):
Poisson (Stirling), Barlow-Beeston-lite (Conway, arXiv:1103.0354 eq 10-11),
Dembinski-Abdelmotteleb (arXiv:2206.12346), IceCube (arXiv:1901.04645), Pearson.

All functions are *vectorised over bins* and branchless (``jnp.where`` instead of
the reference's scalar ``if`` cascades) so they fuse into a single VPU pass on
TPU; all edge-case semantics — the ``_LOW_MC_BOUND_`` clamping and the
``data == 0`` / ``w2 == 0`` fallbacks — match the reference exactly.

Everything here runs in float64: the input is a small per-bin array (1e3-1e4
elements) and the output feeds the Metropolis accept/reject decision, so the
cost is negligible and the precision matters (see ``core/precision.py``).
"""
from __future__ import annotations

import enum
from typing import Callable

import jax.numpy as jnp

from ..core.precision import ATYPE, LOW_MC_BOUND
from ..core.special import gammaln


class TestStatistic(enum.Enum):
    """Mirrors the reference ``TestStatistic`` enum (``Samples/SampleStructs.h:105-111``)."""

    POISSON = "Poisson"
    BARLOW_BEESTON = "BarlowBeeston"
    DEMBINSKI_ABDELMOTTELEB = "DembinskiAbdelmotteleb"
    ICECUBE = "IceCube"
    PEARSON = "Pearson"
    # Extension beyond the reference's five: fixed-variance (Neyman) Gaussian,
    # -logL = (d-mc)^2 / (2 max(d,1)). The variance does NOT depend on the
    # proposal, so a model linear in the parameters has an exactly Gaussian
    # posterior — the closed-form anchor of the posterior-parity regression
    # harness (tests/test_parity.py).
    GAUSSIAN = "Gaussian"


def _div_floor(num: jnp.ndarray, den: jnp.ndarray, floor: float = 1e-30) -> jnp.ndarray:
    """``num / max(den, floor)`` made AD-safe ON TPU.

    The naive composition NaNs under ``jax.grad`` at ``den == 0``: the max
    picks the constant floor (derivative 0) while ``d(num/x)/dx = -num/x²``
    overflows at the floor, and inf * 0 = NaN — which poisons the whole
    backward pass of every gradient sampler on any empty histogram bin.
    Where-SELECTING the branch keeps values identical and gives the floored
    branch an exactly-zero den-derivative (the correct one-sided limit).

    The floor MUST stay inside float32 RANGE and the fallback branch MUST be
    a multiplication: TPU float64 is emulated as a double-float pair of f32s
    with f32 exponent range, so a tiny-exponent literal silently becomes 0.0;
    ``num / floor`` becomes inf — whose where-masked cotangent is 0 · inf =
    NaN. This NaN'd every test-statistic gradient on real TPU hardware while
    passing bit-identically on CPU (true f64)."""
    ok = den > floor
    return jnp.where(ok, num / jnp.where(ok, den, 1.0), num * (1.0 / floor))


def _safe_sqrt(x: jnp.ndarray, floor: float = 1e-30) -> jnp.ndarray:
    """sqrt with a zero derivative at x <= floor (sqrt'(0) = inf under AD).
    Floor inside f32 range — see :func:`_div_floor` on TPU f64 emulation."""
    ok = x > floor
    return jnp.where(ok, jnp.sqrt(jnp.where(ok, x, 1.0)), 0.0)


def _safe_log_ratio(data: jnp.ndarray, mc: jnp.ndarray) -> jnp.ndarray:
    """data * log(data/mc), with the data==0 limit -> 0 and mc guarded."""
    tiny = jnp.asarray(1e-30, ATYPE)
    ratio = _div_floor(jnp.maximum(data, tiny), mc)
    return jnp.where(data > 0, data * jnp.log(ratio), 0.0)


def poisson_llh(data: jnp.ndarray, mc: jnp.ndarray) -> jnp.ndarray:
    """Poisson -LLH via Stirling (``SampleHandlerBase.cpp:17-31``).

    data==0 -> mc; mc below the low-MC bound evaluates at the bound when
    data is above it, and returns 0 when data <= bound and data >= mc.
    """
    data = jnp.asarray(data, ATYPE)
    mc = jnp.asarray(mc, ATYPE)
    low = jnp.asarray(LOW_MC_BOUND, ATYPE)

    general = mc - data + _safe_log_ratio(data, mc)
    at_bound = low - data + _safe_log_ratio(data, low)

    low_mc = jnp.where(data > low, at_bound, jnp.where(data >= mc, 0.0, general))
    return jnp.where(data == 0, mc, jnp.where(mc < low, low_mc, general))


def _low_mc_newmc(data: jnp.ndarray, mc: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Shared low-MC clamp of Barlow-Beeston-family stats.

    Returns (newmc, zero_mask): ``newmc`` is mc clamped to the bound when
    data is above it; ``zero_mask`` marks bins that short-circuit to 0
    (mc < bound and data <= bound and data >= mc).
    """
    low = jnp.asarray(LOW_MC_BOUND, ATYPE)
    is_low = mc < low
    newmc = jnp.where(is_low & (data > low), low, mc)
    zero_mask = is_low & (data <= low) & (data >= mc)
    return newmc, zero_mask


def barlow_beeston_llh(data: jnp.ndarray, mc: jnp.ndarray, w2: jnp.ndarray) -> jnp.ndarray:
    """Barlow-Beeston-lite with Conway's analytic beta (``SampleHandlerBase.cpp:45-90``)."""
    data = jnp.asarray(data, ATYPE)
    mc = jnp.asarray(mc, ATYPE)
    w2 = jnp.asarray(w2, ATYPE)

    newmc, zero_mask = _low_mc_newmc(data, mc)
    frac2 = _div_floor(w2, newmc * newmc)  # fractional^2
    temp = newmc * frac2 - 1.0
    temp2 = temp * temp + 4.0 * data * frac2
    beta = 0.5 * (-temp + _safe_sqrt(temp2))

    scaled = newmc * beta
    stat_data = scaled - data + _safe_log_ratio(data, scaled)
    stat = jnp.where(data > 0, stat_data, mc * beta)

    penalty = jnp.where(
        frac2 > 0, _div_floor((beta - 1.0) ** 2, 2.0 * frac2), 0.0
    )
    return jnp.where(zero_mask, 0.0, stat + penalty)


def dembinski_abdelmotteleb_llh(
    data: jnp.ndarray, mc: jnp.ndarray, w2: jnp.ndarray
) -> jnp.ndarray:
    """Dembinski-Abdelmotteleb stat (``SampleHandlerBase.cpp:92-130``, arXiv:2206.12346)."""
    data = jnp.asarray(data, ATYPE)
    mc = jnp.asarray(mc, ATYPE)
    w2 = jnp.asarray(w2, ATYPE)

    newmc, zero_mask = _low_mc_newmc(data, mc)
    k = _div_floor(newmc * newmc, w2)  # effective count
    beta = _div_floor(data + k, newmc + k)
    scaled = newmc * beta
    # k*beta - k + k*log(k/(k*beta)) == k*(beta - 1 - log(beta))
    # AD-safe log: beta==0 (empty bin) must not feed log(0)=-inf whose
    # where-masked cotangent is NaN; floor inside f32 range (TPU f64
    # emulation has f32 exponent range — see _div_floor)
    ok_b = beta > 1e-30
    penalty = k * (beta - 1.0 - jnp.where(ok_b, jnp.log(jnp.where(ok_b, beta, 1.0)), jnp.log(1e-30)))
    stat = jnp.where(data > 0, scaled - data + _safe_log_ratio(data, scaled), scaled)

    result = jnp.where(zero_mask, 0.0, stat + penalty)
    return jnp.where(w2 == 0, poisson_llh(data, mc), result)


def icecube_llh(data: jnp.ndarray, mc: jnp.ndarray, w2: jnp.ndarray) -> jnp.ndarray:
    """IceCube effective-count stat (``SampleHandlerBase.cpp:132-165``, arXiv:1901.04645 eq 3.16)."""
    data = jnp.asarray(data, ATYPE)
    mc = jnp.asarray(mc, ATYPE)
    w2 = jnp.asarray(w2, ATYPE)
    low = jnp.asarray(LOW_MC_BOUND, ATYPE)

    b = _div_floor(mc, w2)
    a = mc * b + 1.0
    safe_b = jnp.maximum(b, 1e-30)  # f32-range floor (TPU f64 emulation)
    stat = -(
        a * jnp.log(safe_b)
        + gammaln(data + a)
        - gammaln(data + 1.0)
        - (data + a) * jnp.log1p(b)
        - gammaln(a)
    )

    # Low-MC cap: when mc <= data, never exceed Poisson(data, bound); when
    # additionally data <= bound, return 0.
    poisson_low = poisson_llh(data, jnp.broadcast_to(low, data.shape))
    capped = jnp.where(stat > poisson_low, poisson_low, stat)
    stat = jnp.where(mc <= data, jnp.where(data <= low, 0.0, capped), stat)
    return jnp.where(w2 == 0, poisson_llh(data, mc), stat)


def pearson_llh(data: jnp.ndarray, mc: jnp.ndarray) -> jnp.ndarray:
    """Pearson chi2 / 2 (``SampleHandlerBase.cpp:167-183``)."""
    data = jnp.asarray(data, ATYPE)
    mc = jnp.asarray(mc, ATYPE)
    low = jnp.asarray(LOW_MC_BOUND, ATYPE)

    general = _div_floor((data - mc) ** 2, 2.0 * mc)
    at_bound = (data - low) ** 2 / (2.0 * low)
    low_mc = jnp.where(data > low, at_bound, jnp.where(data >= mc, 0.0, general))
    return jnp.where(data == 0, mc / 2.0, jnp.where(mc < low, low_mc, general))


def gaussian_llh(data: jnp.ndarray, mc: jnp.ndarray) -> jnp.ndarray:
    """Fixed-variance (Neyman) Gaussian: (d-mc)^2 / (2 max(d,1))."""
    data = jnp.asarray(data, ATYPE)
    mc = jnp.asarray(mc, ATYPE)
    return (data - mc) ** 2 / (2.0 * jnp.maximum(data, 1.0))


def get_test_stat_fn(
    stat: TestStatistic | str,
) -> Callable[[jnp.ndarray, jnp.ndarray, jnp.ndarray], jnp.ndarray]:
    """Return ``f(data, mc, w2) -> per-bin -LLH`` for the chosen statistic."""
    if isinstance(stat, str):
        stat = TestStatistic(stat)
    if stat is TestStatistic.POISSON:
        return lambda data, mc, w2: poisson_llh(data, mc)
    if stat is TestStatistic.BARLOW_BEESTON:
        return barlow_beeston_llh
    if stat is TestStatistic.DEMBINSKI_ABDELMOTTELEB:
        return dembinski_abdelmotteleb_llh
    if stat is TestStatistic.ICECUBE:
        return icecube_llh
    if stat is TestStatistic.PEARSON:
        return lambda data, mc, w2: pearson_llh(data, mc)
    if stat is TestStatistic.GAUSSIAN:
        return lambda data, mc, w2: gaussian_llh(data, mc)
    raise ValueError(f"Unknown test statistic: {stat}")
