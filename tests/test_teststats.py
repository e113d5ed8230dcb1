"""Validate binned test statistics against scalar oracles of the reference
semantics (``Samples/SampleHandlerBase.cpp:17-190``) and closed-form limits."""
import math

import numpy as np
import pytest

from mach3_tpu.samples import teststats as ts

LOW = 1e-5


# --- scalar oracles implementing the reference control flow -----------------
def poisson_oracle(data, mc):
    if data == 0:
        return mc
    if mc < LOW:
        if data > LOW:
            return LOW - data + data * math.log(data / LOW)
        elif data >= mc:
            return 0.0
    return mc - data + data * math.log(data / mc)


def barlow_beeston_oracle(data, mc, w2):
    newmc = mc
    if mc < LOW:
        if data > LOW:
            newmc = LOW
        elif data >= mc:
            return 0.0
    fractional = math.sqrt(w2) / newmc
    f2 = fractional * fractional
    temp = newmc * f2 - 1
    temp2 = temp * temp + 4 * data * f2
    beta = (-temp + math.sqrt(temp2)) / 2.0
    stat = mc * beta
    if data > 0:
        newmc *= beta
        stat = newmc - data + data * math.log(data / newmc)
    penalty = (beta - 1) ** 2 / (2 * f2) if fractional > 0 else 0.0
    return stat + penalty


def dembinski_oracle(data, mc, w2):
    if w2 == 0:
        return poisson_oracle(data, mc)
    newmc = mc
    if mc < LOW:
        if data > LOW:
            newmc = LOW
        elif data >= mc:
            return 0.0
    k = newmc * newmc / w2
    beta = (data + k) / (newmc + k)
    newmc *= beta
    penalty = k * beta - k + k * math.log(k / (k * beta))
    stat = newmc
    if data > 0:
        stat = newmc - data + data * math.log(data / newmc)
    return stat + penalty


def icecube_oracle(data, mc, w2):
    if w2 == 0:
        return poisson_oracle(data, mc)
    b = mc / w2
    a = mc * b + 1
    stat = -(
        a * math.log(b)
        + math.lgamma(data + a)
        - math.lgamma(data + 1)
        - (data + a) * math.log1p(b)
        - math.lgamma(a)
    )
    if mc <= data:
        if data <= LOW:
            return 0.0
        poisson = poisson_oracle(data, LOW)
        if stat > poisson:
            return poisson
    return stat


def pearson_oracle(data, mc):
    if data == 0:
        return mc / 2.0
    if mc < LOW:
        if data > LOW:
            return (data - LOW) ** 2 / (2.0 * LOW)
        elif data >= mc:
            return 0.0
    return (data - mc) ** 2 / (2 * mc)


CASES = [
    (0.0, 0.0, 0.0),
    (0.0, 5.0, 0.3),
    (3.0, 0.0, 0.0),
    (3.0, 1e-7, 1e-9),
    (1e-7, 1e-6, 1e-9),  # data < LOW, data < mc < LOW
    (1e-6, 1e-7, 1e-9),  # data < LOW, data >= mc
    (10.0, 10.0, 0.5),
    (10.0, 12.0, 1.2),
    (100.0, 90.0, 4.0),
    (5.0, 8.0, 0.0),  # w2 == 0 branches
    (2.5, 0.5, 0.25),
    (1000.0, 950.0, 30.0),
]


@pytest.mark.parametrize("data,mc,w2", CASES)
def test_poisson_matches_oracle(data, mc, w2):
    got = float(ts.poisson_llh(np.array([data]), np.array([mc]))[0])
    assert got == pytest.approx(poisson_oracle(data, mc), rel=1e-10, abs=1e-12)


@pytest.mark.parametrize("data,mc,w2", CASES)
def test_barlow_beeston_matches_oracle(data, mc, w2):
    got = float(ts.barlow_beeston_llh(np.array([data]), np.array([mc]), np.array([w2]))[0])
    assert got == pytest.approx(barlow_beeston_oracle(data, mc, w2), rel=1e-9, abs=1e-12)


@pytest.mark.parametrize("data,mc,w2", CASES)
def test_dembinski_matches_oracle(data, mc, w2):
    got = float(
        ts.dembinski_abdelmotteleb_llh(np.array([data]), np.array([mc]), np.array([w2]))[0]
    )
    assert got == pytest.approx(dembinski_oracle(data, mc, w2), rel=1e-9, abs=1e-12)


@pytest.mark.parametrize("data,mc,w2", CASES)
def test_icecube_matches_oracle(data, mc, w2):
    got = float(ts.icecube_llh(np.array([data]), np.array([mc]), np.array([w2]))[0])
    assert got == pytest.approx(icecube_oracle(data, mc, w2), rel=1e-8, abs=1e-10)


@pytest.mark.parametrize("data,mc,w2", CASES)
def test_pearson_matches_oracle(data, mc, w2):
    got = float(ts.pearson_llh(np.array([data]), np.array([mc]))[0])
    assert got == pytest.approx(pearson_oracle(data, mc), rel=1e-10, abs=1e-12)


def test_poisson_minimum_at_data_eq_mc():
    # -LLH is zero at data == mc and positive elsewhere
    assert float(ts.poisson_llh(np.array([7.0]), np.array([7.0]))[0]) == pytest.approx(0.0)
    assert float(ts.poisson_llh(np.array([7.0]), np.array([9.0]))[0]) > 0


def test_barlow_beeston_reduces_to_poisson_at_zero_w2():
    data, mc = np.array([11.0]), np.array([9.0])
    bb = ts.barlow_beeston_llh(data, mc, np.array([0.0]))
    po = ts.poisson_llh(data, mc)
    assert float(bb[0]) == pytest.approx(float(po[0]), rel=1e-9)


def test_vectorised_over_bins():
    rng = np.random.default_rng(0)
    data = rng.poisson(10.0, 256).astype(float)
    mc = rng.gamma(10.0, 1.0, 256)
    w2 = mc * 0.05
    vec = ts.barlow_beeston_llh(data, mc, w2)
    for i in range(0, 256, 37):
        assert float(vec[i]) == pytest.approx(
            barlow_beeston_oracle(data[i], mc[i], w2[i]), rel=1e-9
        )


def test_get_test_stat_fn_dispatch():
    data, mc, w2 = np.array([4.0]), np.array([5.0]), np.array([0.3])
    for stat in ts.TestStatistic:
        fn = ts.get_test_stat_fn(stat)
        val = float(fn(data, mc, w2)[0])
        assert np.isfinite(val)
    fn = ts.get_test_stat_fn("BarlowBeeston")
    assert float(fn(data, mc, w2)[0]) == pytest.approx(
        barlow_beeston_oracle(4.0, 5.0, 0.3), rel=1e-9
    )


def test_gradients_finite_at_edge_cases():
    """Every statistic must have finite (mc, w2) gradients at empty-MC /
    empty-data / zero-w2 bins: gradient samplers (HMC/MALA/ChEES) backprop
    through the per-bin stat, and one NaN cotangent in one bin poisons the
    whole step (the max+divide composition used to yield (-inf)*0 = NaN)."""
    import jax
    import jax.numpy as jnp

    data = jnp.asarray([0.0, 5.0, 0.0, 5.0, 3.0, 1e-6, 0.0])
    mc = jnp.asarray([0.0, 0.0, 4.0, 4.0, 1e-7, 1e-7, 1e-7])
    w2 = jnp.asarray([0.0, 0.0, 0.0, 0.4, 0.0, 1e-14, 1e-14])
    for stat in ts.TestStatistic:
        fn = ts.get_test_stat_fn(stat)
        val, (g_mc, g_w2) = jax.value_and_grad(
            lambda m, w: jnp.sum(fn(data, m, w)), argnums=(0, 1)
        )(mc, w2)
        assert np.isfinite(float(val)), stat
        assert np.all(np.isfinite(np.asarray(g_mc))), (stat, g_mc)
        assert np.all(np.isfinite(np.asarray(g_w2))), (stat, g_w2)


def test_stat_dtype_f32_matches_f64():
    """stat_dtype=float32 (low-memory policy: per-bin stat in hardware f32,
    f64 bin sum) must agree with the exact-f64 default to ~1e-5 absolute —
    the error budget that justifies turning it on for the bench fixtures."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mach3_tpu.tutorial.toy import build_toy

    toy = build_toy(n_events=3000, seed=11, e_grid_size=30, use_pallas=False)
    th = jnp.asarray(np.asarray(toy.model.prefit_vector()))[None, :] * 1.02
    for s in toy.model.samples:
        a = jax.jit(lambda m, t: m.log_likelihood_batch(t))(s, th)
        s32 = s.replace(stat_dtype=jnp.float32)
        b = jax.jit(lambda m, t: m.log_likelihood_batch(t))(s32, th)
        assert float(a[0]) != 0.0
        assert abs(float(a[0]) - float(b[0])) < 1e-4 * max(1.0, abs(float(a[0])))
