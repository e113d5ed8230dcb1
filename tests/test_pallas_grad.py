"""Analytic VJP of the fused reweight kernel vs jax.grad of the XLA twin
(interpret mode on CPU). The differentiable fused path is what HMC/MALA/
ChEES/L-BFGS ride at scale (splines/pallas_grad.py)."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mach3_tpu.samples.binning import histogram
from mach3_tpu.splines import pallas_reweight as pr
from mach3_tpu.splines.monolith import SplineParamSpec, build_dense_table
from mach3_tpu.splines.pallas_grad import fused_reweight_diff


@pytest.fixture()
def interp(monkeypatch):
    from jax.experimental import pallas as pl

    orig = pl.pallas_call

    def patched(*args, **kwargs):
        kwargs.setdefault("interpret", True)
        return orig(*args, **kwargs)

    monkeypatch.setattr(pl, "pallas_call", patched)
    for fn in (
        pr.fused_reweight_histogram,
        pr.fused_reweight_histogram_shared,
        pr.fused_reweight_histogram_shifted,
    ):
        fn.clear_cache()
    yield
    for fn in (
        pr.fused_reweight_histogram,
        pr.fused_reweight_histogram_shared,
        pr.fused_reweight_histogram_shifted,
    ):
        fn.clear_cache()


def _setup(n_events=300, n_chains=5, n_bins=13, n_params=3, seed=0,
           zero_param=None):
    """Random dense table + base weights. zero_param: force that parameter's
    coefficients to all-zeros so its response is EXACTLY 0 for every event
    (exercises the zero-counting exclusion product)."""
    rng = np.random.default_rng(seed)
    specs = []
    for p in range(n_params):
        y = 1.0 + 0.1 * rng.normal(size=(n_events, 5)).cumsum(axis=1)
        if zero_param == p:
            y = np.zeros_like(y)
        specs.append(
            SplineParamSpec(
                name=f"p{p}",
                param_index=p,
                x_knots=np.array([-2.0, -1.0, 0.0, 1.0, 2.0]),
                event_ids=np.arange(n_events),
                y_knots=y,
            )
        )
    table = build_dense_table(specs, n_events)
    base_w = jnp.asarray(rng.random((n_chains, n_events)), jnp.float32)
    params = jnp.asarray(0.3 * rng.normal(size=(n_chains, n_params + 1)))
    gmc = jnp.asarray(rng.normal(size=(n_chains, n_bins)), jnp.float32)
    gw2 = jnp.asarray(rng.normal(size=(n_chains, n_bins)), jnp.float32)
    return table, base_w, params, gmc, gw2


def _xla_loss(selector, base_w, coeffs, bins, n_bins, gmc, gw2, shared):
    """Reference loss: <g_mc, mc> + <g_w2, w2> through the pure-XLA program
    (its jax.grad is the ground truth for the hand-written backward).

    Responses in DEVIATION form (resp = 1 + sel @ (co − I)) matching the r5
    kernels: as a function of the SELECTOR this differs from sel @ co by the
    I term (they agree in value and in theta-gradient for valid one-hot
    selectors, where sel @ I ≡ 1), so the selector-cotangent comparison
    needs the same functional form."""
    k4 = coeffs.shape[1]
    iota = jax.lax.broadcasted_iota(jnp.int32, (k4, 1), 0)
    ident = (jnp.bitwise_and(iota, jnp.int32(3)) == 0).astype(coeffs.dtype)
    sel_r = selector.astype(jnp.bfloat16).astype(jnp.float32)
    dev_r = (coeffs - ident[None]).astype(jnp.bfloat16).astype(jnp.float32)
    resp = 1.0 + jnp.einsum(
        "cpk,pke->cpe", sel_r, dev_r, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    w = base_w * jnp.prod(resp, axis=1)  # [C, E]
    b = jnp.broadcast_to(bins[None, :], w.shape) if shared else bins

    def hist_one(wc, bc):
        mc, w2 = histogram(wc, bc, n_bins)
        return mc, w2

    mc, w2 = jax.vmap(hist_one)(w, b)
    return jnp.sum(gmc * mc) + jnp.sum(gw2 * w2)


def _fused_loss(selector, base_w, coeffs, bins, static, gmc, gw2):
    mc, w2 = fused_reweight_diff(static, selector, coeffs, base_w, bins)
    return jnp.sum(gmc * mc) + jnp.sum(gw2 * w2)


@pytest.mark.parametrize("shared", [True, False])
def test_value_and_grad_parity(interp, shared):
    n_bins = 13
    table, base_w, params, gmc, gw2 = _setup(n_bins=n_bins)
    rng = np.random.default_rng(1)
    selector = pr.spline_selector(table, params)
    coeffs = table.coeffs
    if shared:
        bins = jnp.asarray(rng.integers(0, n_bins + 1, base_w.shape[1]), jnp.int32)
        static = (n_bins, 4, 128, None, True)
    else:
        bins = jnp.asarray(
            rng.integers(0, n_bins + 1, base_w.shape), jnp.int32
        )
        static = (n_bins, 4, 128, None, False)

    f_fused = functools.partial(
        _fused_loss, coeffs=coeffs, bins=bins, static=static, gmc=gmc, gw2=gw2
    )
    f_xla = functools.partial(
        _xla_loss, coeffs=coeffs, bins=bins, n_bins=n_bins, gmc=gmc, gw2=gw2,
        shared=shared,
    )
    v_f = float(f_fused(selector, base_w))
    v_x = float(f_xla(selector, base_w))
    np.testing.assert_allclose(v_f, v_x, rtol=1e-4)

    gs_f, gb_f = jax.grad(f_fused, argnums=(0, 1))(selector, base_w)
    gs_x, gb_x = jax.grad(f_xla, argnums=(0, 1))(selector, base_w)
    np.testing.assert_allclose(np.asarray(gb_f), np.asarray(gb_x), rtol=5e-2,
                               atol=1e-2)  # two bf16 rounding schemes differ ~1-3% on small entries
    np.testing.assert_allclose(np.asarray(gs_f), np.asarray(gs_x), rtol=5e-2,
                               atol=1e-2)


def test_param_blocked_backward(interp):
    """Param-blocked variant (param_tile < P): the two-pass backward must
    stream coefficient tiles exactly like the forward."""
    n_bins = 9
    table, base_w, params, gmc, gw2 = _setup(n_params=7, n_bins=n_bins, seed=3)
    rng = np.random.default_rng(4)
    selector = pr.spline_selector(table, params)
    coeffs = table.coeffs
    bins = jnp.asarray(rng.integers(0, n_bins + 1, base_w.shape[1]), jnp.int32)
    static = (n_bins, 4, 128, 3, True)  # param_tile=3 < P=7 (pads to 9)

    f_fused = functools.partial(
        _fused_loss, coeffs=coeffs, bins=bins, static=static, gmc=gmc, gw2=gw2
    )
    f_xla = functools.partial(
        _xla_loss, coeffs=coeffs, bins=bins, n_bins=n_bins, gmc=gmc, gw2=gw2,
        shared=True,
    )
    np.testing.assert_allclose(
        float(f_fused(selector, base_w)), float(f_xla(selector, base_w)),
        rtol=1e-4,  # bf16-dot vs round-trip-cast accumulation ordering
    )
    gs_f, gb_f = jax.grad(f_fused, argnums=(0, 1))(selector, base_w)
    gs_x, gb_x = jax.grad(f_xla, argnums=(0, 1))(selector, base_w)
    np.testing.assert_allclose(np.asarray(gb_f), np.asarray(gb_x), rtol=5e-2,
                               atol=1e-2)  # two bf16 rounding schemes differ ~1-3% on small entries
    np.testing.assert_allclose(np.asarray(gs_f), np.asarray(gs_x), rtol=5e-2,
                               atol=1e-2)


def test_zero_response_exclusion(interp):
    """One parameter's response is exactly 0 everywhere (all-zero
    COEFFICIENTS: in deviation form resp = 1 + sel @ (0 − I) = 0 exactly):
    all other params' selector grads must vanish while the zero param keeps
    the product of the others — the nz-counting factorisation, not a
    division blow-up. (A zeroed SELECTOR row — the old construction — now
    means IDENTITY response under the deviation form, the saner semantic.)"""
    n_bins = 9
    table, base_w, params, gmc, gw2 = _setup(n_params=3, n_bins=n_bins, seed=7)
    rng = np.random.default_rng(8)
    selector = pr.spline_selector(table, params)
    coeffs = table.coeffs.at[1].set(0.0)  # resp_1 == 0 exactly (dev = -I)
    bins = jnp.asarray(rng.integers(0, n_bins + 1, base_w.shape[1]), jnp.int32)
    static = (n_bins, 4, 128, None, True)

    f_fused = functools.partial(
        _fused_loss, coeffs=coeffs, bins=bins, static=static, gmc=gmc, gw2=gw2
    )
    f_xla = functools.partial(
        _xla_loss, coeffs=coeffs, bins=bins, n_bins=n_bins, gmc=gmc, gw2=gw2,
        shared=True,
    )
    gs_f, gb_f = jax.grad(f_fused, argnums=(0, 1))(selector, base_w)
    gs_x, gb_x = jax.grad(f_xla, argnums=(0, 1))(selector, base_w)
    assert np.all(np.isfinite(np.asarray(gs_f)))
    # base grad = G * prod(resp) = 0 since one factor is identically 0
    np.testing.assert_allclose(np.asarray(gb_f), 0.0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(gs_f), np.asarray(gs_x), rtol=5e-2,
                               atol=1e-2)
    # the zero param's own grad is the only nonzero block
    assert np.any(np.asarray(gs_f)[:, 1, :] != 0)
    np.testing.assert_allclose(np.asarray(gs_f)[:, 0, :], 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gs_f)[:, 2, :], 0.0, atol=1e-6)


def test_shifted_variant_grad_parity(interp):
    """The shifted-route diff path (in-kernel binning forward, mask-loop
    backward with XLA-precomputed bins) — incl. param blocking (P > tile)."""
    from mach3_tpu.splines.pallas_grad import fused_reweight_diff_shifted

    n_bins, n_axis_j, stride_j = 12, 4, 1
    edges = (0.5, 1.0, 1.5, 2.0, 2.5)
    table, base_w, params, gmc, gw2 = _setup(n_params=5, n_bins=n_bins, seed=21)
    rng = np.random.default_rng(22)
    selector = pr.spline_selector(table, params)
    coeffs = table.coeffs
    n_events = base_w.shape[1]
    x_nom = jnp.asarray(rng.uniform(0.2, 3.0, n_events), jnp.float32)
    static_base = jnp.asarray(
        rng.integers(0, n_bins // n_axis_j, n_events) * n_axis_j, jnp.int32
    )
    shift_vals = jnp.asarray(0.05 * rng.normal(size=base_w.shape[0]), jnp.float32)

    def shift_fn(v, x):
        return x * (1.0 + v)

    def _bins(sv):
        x = x_nom[None, :] * (1.0 + sv[:, None])  # [C, E]
        idx = jnp.full(x.shape, -1, jnp.int32)
        for e_k in edges:
            idx = idx + (x >= jnp.float32(e_k)).astype(jnp.int32)
        valid = (idx >= 0) & (idx < n_axis_j) & (static_base[None, :] >= 0)
        return jnp.where(
            valid, static_base[None, :] + idx * stride_j, jnp.int32(n_bins)
        )

    bins_xla = _bins(shift_vals)
    static = (n_bins, 4, 128, 2, shift_fn, edges, stride_j, n_axis_j)

    def f_fused(sel, bw):
        mc, w2 = fused_reweight_diff_shifted(
            static, sel, coeffs, bw, shift_vals, x_nom, static_base, bins_xla
        )
        return jnp.sum(gmc * mc) + jnp.sum(gw2 * w2)

    f_xla = functools.partial(
        _xla_loss, coeffs=coeffs, bins=bins_xla, n_bins=n_bins, gmc=gmc,
        gw2=gw2, shared=False,
    )
    np.testing.assert_allclose(
        float(f_fused(selector, base_w)), float(f_xla(selector, base_w)),
        rtol=1e-4,  # bf16-dot vs round-trip-cast accumulation ordering
    )
    gs_f, gb_f = jax.grad(f_fused, argnums=(0, 1))(selector, base_w)
    gs_x, gb_x = jax.grad(f_xla, argnums=(0, 1))(selector, base_w)
    np.testing.assert_allclose(np.asarray(gb_f), np.asarray(gb_x), rtol=5e-2,
                               atol=1e-2)  # two bf16 rounding schemes differ ~1-3% on small entries
    np.testing.assert_allclose(np.asarray(gs_f), np.asarray(gs_x), rtol=5e-2,
                               atol=1e-2)


@pytest.mark.slow
def test_sample_level_diff_path(interp):
    """End-to-end: SampleModel.log_likelihood_batch_diff (fused forward +
    analytic backward, per-chain-bins route on the toy's shifted samples)
    matches the XLA twin in value and gradient."""
    from mach3_tpu.tutorial.toy import build_toy

    toy = build_toy(n_events=600, seed=11, e_grid_size=30, use_pallas=True)
    s = toy.model.samples[0]
    assert s._diff_route() is not None
    theta0 = np.asarray(toy.model.prefit_vector())
    rng = np.random.default_rng(12)
    thetas = jnp.asarray(
        np.tile(theta0, (3, 1)) * (1 + 0.02 * rng.normal(size=(3, len(theta0))))
    )

    v_d = np.asarray(s.log_likelihood_batch_diff(thetas))
    v_x = np.asarray(s.log_likelihood_batch_xla(thetas))
    np.testing.assert_allclose(v_d, v_x, rtol=1e-5)

    g_d = np.asarray(
        jax.grad(lambda t: jnp.sum(s.log_likelihood_batch_diff(t)))(thetas)
    )
    g_x = np.asarray(
        jax.grad(lambda t: jnp.sum(s.log_likelihood_batch_xla(t)))(thetas)
    )
    assert np.all(np.isfinite(g_d))
    np.testing.assert_allclose(g_d, g_x, rtol=1e-2, atol=1e-3)


@pytest.mark.slow
def test_model_posterior_batch_uses_diff_path(interp):
    """log_posterior_batch (the HMC entry point) with fused samples still
    matches vmap(log_posterior) in value and gradient."""
    from mach3_tpu.tutorial.toy import build_toy

    toy = build_toy(n_events=500, seed=13, e_grid_size=30, use_pallas=True)
    theta0 = np.asarray(toy.model.prefit_vector())
    rng = np.random.default_rng(14)
    lo = np.concatenate([np.asarray(p.low_bound) for p in toy.model.priors])
    hi = np.concatenate([np.asarray(p.up_bound) for p in toy.model.priors])
    errs = 0.05 * (hi - lo)
    thetas = np.clip(
        np.tile(theta0, (4, 1)) + 0.02 * errs * rng.normal(size=(4, len(theta0))),
        lo + 1e-9, hi - 1e-9,
    )
    thetas = jnp.asarray(thetas)

    batched = np.asarray(toy.model.log_posterior_batch(thetas))
    looped = np.asarray(jax.vmap(toy.model.log_posterior)(thetas))
    np.testing.assert_allclose(batched, looped, rtol=1e-5)

    g_b = np.asarray(
        jax.grad(lambda t: jnp.sum(toy.model.log_posterior_batch(t)))(thetas)
    )
    g_l = np.asarray(jax.vmap(jax.grad(toy.model.log_posterior))(thetas))
    assert np.all(np.isfinite(g_b))
    np.testing.assert_allclose(g_b, g_l, rtol=1e-2, atol=1e-3)


def test_diff_shared_event_tile_vmem_guard():
    """Advisor r3 (medium): the shared-bins backward's in-kernel one-hot is
    [BP, ET] — the event tile must shrink as the bin count grows, and the
    route must be refused outright when even ET=256 cannot fit."""
    from mach3_tpu.samples.sample import SampleModel

    f = SampleModel._diff_shared_event_tile
    # Small bins with the routed large-fixture tiles: the tile stands.
    assert f(30, 64, 1024, 8, 20) == 1024
    # The proven-on-hardware config (atmo: 1000 bins, CT=64, ET=1024) stands.
    assert f(1000, 64, 1024, 8, 20) == 1024
    # ~1000 bins at the unrouted default ET=4096: one-hot alone is
    # 1152*4096*4 = 18 MB -> must shrink.
    et = f(1000, 64, 4096, 8, 20)
    assert et is not None and et < 4096
    bp = -(-(1000 + 1) // 128) * 128
    assert (bp * et + 2 * 64 * bp + 2 * 8 * 20 * et + 64 * 8 * 20
            + 10 * 64 * et) * 4 <= 12 * 2**20
    # Absurd bin counts: refuse (XLA fallback).
    assert f(200_000, 64, 4096, 8, 20) is None
