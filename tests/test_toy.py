"""End-to-end tutorial toy experiment tests: the reweight validations the
reference runs from MaCh3Tutorial (``--ReweightValidations``,
``--FitterValidations``; ``.github/workflows/CIValidations.yml``)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mach3_tpu.tutorial.toy import build_toy


@pytest.fixture(scope="module")
def toy():
    return build_toy(n_events=4000, seed=99, e_grid_size=80)


def test_asimov_likelihood_is_zero(toy):
    theta0 = toy.model.prefit_vector()
    nll = float(jax.jit(toy.model.total_nll)(theta0))
    assert nll == pytest.approx(0.0, abs=1e-8)


def test_nll_rises_away_from_prefit(toy):
    theta0 = np.asarray(toy.model.prefit_vector())
    nll0 = float(jax.jit(toy.model.total_nll)(jnp.asarray(theta0)))
    for i, delta in [(0, 0.3), (5, 1.0), (10, 0.1)]:
        th = theta0.copy()
        th[i] += delta
        nll = float(jax.jit(toy.model.total_nll)(jnp.asarray(th)))
        assert nll > nll0 + 0.1, f"param {i}"


def test_oscillation_parameters_matter(toy):
    """Changing sin2th23 changes the numu sample spectrum."""
    theta0 = np.asarray(toy.model.prefit_vector())
    i_th23 = toy.names.index("osc_sin2th23")
    th = theta0.copy()
    th[i_th23] = 0.40
    mc0, _ = jax.jit(toy.samples[0].reweight)(jnp.asarray(theta0))
    mc1, _ = jax.jit(toy.samples[0].reweight)(jnp.asarray(th))
    assert not np.allclose(np.asarray(mc0), np.asarray(mc1), rtol=1e-3)


def test_norm_param_scales_its_mode_only(toy):
    theta0 = np.asarray(toy.model.prefit_vector())
    i_nc = toy.names.index("xsec_norm_nc")
    th = theta0.copy()
    th[i_nc] = 2.0
    # NC only contaminates the nue sample; numu sample excludes NC
    mc_numu0, _ = jax.jit(toy.samples[0].reweight)(jnp.asarray(theta0))
    mc_numu1, _ = jax.jit(toy.samples[0].reweight)(jnp.asarray(th))
    assert np.allclose(np.asarray(mc_numu0), np.asarray(mc_numu1))
    mc_nue0, _ = jax.jit(toy.samples[1].reweight)(jnp.asarray(theta0))
    mc_nue1, _ = jax.jit(toy.samples[1].reweight)(jnp.asarray(th))
    assert float(mc_nue1.sum()) > float(mc_nue0.sum())


def test_spline_param_continuous_response(toy):
    theta0 = np.asarray(toy.model.prefit_vector())
    i_spl = toy.names.index("xsec_spl_maqe")
    totals = []
    for v in [-1.0, -0.5, 0.0, 0.5, 1.0]:
        th = theta0.copy()
        th[i_spl] = v
        mc, _ = jax.jit(toy.samples[0].reweight)(jnp.asarray(th))
        totals.append(float(mc.sum()))
    totals = np.asarray(totals)
    # monotone-ish smooth response through nominal; nominal equals Asimov total
    assert np.all(np.diff(totals) > 0)  # positive slope splines
    data_total = float(np.asarray(toy.samples[0].data).sum())
    assert totals[2] == pytest.approx(data_total, rel=1e-6)


def test_gradient_flows_through_posterior(toy):
    """log_posterior must be differentiable (HMC/NUTS capability the
    reference cannot have)."""
    theta0 = toy.model.prefit_vector()
    grad = jax.jit(jax.grad(toy.model.log_posterior))(theta0)
    g = np.asarray(grad)
    assert np.all(np.isfinite(g))
    assert np.any(g != 0)


def test_log_posterior_batch_matches_vmap(toy):
    """The batched gradient path (shared osc grids, whole-vector prior,
    batched XLA reweight) must agree with vmap of the scalar log_posterior —
    value AND gradient (HMC/MALA/ChEES all ride log_posterior_batch)."""
    theta0 = np.asarray(toy.model.prefit_vector())
    errs = np.concatenate([np.asarray(ps.errors) for ps in (toy.xsec, toy.osc)])
    lo = np.concatenate([np.asarray(p.low_bound) for p in toy.model.priors])
    hi = np.concatenate([np.asarray(p.up_bound) for p in toy.model.priors])
    rng = np.random.default_rng(5)
    thetas = np.tile(theta0, (6, 1)) + 0.3 * errs * rng.normal(
        size=(6, len(theta0))
    )
    # stay inside the hard bounds: the differentiable density has no OOB
    # sentinel, and e.g. sin^2(th13) < 0 is NaN territory by construction
    thetas = jnp.asarray(np.clip(thetas, lo + 1e-9, hi - 1e-9))
    batched = np.asarray(jax.jit(toy.model.log_posterior_batch)(thetas))
    looped = np.asarray(jax.jit(jax.vmap(toy.model.log_posterior))(thetas))
    np.testing.assert_allclose(batched, looped, rtol=1e-10)
    g_b = np.asarray(
        jax.jit(jax.grad(lambda t: jnp.sum(toy.model.log_posterior_batch(t))))(
            thetas
        )
    )
    g_l = np.asarray(
        jax.jit(jax.vmap(jax.grad(toy.model.log_posterior)))(thetas)
    )
    assert np.all(np.isfinite(g_b))
    # f32 spline/osc weights: reduction order differs between the two
    # programs, so agreement is f32-epsilon-level, not bitwise
    np.testing.assert_allclose(g_b, g_l, rtol=2e-5, atol=1e-4)


def test_llh_breakdown_matches_total(toy):
    theta = np.asarray(toy.model.prefit_vector()).copy()
    theta[3] = 1.4
    theta = jnp.asarray(theta)
    per_sample = np.asarray(jax.jit(toy.model.sample_nll_breakdown)(theta))
    per_prior = np.asarray(jax.jit(toy.model.prior_nll_breakdown)(theta))
    total = float(jax.jit(toy.model.total_nll)(theta))
    assert total == pytest.approx(per_sample.sum() + per_prior.sum(), rel=1e-12)
