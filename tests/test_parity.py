"""Posterior-parity regression harness (VERDICT r1 item 8).

A linear-Gaussian limit whose posterior is known in CLOSED FORM: norm-only
systematics (the model is linear in the parameters), the fixed-variance
Gaussian statistic, and a correlated Gaussian prior. The MCMC posterior must
match the analytic mean/covariance within Monte-Carlo error — this is the
in-repo equivalent of the reference's FitterValidations CI gate
(``.github/workflows/CIValidations.yml:20-45``): any future kernel
"optimisation" that bends the likelihood, proposal, or accept/reject breaks
this test.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mach3_tpu.core.config import Config
from mach3_tpu.fitters.mcmc import MCMCConfig, MR2T2
from mach3_tpu.fitters.model import FitModel
from mach3_tpu.params.parameterset import ParameterSet
from mach3_tpu.samples.events import EventData, build_sample_model, match_norm_params
from mach3_tpu.samples.teststats import TestStatistic
from mach3_tpu.params.parameterset import ParamType

N_PARAMS = 6
N_BINS = 10


def _config():
    """Six norm parameters, one per mode, adjacent pairs correlated."""
    systematics = []
    for i in range(N_PARAMS):
        syst = {
            "Names": {"FancyName": f"n{i}"},
            "ParameterValues": {"PreFitValue": 1.0},
            "StepScale": {"MCMC": 0.8},
            "Error": 0.08 + 0.02 * (i % 3),
            "ParameterBounds": [-2.0, 4.0],
            "Type": "Norm",
            "ParameterGroup": "Xsec",
            "Mode": [i],
        }
        if i + 1 < N_PARAMS:
            syst["Correlations"] = [{f"n{i+1}": 0.3}]
        if i > 0:
            syst.setdefault("Correlations", []).append({f"n{i-1}": 0.3})
        systematics.append({"Systematic": syst})
    return {"Systematics": systematics}


@pytest.fixture(scope="module")
def linear_fit():
    rng = np.random.default_rng(77)
    ps = ParameterSet.from_config(Config(_config()), name="xsec")

    n = 6000
    x = np.clip(rng.normal(1.0, 0.4, n), 0.05, 1.95)
    mode = rng.integers(0, N_PARAMS, n).astype(np.int32)
    ev = EventData(
        kinematics={"x": x},
        mode=mode,
        target=np.full(n, 12, np.int32),
        pdg=np.full(n, 14, np.int32),
        preosc_pdg=np.full(n, 14, np.int32),
        mc_weight=rng.uniform(0.5, 1.5, n) * 0.05,
    )
    edges = np.linspace(0.0, 2.0, N_BINS + 1)
    norm_metas = [(m, m.index) for m in ps.of_type(ParamType.NORM)]
    sample = build_sample_model(
        "lin",
        ev,
        var_order=["x"],
        binning_edges=[edges],
        binning_vars=["x"],
        n_total_params=N_PARAMS,
        norm_idx=match_norm_params(ev, norm_metas, "lin"),
        test_statistic=TestStatistic.GAUSSIAN,
    )

    # Design matrix A[b, p] = sum of mc_weights of events with mode p in bin b
    bins = np.digitize(x, edges) - 1
    a = np.zeros((N_BINS, N_PARAMS))
    np.add.at(a, (bins, mode), ev.mc_weight)

    # Data: linear prediction at a shifted truth (kept exact, not fluctuated)
    theta_star = 1.0 + 0.15 * rng.normal(size=N_PARAMS)
    data = a @ theta_star
    sample = sample.with_data(data)
    model = FitModel.build([ps], [sample])

    # Analytic Gaussian posterior
    sigma_inv = np.diag(1.0 / np.maximum(data, 1.0))
    prior_cov = np.asarray(ps.covariance)
    c0_inv = np.linalg.inv(prior_cov)
    lam = a.T @ sigma_inv @ a + c0_inv
    post_cov = np.linalg.inv(lam)
    post_mean = post_cov @ (a.T @ sigma_inv @ data + c0_inv @ np.ones(N_PARAMS))
    return model, a, data, post_mean, post_cov


def test_nll_is_exactly_quadratic(linear_fit):
    """-logL (stat + prior) equals the analytic quadratic form at arbitrary
    points — pins the likelihood itself, independent of sampling."""
    model, a, data, post_mean, post_cov = linear_fit
    rng = np.random.default_rng(3)
    lam = np.linalg.inv(post_cov)
    for _ in range(5):
        theta = 1.0 + 0.3 * rng.normal(size=N_PARAMS)
        nll = float(jax.jit(model.total_nll)(jnp.asarray(theta)))
        # analytic: 1/2 (A t - d)^T S^-1 (A t - d) + 1/2 (t - 1)^T C0^-1 (t - 1)
        r = a @ theta - data
        sigma_inv = np.diag(1.0 / np.maximum(data, 1.0))
        prior_cov_inv = lam - a.T @ sigma_inv @ a
        t0 = theta - 1.0
        expected = 0.5 * r @ sigma_inv @ r + 0.5 * t0 @ prior_cov_inv @ t0
        assert abs(nll - expected) < 1e-6 * max(1.0, abs(expected))


def test_posterior_matches_closed_form(linear_fit):
    """MR2T2 posterior moments equal the analytic Gaussian within MC error."""
    model, a, data, post_mean, post_cov = linear_fit
    n_chains, n_steps, burn = 24, 2500, 600
    rng = np.random.default_rng(5)
    init = post_mean[None, :] + rng.normal(size=(n_chains, N_PARAMS)) @ np.linalg.cholesky(post_cov).T
    fitter = MR2T2(model, MCMCConfig(chunk_size=500), np.asarray(init), seed=9)
    out = fitter.run(n_steps=n_steps)
    draws = out["theta"][burn:].reshape(-1, N_PARAMS)
    acc = float(np.mean(out["accepted"][burn:]))
    assert 0.05 < acc < 0.9, f"acceptance {acc} out of healthy range"

    sig = np.sqrt(np.diag(post_cov))
    mean_err = (draws.mean(axis=0) - post_mean) / sig
    # ~46k correlated draws; tolerance is several times the expected MC error
    assert np.all(np.abs(mean_err) < 0.25), mean_err

    cov = np.cov(draws.T)
    np.testing.assert_allclose(
        np.sqrt(np.diag(cov)), sig, rtol=0.2,
        err_msg="posterior widths off",
    )
    # correlation structure
    corr = cov / np.outer(np.sqrt(np.diag(cov)), np.sqrt(np.diag(cov)))
    corr_ref = post_cov / np.outer(sig, sig)
    assert np.max(np.abs(corr - corr_ref)) < 0.2


def test_delayed_posterior_matches_closed_form(linear_fit):
    """DelayedMR2T2 targets the same posterior (its second-stage acceptance
    must preserve detailed balance)."""
    from mach3_tpu.fitters.delayed import DelayedConfig, DelayedMR2T2

    model, a, data, post_mean, post_cov = linear_fit
    n_chains, n_steps, burn = 24, 2000, 500
    rng = np.random.default_rng(6)
    init = post_mean[None, :] + rng.normal(size=(n_chains, N_PARAMS)) @ np.linalg.cholesky(post_cov).T
    fitter = DelayedMR2T2(
        model,
        DelayedConfig(chunk_size=500, max_rejections=2, decay_rate=0.5),
        np.asarray(init),
        seed=10,
    )
    out = fitter.run(n_steps=n_steps)
    draws = out["theta"][burn:].reshape(-1, N_PARAMS)
    sig = np.sqrt(np.diag(post_cov))
    mean_err = (draws.mean(axis=0) - post_mean) / sig
    assert np.all(np.abs(mean_err) < 0.3), mean_err
    np.testing.assert_allclose(np.sqrt(np.diag(np.cov(draws.T))), sig, rtol=0.25)
