"""Marginal-likelihood estimation from the parallel-tempering ladder.

A linear-Gaussian model (norm-only systematics + fixed-variance Gaussian
statistic, as in test_parity) has a CLOSED-FORM evidence:

    Z = ∫ N(θ; μ0, C0) · Π_b exp(-(d_b - (Aθ)_b)² / 2σ_b²) dθ
      = Π_b √(2π σ_b²) · N(d; A μ0, Σ_d + A C0 Aᵀ)

The stepping-stone and thermodynamic-integration estimators over a
``beta_zero`` PT run must reproduce it within Monte-Carlo error — the
capability the reference does not have (its Bayes factors are posterior-draw
ratios only, ``Fitters/MCMCProcessor.cpp`` Savage-Dickey).
"""
import numpy as np
import pytest

from mach3_tpu.core.config import Config
from mach3_tpu.diagnostics.evidence import (
    log_prior_mass,
    stepping_stone_log_evidence,
    thermodynamic_log_evidence,
)
from mach3_tpu.fitters.model import FitModel
from mach3_tpu.fitters.tempering import ParallelTempering, PTConfig, pt_betas
from mach3_tpu.params.parameterset import ParameterSet, ParamType
from mach3_tpu.samples.events import EventData, build_sample_model, match_norm_params
from mach3_tpu.samples.teststats import TestStatistic

N_PARAMS = 4
N_BINS = 8


def _config():
    systematics = []
    for i in range(N_PARAMS):
        syst = {
            "Names": {"FancyName": f"n{i}"},
            "ParameterValues": {"PreFitValue": 1.0},
            "StepScale": {"MCMC": 0.8},
            "Error": 0.10 + 0.02 * (i % 2),
            "ParameterBounds": [-3.0, 5.0],
            "Type": "Norm",
            "ParameterGroup": "Xsec",
            "Mode": [i],
        }
        if i + 1 < N_PARAMS:
            syst["Correlations"] = [{f"n{i+1}": 0.25}]
        if i > 0:
            syst.setdefault("Correlations", []).append({f"n{i-1}": 0.25})
        systematics.append({"Systematic": syst})
    return {"Systematics": systematics}


@pytest.fixture(scope="module")
def linear_evidence_fit():
    rng = np.random.default_rng(123)
    ps = ParameterSet.from_config(Config(_config()), name="xsec")

    n = 2000
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
    bins = np.digitize(x, edges) - 1
    a = np.zeros((N_BINS, N_PARAMS))
    np.add.at(a, (bins, mode), ev.mc_weight)

    theta_star = 1.0 + 0.2 * rng.normal(size=N_PARAMS)
    data = a @ theta_star
    model = FitModel.build([ps], [sample.with_data(data)])

    # Closed-form log evidence against the NORMALISED prior
    sigma2 = np.maximum(data, 1.0)
    c0 = np.asarray(ps.covariance)
    cov_d = np.diag(sigma2) + a @ c0 @ a.T
    r = data - a @ np.ones(N_PARAMS)
    sign, logdet = np.linalg.slogdet(cov_d)
    assert sign > 0
    mvn_logpdf = -0.5 * (
        r @ np.linalg.solve(cov_d, r) + logdet + N_BINS * np.log(2 * np.pi)
    )
    log_z = 0.5 * np.sum(np.log(2 * np.pi * sigma2)) + mvn_logpdf
    return model, float(log_z), c0


def test_estimators_on_analytic_rungs():
    """Both estimators are exact when like(θ) is constant per level: Z(1)/Z(0)
    = exp(-E0) for E ≡ E0."""
    betas = np.array([1.0, 0.5, 0.25, 0.0])
    e = np.full((100, 4, 2), 3.7)
    assert stepping_stone_log_evidence(e, betas) == pytest.approx(-3.7, rel=1e-12)
    assert thermodynamic_log_evidence(e, betas) == pytest.approx(-3.7, rel=1e-12)


def test_beta_zero_ladder():
    cfg = PTConfig(n_temps=6, max_temp=100.0, beta_zero=True)
    b = pt_betas(cfg)
    assert b.shape == (6,)
    assert b[0] == 1.0 and b[-1] == 0.0
    assert np.all(np.diff(b) < 0)
    with pytest.raises(ValueError):
        pt_betas(PTConfig(n_temps=2, beta_zero=True))


def test_log_prior_mass_gaussian(linear_evidence_fit):
    model, _, c0 = linear_evidence_fit
    sign, logdet = np.linalg.slogdet(c0)
    expect = 0.5 * N_PARAMS * np.log(2 * np.pi) + 0.5 * logdet
    assert log_prior_mass(model) == pytest.approx(expect, rel=1e-10)


def test_pt_evidence_matches_closed_form(linear_evidence_fit):
    model, log_z, _ = linear_evidence_fit
    rng = np.random.default_rng(7)
    init = 1.0 + 0.1 * rng.normal(size=(16, N_PARAMS))
    cfg = PTConfig(
        n_steps=3000, chunk_size=750, n_temps=10, max_temp=300.0, beta_zero=True
    )
    pt = ParallelTempering(model, cfg, init, seed=11)
    out = pt.run()

    ss = pt.log_evidence(out, method="stepping_stone")
    assert ss == pytest.approx(log_z, abs=0.5), (ss, log_z)

    # TI carries trapezoid bias on a 10-level ladder; looser gate
    ti = pt.log_evidence(out, method="thermodynamic")
    assert ti == pytest.approx(log_z, abs=2.0), (ti, log_z)

    # the raw-measure variant differs by exactly the prior mass
    raw = pt.log_evidence(out, method="stepping_stone", normalise_prior=False)
    assert raw - ss == pytest.approx(log_prior_mass(model), rel=1e-10)


def test_factory_beta_zero_key(linear_evidence_fit):
    from mach3_tpu.fitters.factory import make_fitter

    model, _, _ = linear_evidence_fit
    cfg = Config(
        {
            "General": {
                "FittingAlgorithm": "PT",
                "MCMC": {"NSteps": 4, "AutoSave": 4, "NChains": 4},
                "PT": {"NTemps": 4, "BetaZero": True, "MaxTemp": 16.0},
            }
        }
    )
    pt = make_fitter(cfg, model)
    assert pt.config.beta_zero is True
    assert pt_betas(pt.config)[-1] == 0.0


def test_log_evidence_requires_beta_zero(linear_evidence_fit):
    model, _, _ = linear_evidence_fit
    cfg = PTConfig(n_steps=4, chunk_size=4, n_temps=4, max_temp=16.0)
    pt = ParallelTempering(model, cfg, np.ones((4, N_PARAMS)))
    out = pt.run()
    assert "sample_nll" in out
    with pytest.raises(ValueError, match="beta_zero"):
        pt.log_evidence(out)
