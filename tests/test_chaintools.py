"""Chain tools (penalty/smear/reweight) and sample projections."""
import jax.numpy as jnp
import numpy as np
import pytest

from mach3_tpu.diagnostics.chaintools import (
    penalty_terms,
    reweight_to_new_prior,
    smear_chain,
)


def test_penalty_terms_groups():
    rng = np.random.default_rng(0)
    prefit = np.array([1.0, 0.0, -1.0])
    cov = np.diag([0.25, 1.0, 4.0])
    inv = np.linalg.inv(cov)
    draws = prefit + rng.normal(size=(500, 3)) * np.sqrt(np.diag(cov))
    pen = penalty_terms(draws, prefit, inv, groups={"a": [0], "bc": [1, 2]})
    # total ~ chi2/2 with 3 dof -> mean 1.5
    assert pen["total"].mean() == pytest.approx(1.5, rel=0.15)
    assert pen["a"].mean() == pytest.approx(0.5, rel=0.2)
    assert pen["bc"].mean() == pytest.approx(1.0, rel=0.2)
    assert np.allclose(pen["total"], pen["a"] + pen["bc"], atol=1e-12)


def test_smear_chain():
    draws = np.zeros((20000, 2))
    sm = smear_chain(draws, {1: 0.5}, seed=1)
    assert np.allclose(sm[:, 0], 0.0)
    assert sm[:, 1].std() == pytest.approx(0.5, rel=0.05)


def test_reweight_to_new_prior():
    rng = np.random.default_rng(2)
    draws = rng.normal(0.0, 1.0, size=(50000, 1))  # posterior = N(0,1) (flat prior)
    w = reweight_to_new_prior(draws, 0, old_prior=None, new_prior=(1.0, 1.0))
    m = (draws[:, 0] * w).sum() / w.sum()
    # posterior with new prior N(1,1): product of N(0,1)*N(1,1) -> mean 0.5
    assert m == pytest.approx(0.5, abs=0.03)


def test_projection_and_rates():
    from mach3_tpu.samples.projection import event_rate_table, project
    from mach3_tpu.tutorial.toy import build_toy

    toy = build_toy(n_events=2000, seed=12, e_grid_size=40)
    theta = toy.model.prefit_vector()
    s0 = toy.samples[0]
    edges = np.linspace(0, 3, 16)
    proj = project(s0, theta, var_row=1, edges=edges)
    # projection onto the binning variable reproduces the Asimov data total
    assert proj["total"].sum() == pytest.approx(float(np.asarray(s0.data).sum()), rel=1e-5)

    rates = event_rate_table(toy.samples, theta)
    assert set(rates) == {"numu_sample", "nue_sample"}
    assert rates["numu_sample"]["total"] > 0
