"""Fitter family tests: HMC, delayed rejection, minimizer, PSO, scans, factory
(reference: ``Fitters/``)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mach3_tpu.core import Config
from mach3_tpu.fitters import (
    DelayedConfig,
    DelayedMR2T2,
    FitModel,
    HMC,
    HMCConfig,
    MCMCConfig,
    MR2T2,
    PSOConfig,
    drag_race,
    llh_scan_1d,
    llh_scan_2d,
    make_fitter,
    run_minimizer,
    run_pso,
    sigma_variations,
)
from mach3_tpu.params.parameterset import ParameterSet


def _gauss_param(name, prefit, error, step=1.0, bounds=(-50, 50)):
    return {
        "Systematic": {
            "Names": {"FancyName": name},
            "ParameterValues": {"PreFitValue": prefit},
            "StepScale": {"MCMC": step},
            "Error": error,
            "ParameterBounds": list(bounds),
            "Type": "Norm",
        }
    }


@pytest.fixture(scope="module")
def gauss_model():
    ps = ParameterSet.from_config(
        {
            "Systematics": [
                _gauss_param("a", 1.0, 0.5, step=2.0),
                _gauss_param("b", -2.0, 2.0, step=2.0),
            ]
        },
        name="g",
    )
    return FitModel.build([ps], []), ps


def test_hmc_samples_gaussian(gauss_model):
    model, ps = gauss_model
    init = np.tile(np.asarray(ps.prefit), (8, 1))
    hmc = HMC(model, HMCConfig(n_leapfrog=12, step_size=0.2, adapt_steps=200), init, seed=1)
    out = hmc.run(n_steps=1600)
    draws = out["theta"][400:].reshape(-1, 2)
    assert hmc.acceptance_rate.mean() > 0.5  # HMC should accept most steps
    assert np.mean(draws[:, 0]) == pytest.approx(1.0, abs=0.06)
    assert np.std(draws[:, 0]) == pytest.approx(0.5, rel=0.15)
    assert np.std(draws[:, 1]) == pytest.approx(2.0, rel=0.15)


def test_chees_hmc_adapts_trajectory_and_samples(gauss_model):
    """ChEES trajectory adaptation: the learned trajectory time moves away
    from its (deliberately tiny) initial value, chains stay correct on the
    Gaussian target, and the dynamic-length leapfrog keeps acceptance high."""
    model, ps = gauss_model
    init = np.tile(np.asarray(ps.prefit), (32, 1))
    cfg = HMCConfig(
        step_size=0.2,
        adapt_steps=300,
        adapt_trajectory=True,
        max_leapfrog=32,
        initial_traj_length=0.25,  # far too short for sigma = 2 -> must grow
    )
    hmc = HMC(model, cfg, init, seed=3)
    out = hmc.run(n_steps=1200)
    learned_t = float(np.exp(np.asarray(hmc.state.log_traj)))
    assert learned_t > 0.8, learned_t  # grew toward the posterior scale
    draws = out["theta"][400:].reshape(-1, 2)
    assert hmc.acceptance_rate.mean() > 0.5
    assert np.mean(draws[:, 0]) == pytest.approx(1.0, abs=0.06)
    assert np.std(draws[:, 0]) == pytest.approx(0.5, rel=0.15)
    assert np.std(draws[:, 1]) == pytest.approx(2.0, rel=0.15)


def test_chees_adapts_with_fixed_step_size(gauss_model):
    """Trajectory adaptation must not be gated on the (unrelated) step-size
    adaptation flag: with adapt_step_size=False and a hand-tuned step size,
    ChEES still has to learn the trajectory time."""
    model, ps = gauss_model
    init = np.tile(np.asarray(ps.prefit), (32, 1))
    cfg = HMCConfig(
        step_size=0.2, adapt_step_size=False, adapt_steps=200,
        adapt_trajectory=True, max_leapfrog=32, initial_traj_length=0.25,
    )
    hmc = HMC(model, cfg, init, seed=3)
    hmc.run(n_steps=400)
    learned_t = float(np.exp(np.asarray(hmc.state.log_traj)))
    assert learned_t > 0.5, learned_t
    # step size stayed fixed as requested
    assert float(np.exp(np.asarray(hmc.state.log_eps))) == pytest.approx(0.2)


def test_mala_via_factory_samples_gaussian(gauss_model):
    """MALA = single-leapfrog HMC: the kinetic-energy MH ratio is exactly the
    Langevin asymmetric-proposal correction. Factory algo name 'MALA'."""
    from mach3_tpu.core import Config
    model, ps = gauss_model
    cfg = Config({"General": {"FittingAlgorithm": "MALA",
                              "MCMC": {"NChains": 16, "StepSize": 0.5}}})
    f = make_fitter(cfg, model, seed=9)
    assert f.config.n_leapfrog == 1 and not f.config.jitter_trajectory
    out = f.run(n_steps=2500)
    draws = out["theta"][700:].reshape(-1, 2)
    assert f.acceptance_rate.mean() > 0.4
    assert np.mean(draws[:, 0]) == pytest.approx(1.0, abs=0.06)
    assert np.std(draws[:, 0]) == pytest.approx(0.5, rel=0.15)
    assert np.std(draws[:, 1]) == pytest.approx(2.0, rel=0.15)


def test_delayed_rejection_improves_acceptance(gauss_model):
    model, ps = gauss_model
    init = np.tile(np.asarray(ps.prefit), (8, 1))
    # Oversized steps: plain MR2T2 rejects most; delayed retries at 0.1x scale
    plain = MR2T2(model, MCMCConfig(chunk_size=200), init, seed=2)
    delayed = DelayedMR2T2(
        model,
        DelayedConfig(chunk_size=200, decay_rate=0.1, max_rejections=2),
        init,
        seed=2,
    )
    out_p = plain.run(n_steps=800)
    out_d = delayed.run(n_steps=800)
    assert out_d["accepted"].mean() > out_p["accepted"].mean()
    assert out_d["delayed_accept"].mean() > 0.01  # some accepts came from retries
    # still samples the right distribution
    draws = out_d["theta"][200:].reshape(-1, 2)
    assert np.mean(draws[:, 0]) == pytest.approx(1.0, abs=0.15)


def test_minimizer_finds_mode_and_hesse(gauss_model):
    model, ps = gauss_model
    x0 = np.asarray(ps.prefit) + np.array([1.0, -3.0])
    res = run_minimizer(model, x0=x0)
    assert res.success
    assert res.x[0] == pytest.approx(1.0, abs=1e-5)
    assert res.x[1] == pytest.approx(-2.0, abs=1e-5)
    # Hesse errors equal the prior sigmas for a pure-Gaussian model
    assert res.errors[0] == pytest.approx(0.5, rel=1e-4)
    assert res.errors[1] == pytest.approx(2.0, rel=1e-4)


def test_pso_finds_mode(gauss_model):
    model, ps = gauss_model
    res = run_pso(model, PSOConfig(n_particles=32, n_iterations=200), seed=3)
    assert res.x[0] == pytest.approx(1.0, abs=0.05)
    assert res.x[1] == pytest.approx(-2.0, abs=0.1)
    assert res.history[-1] < res.history[0]


def test_llh_scan_parabolic(gauss_model):
    model, ps = gauss_model
    scan = llh_scan_1d(model, n_points=21)
    assert scan["total"].shape == (2, 21)
    for p in range(2):
        t = scan["total"][p]
        imin = np.argmin(t)
        assert abs(scan["values"][p][imin] - ps.prefit[p]) < 0.2
        # parabola: ends higher than middle
        assert t[0] > t[imin] + 2 and t[-1] > t[imin] + 2


def test_llh_scan_2d(gauss_model):
    model, ps = gauss_model
    scan = llh_scan_2d(model, 0, 1, n_points=11)
    assert scan["total"].shape == (11, 11)
    i, j = np.unravel_index(np.argmin(scan["total"]), scan["total"].shape)
    assert abs(scan["x"][i] - 1.0) < 0.4
    assert abs(scan["y"][j] + 2.0) < 1.5


def test_drag_race_runs(gauss_model):
    model, ps = gauss_model
    t = drag_race(model, n_laps=3)
    assert "propose" in t and t["propose"] > 0


def test_factory_dispatch(gauss_model):
    model, ps = gauss_model
    cfg = Config(
        {"General": {"FittingAlgorithm": "MR2T2", "MCMC": {"NSteps": 10, "NChains": 4}}}
    )
    fitter = make_fitter(cfg, model)
    out = fitter.run()
    assert out["theta"].shape == (10, 4, 2)

    cfg2 = Config({"General": {"FittingAlgorithm": "Minimizer"}})
    res = make_fitter(cfg2, model).run()
    assert res.success


def test_sigma_variations_shapes():
    """Sigma variations on a model with one sample."""
    from mach3_tpu.tutorial.toy import build_toy

    toy = build_toy(n_events=1000, seed=3, e_grid_size=40)
    sv = sigma_variations(toy.model, sample_index=0, indices=[0, 1])
    assert sv["hists"].shape[0] == 2
    assert sv["hists"].shape[1] == 5
    # sigma=0 column equals the Asimov data
    data = np.asarray(toy.samples[0].data)
    assert np.allclose(sv["hists"][0, 2], data, rtol=1e-5)


def test_ensemble_sampler_gaussian(gauss_model):
    from mach3_tpu.fitters.ensemble import EnsembleConfig, EnsembleSampler

    model, ps = gauss_model
    rng = np.random.default_rng(11)
    init = np.asarray(ps.prefit) + 0.1 * rng.normal(size=(16, 2))
    sampler = EnsembleSampler(model, EnsembleConfig(chunk_size=200), init, seed=12)
    out = sampler.run(n_steps=2000)
    draws = out["theta"][500:].reshape(-1, 2)
    assert sampler.acceptance_rate.mean() > 0.1
    assert np.mean(draws[:, 0]) == pytest.approx(1.0, abs=0.05)
    assert np.std(draws[:, 0]) == pytest.approx(0.5, rel=0.12)
    assert np.std(draws[:, 1]) == pytest.approx(2.0, rel=0.12)


def test_ensemble_walker_validation(gauss_model):
    from mach3_tpu.fitters.ensemble import EnsembleConfig, EnsembleSampler

    model, ps = gauss_model
    with pytest.raises(ValueError, match="even"):
        EnsembleSampler(model, EnsembleConfig(), np.zeros((5, 2)))
    with pytest.raises(ValueError, match="walkers"):
        EnsembleSampler(model, EnsembleConfig(), np.zeros((2, 2)))


def test_hmc_mass_adaptation_learns_scales(gauss_model):
    """Windowed mass adaptation: on an anisotropic Gaussian (sigma 0.5 vs
    2.0) the diagonal inverse mass converges to the posterior variances —
    the HMC analogue of Haario covariance adaptation."""
    from mach3_tpu.fitters.hmc import HMC, HMCConfig

    model, ps = gauss_model
    init = np.tile(np.asarray(ps.prefit), (32, 1))
    cfg = HMCConfig(
        n_steps=600, chunk_size=200, n_leapfrog=10, step_size=0.2,
        adapt_steps=400, adapt_mass=True, mass_update_every=25,
        mass_start_update=20,
    )
    hmc = HMC(model, cfg, init, seed=11)
    out = hmc.run()
    assert np.all(np.isfinite(out["theta"]))
    minv = np.asarray(hmc.state.minv)
    # variances are 0.25 and 4.0; learned inverse mass must separate the
    # scales (ratio ~16) and land within a factor ~3 of truth
    assert 0.08 < minv[0] < 0.8
    assert 1.3 < minv[1] < 12.0
    assert minv[1] / minv[0] > 4.0
    # sampling still correct after adaptation
    draws = out["theta"][450:].reshape(-1, 2)
    assert abs(draws[:, 0].std() - 0.5) < 0.15
    assert abs(draws[:, 1].std() - 2.0) < 0.6
