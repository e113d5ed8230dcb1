"""Parallel tempering: replica exchange over the chain batch axis.

The physics case is multimodal oscillation posteriors (θ23 octant, mass
ordering). The test target is a sharply bimodal likelihood built from REAL
sample machinery: one norm parameter matched twice per event gives event
weight θ², so a one-bin Poisson sample with data N·θ*² has modes at ±θ*
separated by a likelihood barrier at θ=0 that a small-step single-temperature
chain cannot cross.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mach3_tpu.core import Config
from mach3_tpu.fitters import (
    FitModel,
    MCMCConfig,
    MR2T2,
    ParallelTempering,
    PTConfig,
    make_fitter,
)
from mach3_tpu.fitters.tempering import temperature_ladder
from mach3_tpu.params.parameterset import ParameterSet
from mach3_tpu.samples.events import EventData, build_sample_model
from mach3_tpu.samples.teststats import TestStatistic

THETA_STAR = 2.0
N_EVENTS = 100


def _param(name, prefit, error, step, bounds=(-50, 50)):
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
def bimodal_model():
    # Prior centred at 0 (sigma 3) keeps the +-theta* modes symmetric; the
    # throw sigma is 3 x 0.1 = 0.3, so a +2 -> -2 hop is 13 sigma —
    # unreachable for the cold chain — while the T_max=64 level throws
    # sqrt(64) = 8x larger and hops between modes directly.
    ps = ParameterSet.from_config(
        {"Systematics": [_param("mu", 0.0, 3.0, step=0.1)]}, name="bi"
    )
    ev = EventData(
        kinematics={"x": np.full(N_EVENTS, 0.5)},
        mode=np.zeros(N_EVENTS, np.int32),
        target=np.full(N_EVENTS, 8, np.int32),
        pdg=np.full(N_EVENTS, 14, np.int32),
        preosc_pdg=np.full(N_EVENTS, 14, np.int32),
        mc_weight=np.ones(N_EVENTS),
    )
    # weight = theta * theta (the same param matched in both norm slots)
    norm_idx = np.zeros((N_EVENTS, 2), np.int32)
    sm = build_sample_model(
        "bi",
        ev,
        var_order=["x"],
        binning_edges=[np.array([0.0, 1.0])],
        binning_vars=["x"],
        n_total_params=1,
        norm_idx=norm_idx,
        test_statistic=TestStatistic.POISSON,
    ).with_data(np.array([N_EVENTS * THETA_STAR**2]))
    return FitModel.build([ps], [sm])


def _mode_fractions(draws: np.ndarray) -> tuple[float, float]:
    """(frac in negative mode, frac in positive mode) for |theta| > 1."""
    flat = draws.reshape(-1)
    return float(np.mean(flat < -1.0)), float(np.mean(flat > 1.0))


def test_temperature_ladder():
    t = temperature_ladder(5, 16.0)
    assert t[0] == 1.0 and t[-1] == 16.0
    assert np.all(np.diff(np.log(t)) > 0)
    r = np.diff(np.log(t))
    np.testing.assert_allclose(r, r[0])  # geometric


def test_single_temperature_chain_stays_in_one_mode(bimodal_model):
    init = np.full((16, 1), THETA_STAR)
    f = MR2T2(bimodal_model, MCMCConfig(chunk_size=500), init, seed=3)
    out = f.run(n_steps=2000)
    neg, pos = _mode_fractions(out["theta"][500:])
    assert neg == 0.0  # the barrier is impassable at sigma=0.2
    assert pos > 0.5


def test_parallel_tempering_mixes_between_modes(bimodal_model):
    init = np.full((8, 1), THETA_STAR)  # every walker starts in the + mode
    pt = ParallelTempering(
        bimodal_model, PTConfig(n_temps=6, max_temp=64.0, chunk_size=500),
        init, seed=5,
    )
    out = pt.run(n_steps=4000)
    cold = pt.cold_chain(out)["theta"][1000:]  # burn-in: swap cascade latency
    neg, pos = _mode_fractions(cold)
    # symmetric target: both modes visited substantially at beta=1
    assert neg > 0.15 and pos > 0.15
    assert neg + pos > 0.8  # the barrier region holds almost no mass
    # replica-exchange health: every boundary actually swaps
    assert np.all(pt.swap_acceptance > 0.05)
    # acceptance telemetry is per-level: hot levels scaled throws still accept
    acc = pt.acceptance_rate.reshape(6, 8).mean(axis=1)
    assert np.all(acc > 0.05)


def test_pt_cold_level_preserves_target_moments():
    """On a unimodal Gaussian (prior-only) target the beta=1 level must
    reproduce the prior moments — swaps and tempered levels must not bias
    the posterior slice."""
    ps = ParameterSet.from_config(
        {"Systematics": [_param("a", 0.5, 1.0, step=1.0), _param("b", -1.0, 2.0, step=1.0)]},
        name="g",
    )
    model = FitModel.build([ps], [])
    init = np.tile(np.asarray(ps.prefit), (16, 1))
    pt = ParallelTempering(model, PTConfig(n_temps=4, max_temp=16.0, chunk_size=500), init, seed=7)
    out = pt.run(n_steps=3000)
    cold = pt.cold_chain(out)["theta"][500:].reshape(-1, 2)
    np.testing.assert_allclose(cold.mean(axis=0), [0.5, -1.0], atol=0.15)
    np.testing.assert_allclose(cold.std(axis=0), [1.0, 2.0], rtol=0.12)


def test_factory_builds_parallel_tempering(bimodal_model):
    cfg = Config(
        {
            "General": {
                "FittingAlgorithm": "PTMCMC",
                "MCMC": {"NSteps": 10, "NChains": 4},
                "PT": {"NTemps": 3, "MaxTemp": 9.0},
            }
        }
    )
    f = make_fitter(cfg, bimodal_model, seed=1)
    assert isinstance(f, ParallelTempering)
    out = f.run(n_steps=10)
    assert out["theta"].shape == (10, 12, 1)


def test_pt_checkpoint_resume_exact(tmp_path, bimodal_model):
    """The generic sampler checkpoint must resume a PT fit exactly (same
    state pytree in, same draws out)."""
    from mach3_tpu.diagnostics.chain_io import load_checkpoint, save_checkpoint

    init = np.full((4, 1), THETA_STAR)
    cfgp = PTConfig(n_temps=3, max_temp=9.0, chunk_size=20)
    a = ParallelTempering(bimodal_model, cfgp, init, seed=11)
    a.run(n_steps=40)
    ckpt = str(tmp_path / "pt_ckpt.npz")
    save_checkpoint(ckpt, a, ["mu"])

    b = ParallelTempering(bimodal_model, cfgp, init, seed=999)
    load_checkpoint(ckpt, b)
    out_a = a.run(n_steps=30)
    out_b = b.run(n_steps=30)
    np.testing.assert_array_equal(out_a["theta"], out_b["theta"])
    np.testing.assert_array_equal(
        np.asarray(a.state.swap_accepts), np.asarray(b.state.swap_accepts)
    )
