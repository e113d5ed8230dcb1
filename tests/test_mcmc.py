"""MCMC correctness: exact sampling of a known Gaussian posterior, adaptive
covariance behaviour, annealing, out-of-bounds handling
(reference: ``Fitters/MR2T2.cpp``, ``Fitters/MCMCBase.cpp``,
``Parameters/AdaptiveMCMCHandler.cpp``)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mach3_tpu.fitters.mcmc import MR2T2, MCMCConfig
from mach3_tpu.fitters.model import FitModel
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


def _prior_only_model(params):
    ps = ParameterSet.from_config({"Systematics": params}, name="g")
    return FitModel.build([ps], []), ps


def test_samples_gaussian_prior_exactly():
    """With no samples, MR2T2 must sample the Gaussian prior: check moments."""
    model, ps = _prior_only_model(
        [_gauss_param("a", 1.0, 0.5, step=2.4), _gauss_param("b", -2.0, 2.0, step=2.4)]
    )
    init = np.tile(np.asarray(ps.prefit), (16, 1))
    fitter = MR2T2(model, MCMCConfig(chunk_size=250), init, seed=5)
    out = fitter.run(n_steps=4000)
    draws = out["theta"][1000:].reshape(-1, 2)  # burn-in
    assert np.mean(out["accepted"][1000:]) > 0.1
    assert np.mean(draws[:, 0]) == pytest.approx(1.0, abs=0.05)
    assert np.std(draws[:, 0]) == pytest.approx(0.5, rel=0.12)
    assert np.mean(draws[:, 1]) == pytest.approx(-2.0, abs=0.2)
    assert np.std(draws[:, 1]) == pytest.approx(2.0, rel=0.12)


def test_flat_prior_within_bounds_is_uniform():
    model, ps = _prior_only_model(
        [
            {
                "Systematic": {
                    "Names": {"FancyName": "u"},
                    "ParameterValues": {"PreFitValue": 0.5},
                    "StepScale": {"MCMC": 1.0},
                    "Error": 0.5,
                    "ParameterBounds": [0.0, 1.0],
                    "FlatPrior": True,
                    "Type": "Norm",
                }
            }
        ]
    )
    init = np.full((8, 1), 0.5)
    fitter = MR2T2(model, MCMCConfig(chunk_size=500), init, seed=6)
    out = fitter.run(n_steps=3000)
    draws = out["theta"][500:].reshape(-1)
    assert draws.min() >= 0.0 and draws.max() <= 1.0
    # Uniform moments: mean 0.5, std sqrt(1/12)~0.2887
    assert np.mean(draws) == pytest.approx(0.5, abs=0.03)
    assert np.std(draws) == pytest.approx(0.2887, rel=0.1)


def test_out_of_bounds_never_accepted():
    model, ps = _prior_only_model([_gauss_param("a", 0.0, 5.0, step=1.0, bounds=(-1, 1))])
    init = np.zeros((4, 1))
    fitter = MR2T2(model, MCMCConfig(chunk_size=200), init, seed=7)
    out = fitter.run(n_steps=1000)
    assert np.all(np.abs(out["theta"]) <= 1.0)


def test_adaptive_covariance_converges_to_target():
    """Pooled Haario adaptation should approach the true posterior covariance."""
    model, ps = _prior_only_model(
        [
            _gauss_param("a", 0.0, 1.0, step=0.05),  # deliberately bad initial scale
            _gauss_param("b", 0.0, 3.0, step=0.05),
        ]
    )
    init = np.zeros((32, 2))
    cfg = MCMCConfig(
        adaptive=True,
        adaption_start_update=50,
        adaption_start_throw=300,
        adaption_update_step=50,
        chunk_size=250,
    )
    fitter = MR2T2(model, cfg, init, seed=8)
    fitter.run(n_steps=3000)
    ad = fitter.state.adaptive
    cov = np.asarray(ad.cov)
    # diag should approach [1, 9]
    assert cov[0, 0] == pytest.approx(1.0, rel=0.35)
    assert cov[1, 1] == pytest.approx(9.0, rel=0.35)
    assert abs(cov[0, 1]) < 1.0
    # acceptance should be healthy after adaptation
    acc_late = fitter.acceptance_rate.mean()
    assert acc_late > 0.1


def test_annealing_cools_to_greedy():
    """Reference annealing (``MR2T2.cpp:103-115``): acc = exp(-dL/exp(-step/T)),
    so the effective temperature exp(-step/T) decays with step — the sampler
    becomes greedy (accepting only downhill moves) as it cools."""
    model, ps = _prior_only_model([_gauss_param("a", 0.0, 1.0, step=3.0)])
    init = np.full((8, 1), 3.0)  # start uphill
    annealed = MR2T2(model, MCMCConfig(anneal_temp=100.0, chunk_size=200), init, seed=9)
    cold = MR2T2(model, MCMCConfig(chunk_size=200), init, seed=9)
    out_a = annealed.run(n_steps=800)
    out_c = cold.run(n_steps=800)
    # late acceptance lower than plain Metropolis (greedy phase)
    assert out_a["accepted"][600:].mean() < out_c["accepted"][600:].mean()
    # and it has descended towards the mode
    assert np.abs(out_a["theta"][-1]).mean() < 1.5


def test_resume_continues_chain():
    """Chunked runs resume exactly: state carries across run() calls."""
    model, ps = _prior_only_model([_gauss_param("a", 0.0, 1.0)])
    init = np.zeros((4, 1))
    f1 = MR2T2(model, MCMCConfig(chunk_size=100), init, seed=10)
    f1.run(n_steps=100)
    step_mid = int(f1.state.step)
    f1.run(n_steps=100)
    assert int(f1.state.step) == step_mid + 100


def test_record_breakdown_branches():
    """record_breakdown adds per-handler / per-sample -logL arrays whose sums
    reproduce the total (``FitterBase.cpp:185-197`` branch parity)."""
    import numpy as np
    from mach3_tpu.tutorial.toy import build_toy
    from mach3_tpu.fitters.mcmc import MR2T2, MCMCConfig

    toy = build_toy(n_events=500, seed=7)
    init = np.tile(np.asarray(toy.model.prefit_vector()), (4, 1))
    f = MR2T2(toy.model, MCMCConfig(chunk_size=10, record_breakdown=True), init, seed=0)
    out = f.run(n_steps=20)
    assert out["prior_nll_parts"].shape == (20, 4, 2)  # xsec + osc handlers
    assert out["sample_nll_parts"].shape == (20, 4, len(toy.samples))
    # On accepted steps the proposed pieces ARE the current state's pieces:
    acc = out["accepted"]
    total = out["prior_nll_parts"].sum(-1) + out["sample_nll_parts"].sum(-1)
    assert np.allclose(total[acc], out["nll"][acc], rtol=1e-10)


def test_toy_asimov_fit_recovers_truth():
    """End-to-end: adaptive MR2T2 on the toy with Asimov data recovers the
    generating parameters — posterior means consistent with truth and the
    truth covered by central intervals (the reference CI's FitterValidations
    purpose, ``.github/workflows/CIValidations.yml``)."""
    import numpy as np
    from mach3_tpu.diagnostics.processor import ChainProcessor
    from mach3_tpu.fitters.mcmc import MR2T2, MCMCConfig
    from mach3_tpu.tutorial.toy import build_toy

    toy = build_toy(n_events=1500, seed=21, e_grid_size=64)
    truth = np.asarray(toy.model.prefit_vector())
    n_chains = 24
    rng = np.random.default_rng(5)
    init = np.tile(truth, (n_chains, 1)) + 1e-3 * rng.normal(
        size=(n_chains, len(truth))
    )
    cfg = MCMCConfig(
        n_steps=4000, chunk_size=1000, adaptive=True,
        adaption_start_update=200, adaption_start_throw=800,
    )
    f = MR2T2(toy.model, cfg, init, seed=9)
    out = f.run()
    # acceptance in a workable band once adapted
    acc_late = out["accepted"][2000:].mean()
    assert 0.05 < acc_late < 0.6, acc_late

    proc = ChainProcessor(out["theta"], names=toy.names, burn_in=0.5)
    n_cover = 0
    free = 0
    for i, name in enumerate(toy.names):
        s = proc.summary(i)
        if s.arithmetic_std < 1e-12:  # fixed params
            continue
        free += 1
        lo, hi = proc.credible_interval(i, 0.9545)
        n_cover += int(lo <= truth[i] <= hi)
        # posterior mean within 5 posterior sigmas of truth (Asimov data)
        assert abs(s.arithmetic_mean - truth[i]) < 5 * s.arithmetic_std + 1e-12, name
    assert free >= 10
    assert n_cover >= int(0.8 * free), (n_cover, free)


def test_adaption_blocks_zero_cross_block_covariance():
    """MatrixBlocks semantics (``AdaptiveMCMCHandler::SetAdaptiveBlocks``):
    cross-block covariance entries are never learned."""
    import numpy as np
    from mach3_tpu.fitters.mcmc import MR2T2, MCMCConfig, adaption_block_mask
    from mach3_tpu.tutorial.toy import build_toy

    mask = adaption_block_mask(6, (( 0, 2), (2, 5)))
    m = np.asarray(mask)
    assert m[0, 1] == 1 and m[2, 4] == 1
    assert m[0, 2] == 0 and m[1, 4] == 0 and m[5, 0] == 0
    assert m[5, 5] == 1  # unassigned params form the default block

    toy = build_toy(n_events=800, seed=4)
    p = toy.model.n_params
    cfg = MCMCConfig(
        n_steps=300, chunk_size=100, adaptive=True,
        adaption_start_update=10, adaption_start_throw=50,
        adaption_update_step=50, adaption_blocks=((0, 10), (10, p)),
    )
    init = np.tile(np.asarray(toy.model.prefit_vector()), (8, 1))
    f = MR2T2(toy.model, cfg, init, seed=3)
    f.run()
    cov = np.asarray(f.state.adaptive.cov)
    assert np.all(cov[:10, 10:] == 0.0)
    assert np.all(cov[10:, :10] == 0.0)
    assert np.any(cov[:10, :10] != 0.0)

    with np.testing.assert_raises(ValueError):
        adaption_block_mask(4, ((0, 9),))


def test_run_zero_steps_returns_empty():
    """A non-positive resolved step count must not crash in the
    double-buffered drain (advisor r3: drain(None) raised TypeError): run()
    returns an empty dict and leaves the state untouched. (n_steps=0 at the
    CALL means 'use config.n_steps'.)"""
    m, _ = _prior_only_model([_gauss_param("a", 0.0, 1.0)])
    f = MR2T2(m, MCMCConfig(n_steps=0, chunk_size=5), np.zeros((4, 1)), seed=0)
    assert f.run() == {}
    assert f.run(n_steps=-3) == {}
    assert int(f.state.step) == 0


def test_baked_chunk_runner_rejects_swapped_model():
    """The baked fast path ignores the call-time model; passing a different
    model pytree must raise instead of silently using the stale bake."""
    from mach3_tpu.fitters.mcmc import make_chunk_runner

    m, _ = _prior_only_model([_gauss_param("a", 0.0, 1.0)])
    m2, _ = _prior_only_model([_gauss_param("a", 0.5, 2.0)])
    runner = make_chunk_runner(lambda mdl, s, n: s, m)
    runner(m, jnp.zeros(3), 1)  # construction-time model: fine
    with pytest.raises(ValueError, match="baked"):
        runner(m2, jnp.zeros(3), 1)
