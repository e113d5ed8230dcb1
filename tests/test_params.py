"""Parameter-set construction, prior likelihood, and proposal kernel tests
(reference semantics: ``Parameters/ParameterHandlerBase.cpp``)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mach3_tpu.core import ConfigError
from mach3_tpu.params import (
    ParameterSet,
    ParamType,
    PriorModel,
    circular_wrap,
    get_likelihood,
    prior_logl,
    propose_step,
)
from mach3_tpu.core.precision import LARGE_LOGL


def _param(name, prefit=0.0, error=1.0, step=1.0, bounds=(-10, 10), **extra):
    syst = {
        "Names": {"FancyName": name},
        "ParameterValues": {"PreFitValue": prefit},
        "StepScale": {"MCMC": step},
        "Error": error,
        "ParameterBounds": list(bounds),
        "Type": "Norm",
    }
    syst.update(extra)
    return {"Systematic": syst}


def make_simple_set():
    cfg = {
        "Systematics": [
            _param("a", prefit=1.0, error=0.5),
            _param(
                "b",
                prefit=0.0,
                error=2.0,
                Correlations=[{"c": 0.5}],
            ),
            _param(
                "c",
                prefit=-1.0,
                error=1.0,
                Correlations=[{"b": 0.5}],
            ),
            _param("flat", prefit=0.0, error=1.0, FlatPrior=True),
        ]
    }
    return ParameterSet.from_config(cfg)


def test_covariance_built_from_errors_and_correlations():
    ps = make_simple_set()
    cov = ps.covariance
    assert cov[0, 0] == pytest.approx(0.25)
    assert cov[1, 1] == pytest.approx(4.0)
    assert cov[1, 2] == pytest.approx(0.5 * 2.0 * 1.0)
    assert cov[2, 1] == cov[1, 2]
    assert cov[0, 1] == 0.0


def test_nonreciprocal_correlation_raises():
    cfg = {
        "Systematics": [
            _param("x", Correlations=[{"y": 0.3}]),
            _param("y"),
        ]
    }
    with pytest.raises(ConfigError):
        ParameterSet.from_config(cfg)


def test_disagreeing_correlation_raises():
    cfg = {
        "Systematics": [
            _param("x", Correlations=[{"y": 0.3}]),
            _param("y", Correlations=[{"x": 0.4}]),
        ]
    }
    with pytest.raises(ConfigError):
        ParameterSet.from_config(cfg)


def test_prior_logl_quadratic_form_with_flat_prior():
    ps = make_simple_set()
    model = PriorModel.from_parameter_set(ps)
    prop = jnp.array([1.5, 1.0, -0.5, 99.0])  # flat param value must not matter
    # Manual: 0.5 * d^T Vinv d over non-flat block
    d = np.array([0.5, 1.0, 0.5])
    vinv = np.linalg.inv(ps.covariance[:3, :3])
    expected = 0.5 * d @ vinv @ d
    got = float(prior_logl(model, prop))
    assert got == pytest.approx(expected, rel=1e-10)
    # Flat parameter indeed free: huge excursion changes nothing
    prop2 = prop.at[3].set(1e6)
    # (still within bounds? bounds are +-10 -> use get_likelihood on in-bounds value)
    assert float(prior_logl(model, prop2)) == pytest.approx(got)


def test_out_of_bounds_sentinel():
    ps = make_simple_set()
    model = PriorModel.from_parameter_set(ps)
    inside = jnp.array([1.0, 0.0, -1.0, 0.0])
    outside = jnp.array([100.0, 0.0, -1.0, -100.0])  # 2 params outside
    assert float(get_likelihood(model, inside)) < LARGE_LOGL
    assert float(get_likelihood(model, outside)) == pytest.approx(2 * LARGE_LOGL)


def test_circular_wrap_matches_reference_fmod():
    # Reference: CircularParBounds (ParameterHandlerBase.cpp:769-778)
    lo, hi = -np.pi, np.pi
    vals = np.array([3.5, -3.5, 0.1, np.pi + 0.001, -np.pi - 0.001, 7.0, -9.0])

    def oracle(v):
        if v > hi:
            return lo + np.fmod(v - hi, hi - lo)
        elif v < lo:
            return hi - np.fmod(lo - v, hi - lo)
        return v

    got = circular_wrap(jnp.asarray(vals), jnp.full(7, lo), jnp.full(7, hi))
    for g, v in zip(np.asarray(got), vals):
        assert g == pytest.approx(oracle(v), abs=1e-12)
        assert lo <= g <= hi


def test_proposal_moments_match_throw_matrix():
    """Empirical covariance of proposal deltas ~ scale^2 * chol chol^T."""
    ps = make_simple_set()
    ps.global_step_scale = 0.5
    model = PriorModel.from_parameter_set(ps)
    current = jnp.asarray(ps.prefit)
    keys = jax.random.split(jax.random.key(0), 4000)
    props = jax.vmap(lambda k: propose_step(model, current, k))(keys)
    deltas = np.asarray(props) - np.asarray(current)
    emp_cov = np.cov(deltas.T)
    scale = np.asarray(model.step_scale)
    expected = ps.covariance * np.outer(scale, scale)
    assert np.allclose(emp_cov, expected, atol=0.15 * np.max(expected))


def test_fixed_parameter_never_moves():
    ps = make_simple_set()
    ps.fix_parameter("b")
    model = PriorModel.from_parameter_set(ps)
    current = jnp.asarray(ps.prefit)
    keys = jax.random.split(jax.random.key(1), 100)
    props = jax.vmap(lambda k: propose_step(model, current, k))(keys)
    assert np.all(np.asarray(props)[:, 1] == ps.prefit[1])


def test_flip_proposal_flips_half_the_time():
    cfg = {
        "Systematics": [
            _param(
                "dm32",
                prefit=2.5e-3,
                error=1e-4,
                step=0.0,  # no Gaussian movement, isolate the flip
                bounds=(-1, 1),
                SpecialProposal={"FlipParameter": 0.0},
            ),
        ]
    }
    ps = ParameterSet.from_config(cfg)
    model = PriorModel.from_parameter_set(ps)
    current = jnp.asarray(ps.prefit)
    keys = jax.random.split(jax.random.key(2), 2000)
    props = np.asarray(jax.vmap(lambda k: propose_step(model, current, k))(keys))
    flipped = np.sum(props[:, 0] < 0)
    assert 800 < flipped < 1200  # ~50%
    assert np.allclose(np.abs(props[:, 0]), 2.5e-3)


def test_circular_bound_proposal_stays_in_range():
    cfg = {
        "Systematics": [
            _param(
                "dcp",
                prefit=0.0,
                error=2.0,
                bounds=(-3.15, 3.15),
                SpecialProposal={"CircularBounds": [-np.pi, np.pi]},
            ),
        ]
    }
    ps = ParameterSet.from_config(cfg)
    model = PriorModel.from_parameter_set(ps)
    current = jnp.asarray(ps.prefit)
    keys = jax.random.split(jax.random.key(3), 1000)
    props = np.asarray(jax.vmap(lambda k: propose_step(model, current, k))(keys))
    assert np.all(props >= -np.pi) and np.all(props <= np.pi)


def test_typed_metadata_and_sample_filter():
    cfg = {
        "Systematics": [
            _param("norm1", SampleNames=["nd"], Mode=[0, 1], TargetNuclei=[12]),
            _param("spl1", Type="Spline", SplineInformation={"SplineName": "s1"}),
            _param("osc1", Type="Osc"),
        ]
    }
    ps = ParameterSet.from_config(cfg)
    assert [m.name for m in ps.of_type(ParamType.NORM)] == ["norm1"]
    assert ps.of_type(ParamType.NORM, sample_name="fd") == []
    assert ps.of_type(ParamType.NORM, sample_name="nd")[0].modes == [0, 1]
    assert ps.of_type(ParamType.SPLINE)[0].spline_name == "s1"
    assert len(ps.of_type(ParamType.OSC)) == 1


def test_cli_override_and_merge():
    from mach3_tpu.core import Config

    cfg = Config({"General": {"MCMC": {"NSteps": 100}}})
    cfg.override("General:MCMC:NSteps:50000", "General:OutputFile:out.h5")
    assert cfg.get("General.MCMC.NSteps") == 50000
    assert cfg.get("General.OutputFile") == "out.h5"
    cfg.merge({"General": {"MCMC": {"AutoSave": 500}}})
    assert cfg.get("General.MCMC.NSteps") == 50000
    assert cfg.get("General.MCMC.AutoSave") == 500


def test_throw_matrix_override_full_and_subblock(tmp_path):
    """SetThrowMatrix semantics (``ParameterHandlerBase.cpp:158-236``): the
    proposal uses the throw matrix, the prior keeps the nominal covariance."""
    ps = make_simple_set()
    nominal = ps.covariance.copy()
    assert np.allclose(ps.throw_matrix, nominal)

    # Full override
    new = np.diag([0.1, 0.2, 0.3, 0.4]) ** 2
    ps.set_throw_matrix(new)
    assert np.allclose(ps.throw_matrix, new)
    assert np.allclose(ps.covariance, nominal)  # prior untouched

    # Sub-block override zeroes cross terms with the rest
    ps2 = make_simple_set()
    sub = np.array([[4.0, 1.0], [1.0, 9.0]])
    ps2.set_throw_submatrix(["b", "c"], sub)
    tm = ps2.throw_matrix
    ib, ic = ps2.index_of("b"), ps2.index_of("c")
    assert tm[ib, ib] == pytest.approx(4.0)
    assert tm[ic, ic] == pytest.approx(9.0)
    assert tm[ib, ic] == pytest.approx(1.0)
    ia = ps2.index_of("a")
    assert tm[ia, ib] == 0.0 and tm[ic, ia] == 0.0
    assert tm[ia, ia] == pytest.approx(nominal[ia, ia])

    # File round-trip with names -> sub-block path
    f = tmp_path / "throw.npz"
    np.savez(f, matrix=sub, names=np.asarray(["b", "c"]))
    ps3 = make_simple_set()
    ps3.set_throw_matrix_from_file(str(f))
    assert np.allclose(ps3.throw_matrix, ps2.throw_matrix)

    # Proposal respects the override: with a tiny diagonal throw matrix, the
    # proposal spread shrinks accordingly.
    ps4 = make_simple_set()
    ps4.set_throw_matrix(np.eye(4) * 1e-8)
    model = PriorModel.from_parameter_set(ps4)
    keys = jax.random.split(jax.random.key(0), 500)
    props = jax.vmap(lambda k: propose_step(model, model.prefit, k))(keys)
    assert float(jnp.std(props[:, 0])) < 1e-3

    with pytest.raises(ConfigError):
        ps.set_throw_matrix(np.eye(3))


def test_propose_step_z_injection():
    """``SetRandomThrow`` CI hook (``ParameterHandlerBase.h:68-74``): injected
    standard-normal throws reproduce chol @ z exactly (no flips configured)."""
    ps = make_simple_set()
    model = PriorModel.from_parameter_set(ps)
    z = jnp.asarray([1.0, -2.0, 0.5, 0.0])
    prop = propose_step(model, model.prefit, jax.random.key(3), z=z)
    expected = model.prefit + (model.chol @ z) * model.step_scale
    assert np.allclose(np.asarray(prop), np.asarray(expected))
