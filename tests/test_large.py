"""Reference-scale fixture (tutorial/large.py) at CPU-test scale.

Validates the structural claims of VERDICT r1 item 1: 100+ parameters, three
samples including a 2-D atmospheric one, 1,000+ bin binnings, automatic
routing of each sample to the right kernel, and physics consistency of the
scale paths (log-matmul norm product, param-blocked kernel) against the
small-scale reference paths.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mach3_tpu.tutorial.large import build_large


@pytest.fixture(scope="module")
def large():
    return build_large(
        n_numu=4000, n_nue=1500, n_atmo=3000,
        e_grid_size=40, atmo_e_grid_size=20, atmo_cosz_grid_size=8,
    )


def test_shape_claims(large):
    assert large.n_params >= 100
    assert len(large.samples) == 3
    by_name = {s.name: s for s in large.samples}
    assert by_name["numu_beam"].n_bins >= 1000
    assert by_name["atmo"].n_bins >= 1000
    assert len(by_name["atmo"].binning.n_bins_axis) == 2  # (E, cosZ)
    # mixed interpolation families actually present
    from mach3_tpu.params.parameterset import ParamType
    fams = {m.spline_interpolation for m in large.xsec.of_type(ParamType.SPLINE)}
    assert len(fams) == 5
    n_spline = len(large.xsec.of_type(ParamType.SPLINE))
    assert n_spline >= 50


def test_routing_at_scale(large):
    """CPU build: all XLA. With Pallas requested every sample takes a
    param-BLOCKED kernel (shared for the static 2-D samples, shifted for the
    energy-scale nue sample) — P > 16 everywhere."""
    from mach3_tpu.samples.routing import choose_kernel_route

    for s in large.samples:
        assert s.kernel_route.variant == "xla"  # auto on CPU
        r = choose_kernel_route(
            s.n_bins, s.spline_table,
            has_static_bins=s.static_bins is not None,
            has_kernel_shift=s.kernel_shift is not None,
            requested=True,
        )
        assert r.use_pallas
        assert r.variant == ("shifted" if s.name == "nue_beam" else "shared")
        assert r.param_tile is not None  # P > 16 -> blocked kernel


def test_asimov_nll_zero_at_prefit(large):
    theta0 = large.model.prefit_vector()
    nll = jax.jit(large.model.total_nll_batch)(theta0[None, :])
    assert abs(float(nll[0])) < 1e-6


def test_norm_logmm_matches_onehot(large):
    """The log-matmul norm product (reference-scale path) agrees with the
    one-hot MXU product including negative and zero parameter values."""
    s = next(x for x in large.samples if x.norm_onehot is not None and x.norm_s is not None)
    theta = np.array(large.model.prefit_vector())  # writable copy
    theta[3] = -0.5  # a flux norm negative
    theta[9] = 0.0  # another exactly zero
    theta = jnp.asarray(theta)
    w_oh = s._norm_weights(theta)
    w_lm = s.replace(norm_onehot=None)._norm_weights(theta)
    np.testing.assert_allclose(np.asarray(w_lm), np.asarray(w_oh), rtol=5e-5, atol=1e-6)


@pytest.mark.slow
def test_batched_reweight_finite_and_consistent(large):
    theta0 = large.model.prefit_vector()
    rng = np.random.default_rng(1)
    thetas = jnp.asarray(
        np.tile(np.asarray(theta0), (3, 1))
        + 0.02 * rng.normal(size=(3, large.n_params))
    )
    for s in large.samples:
        mc_b, w2_b = s.reweight_batch(thetas)
        assert np.all(np.isfinite(np.asarray(mc_b)))
        mc_s, _ = s.reweight(thetas[1])
        np.testing.assert_allclose(
            np.asarray(mc_b[1]), np.asarray(mc_s), rtol=1e-5, atol=1e-7,
            err_msg=s.name,
        )


def test_sample_restricted_splines(large):
    """Sample-restricted spline params must not appear in other samples'
    tables (SampleNames filtering, ``ParameterHandlerGeneric.h:57-83``)."""
    from mach3_tpu.params.parameterset import ParamType

    by_name = {s.name: s for s in large.samples}
    atmo_only = {
        m.index for m in large.xsec.of_type(ParamType.SPLINE)
        if m.sample_names and "atmo" in m.sample_names and "numu_beam" not in m.sample_names
    }
    assert atmo_only
    numu_params = set(np.asarray(by_name["numu_beam"].spline_table.param_index).tolist())
    assert not (atmo_only & numu_params)
    atmo_params = set(np.asarray(by_name["atmo"].spline_table.param_index).tolist())
    assert atmo_only & atmo_params


def test_flux_norm_kinematic_binning(large):
    """Flux norms are E_true-bin exclusive: each beam event matches exactly
    one numu-flux (or nue-flux) bin norm."""
    s = next(x for x in large.samples if x.name == "numu_beam")
    flux_idx = [large.xsec.index_of(f"flux_numu_{b}") for b in range(8)]
    ni = np.asarray(s.norm_idx)
    counts = np.isin(ni, flux_idx).sum(axis=1)
    pdg = None  # numu-flux events are preosc |14|
    # every event that is numu-flux matches exactly one bin norm; none matches two
    assert counts.max() <= 1
    assert counts.sum() > 0


def test_roofline_budget(large):
    """Roofline accounting (BASELINE.md 'speed-of-light per chip'): the
    byte/FLOP budget derives from real array shapes, components cover every
    sample, and the floors obey the two roofline laws."""
    from mach3_tpu.diagnostics.roofline import report

    rep = report(large.model, n_chains=128, measured_step_ms=25.0)
    assert rep["hbm_gbytes_per_step"] > 0
    assert rep["memory_floor_ms"] > 0
    assert rep["mxu_floor_ms"] >= 0
    # a memory-bound design: the memory floor dominates the MXU floor
    assert rep["memory_floor_ms"] > rep["mxu_floor_ms"]
    names = set(rep["components"])
    for s in large.samples:
        assert f"{s.name}:base_w" in names
        assert f"{s.name}:llh" in names
    assert any(n.endswith(":kernel") for n in names)
    assert any(n.endswith(":osc") for n in names)
    assert 0 < rep["fraction_of_memory_floor"] <= 1.5
    # component floors sum to the combined floor
    tot = sum(c["floor_ms"] for c in rep["components"].values())
    assert abs(tot - rep["combined_floor_ms"]) < 0.01 + 0.01 * tot
