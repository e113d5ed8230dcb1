"""The 700-parameter / 7-sample envelope fixture (reduced size for CPU).

SURVEY §0 frames the reference workload as 10-700 dimensional
(``Splines/SplineMonolith.cpp:53-250`` is built for events x params spline
counts); this exercises the full-size fixture's structure — parameter count,
sample partition, norm-matrix compression — at test-size event counts. The
full 1M-event version is benchmarked on hardware (bench.py "large700").
"""
import pytest
import jax
import jax.numpy as jnp
import numpy as np

from mach3_tpu.tutorial.large import build_large700


@pytest.mark.slow
def test_large700_reduced_structure_and_nll():
    exp = build_large700(
        n_numu=3000, n_nue=1000, n_atmo=3000, e_grid_size=40,
        atmo_e_grid_size=12, atmo_cosz_grid_size=8,
    )
    assert exp.n_params == 700
    assert len(exp.samples) == 7
    assert sum(s.n_events for s in exp.samples) == 17_000

    # Norm compression engaged: each sample's extended norm axis is the ~25
    # applied params, not NP+1=701 (the [NP+1, E] matrix at full size would
    # be ~3 GB/sample; compressed it is tens of MB).
    for s in exp.samples:
        assert s.norm_applied is not None
        assert s.norm_s is not None
        assert s.norm_s.shape[0] <= 40, (s.name, s.norm_s.shape)

    # Sample-partitioned splines: every spline parameter lands in exactly
    # one sample's monolith; together they cover all 655.
    counts = [s.spline_table.coeffs.shape[0] for s in exp.samples]
    assert sum(counts) == 655
    assert all(80 <= c <= 110 for c in counts), counts

    # Full likelihood is finite at prefit and under a small jitter, and the
    # Asimov fit's NLL at prefit is the best (data == MC there).
    rng = np.random.default_rng(0)
    theta0 = np.asarray(exp.model.prefit_vector())
    thetas = np.tile(theta0, (3, 1))
    thetas[1] += 1e-3 * rng.normal(size=700)
    thetas[2] += 1e-3 * rng.normal(size=700)
    nll = np.asarray(
        jax.jit(lambda m, t: m.total_nll_batch(t))(exp.model, jnp.asarray(thetas))
    )
    assert np.all(np.isfinite(nll))
    assert nll[0] <= nll[1] + 1e-6 and nll[0] <= nll[2] + 1e-6


@pytest.mark.slow
def test_large700_gradient_path_finite():
    """The differentiable path must survive 700 params (the shared-route
    VMEM guard may reroute, but gradients stay finite and nonzero)."""
    exp = build_large700(
        n_numu=1500, n_nue=600, n_atmo=1500, e_grid_size=30,
        atmo_e_grid_size=10, atmo_cosz_grid_size=6,
    )
    theta0 = jnp.asarray(np.tile(np.asarray(exp.model.prefit_vector()), (2, 1)))
    g = jax.jit(
        lambda m, t: jax.grad(lambda tt: jnp.sum(m.log_posterior_batch(tt)))(t)
    )(exp.model, theta0)
    g = np.asarray(g)
    assert np.all(np.isfinite(g))
    assert np.count_nonzero(g) > 700  # spline + norm + osc directions all live
