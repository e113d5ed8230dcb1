"""Automatic Pallas/XLA kernel routing (samples/routing.py).

The fused kernel's contract (``splines/pallas_reweight.py:20``) — large bin
counts, huge coefficient tables, or non-dense monoliths must take the XLA
path — is enforced at build time instead of by a caller flag (VERDICT r1
item 2; the reference's analogue is SMonolith choosing CPU/GPU eval at build,
``Splines/SplineMonolith.cpp``).
"""
import jax.numpy as jnp
import numpy as np
import pytest

from mach3_tpu.samples.routing import (
    MAX_MASKREDUCE_BINS,
    MAX_PALLAS_BINS,
    choose_kernel_route,
)
from mach3_tpu.splines.monolith import DenseSplineTable, SparseSplineTable


def _dense_table(p=4, k=7, e=1000):
    return DenseSplineTable(
        coeffs=jnp.zeros((p, k * 4, e), jnp.float32),
        knots_x=jnp.full((p, k), jnp.inf, jnp.float32),
        n_knots=jnp.full((p,), k, jnp.int32),
        param_index=jnp.arange(p, dtype=jnp.int32),
    )


def test_disabled_by_caller():
    r = choose_kernel_route(64, _dense_table(), True, False, requested=False)
    assert not r.use_pallas and r.variant == "xla"


def test_no_dense_table_routes_xla():
    sparse = SparseSplineTable(
        spline_coeffs=jnp.zeros((3, 5, 4), jnp.float32),
        spline_param=jnp.zeros((3,), jnp.int32),
        event_splines=jnp.zeros((10, 1), jnp.int32),
        knots_x=jnp.full((2, 5), jnp.inf, jnp.float32),
        n_knots=jnp.full((2,), 5, jnp.int32),
        param_index=jnp.arange(2, dtype=jnp.int32),
    )
    r = choose_kernel_route(64, sparse, True, False, requested=True)
    assert not r.use_pallas and "dense" in r.reason
    r = choose_kernel_route(64, None, True, False, requested=True)
    assert not r.use_pallas


def test_auto_on_cpu_routes_xla():
    # Tests run with the CPU backend forced; "auto" must not pick Mosaic.
    r = choose_kernel_route(64, _dense_table(), True, False, requested="auto")
    assert not r.use_pallas and "backend" in r.reason


def test_large_bin_count_falls_back_even_when_requested():
    r = choose_kernel_route(
        MAX_PALLAS_BINS + 1, _dense_table(), True, False, requested=True
    )
    assert not r.use_pallas and str(MAX_PALLAS_BINS) in r.reason


def test_maskreduce_bin_limit_applies_to_per_chain_bins_only():
    n = MAX_MASKREDUCE_BINS + 100  # > mask-reduce limit, < global limit
    shared = choose_kernel_route(n, _dense_table(), True, False, requested=True)
    assert shared.use_pallas and shared.variant == "shared"
    generic = choose_kernel_route(n, _dense_table(), False, False, requested=True)
    assert not generic.use_pallas
    shifted = choose_kernel_route(n, _dense_table(), False, True, requested=True)
    assert not shifted.use_pallas


def test_variant_selection():
    t = _dense_table()
    assert choose_kernel_route(40, t, True, False, requested=True).variant == "shared"
    assert choose_kernel_route(40, t, False, True, requested=True).variant == "shifted"
    assert choose_kernel_route(40, t, False, False, requested=True).variant == "generic"


def test_event_tile_shrinks_under_vmem_pressure():
    small = choose_kernel_route(40, _dense_table(p=4), True, False, requested=True)
    big = choose_kernel_route(40, _dense_table(p=120, k=10), True, False,
                              requested=True)
    assert big.use_pallas
    assert big.event_tile < small.event_tile


def test_large_param_count_takes_blocked_kernel():
    # Reference-scale P no longer falls back: the param-blocked kernel
    # streams coefficient blocks, so even P=800 routes to Pallas.
    r = choose_kernel_route(
        2000, _dense_table(p=800, k=20), True, False, requested=True
    )
    assert r.use_pallas and r.variant == "shared" and r.param_tile is not None
    # Small P keeps the unrolled kernel (no param tiling).
    r_small = choose_kernel_route(40, _dense_table(p=4), True, False,
                                  requested=True)
    assert r_small.use_pallas and r_small.param_tile is None
    # Unrolled-only variants (per-chain bins) DO fall back at large P.
    r_gen = choose_kernel_route(40, _dense_table(p=50), False, False,
                                requested=True)
    assert not r_gen.use_pallas and "spline params" in r_gen.reason


@pytest.mark.slow
def test_infeasible_vmem_falls_back():
    # A pathological knot count: even one [PT, K4, ET_min] streamed block
    # exceeds the VMEM budget.
    r = choose_kernel_route(
        2000, _dense_table(p=800, k=1200), True, False, requested=True
    )
    assert not r.use_pallas and "VMEM" in r.reason


def test_build_sample_model_records_route():
    from mach3_tpu.tutorial.toy import build_toy

    toy = build_toy(n_events=300, seed=5, use_pallas=True)
    s = toy.samples[0]
    assert s.kernel_route is not None
    assert s.kernel_route.use_pallas == s.use_pallas
    assert s.kernel_route.requested is True
    # Toy samples precompute static bins or a kernel shift; either way the
    # route must be a real Pallas variant at toy scale.
    assert s.kernel_route.variant in ("shared", "shifted", "generic")

    auto = build_toy(n_events=300, seed=5, use_pallas="auto")
    for sm in auto.samples:
        assert sm.kernel_route is not None
        assert not sm.use_pallas  # CPU backend -> XLA


def test_with_binning_reroutes():
    from mach3_tpu.samples.binning import SampleBinning
    from mach3_tpu.tutorial.toy import build_toy

    toy = build_toy(n_events=300, seed=5, use_pallas=True)
    s = toy.samples[0]
    # A bin count past the global limit must flip the route to XLA.
    edges = [np.linspace(0.0, 5.0, MAX_PALLAS_BINS + 2)]
    big = SampleBinning.build(edges, np.asarray(s.binning.axis_vars).tolist()[:1])
    s2 = s.with_binning(big)
    assert not s2.use_pallas and s2.kernel_route.variant == "xla"


def test_routed_sample_still_correct():
    """A sample routed to XLA by bin count gives the same answer as vmapped
    reweight (guards against routing changing physics)."""
    from mach3_tpu.tutorial.toy import build_toy

    toy = build_toy(n_events=400, seed=7, use_pallas="auto")
    s = toy.samples[0]
    theta0 = toy.model.prefit_vector()
    thetas = jnp.tile(theta0[None, :], (3, 1))
    mc_b, w2_b = s.reweight_batch(thetas)
    mc_s, w2_s = s.reweight(theta0)
    np.testing.assert_allclose(np.asarray(mc_b[0]), np.asarray(mc_s), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(w2_b[2]), np.asarray(w2_s), rtol=1e-6)
