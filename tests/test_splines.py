"""Spline coefficient + monolith evaluation tests (reference semantics:
``Splines/SplineStructs.h``, ``Splines/SplineMonolith.cpp``)."""
import numpy as np
import pytest

from mach3_tpu.params import SplineInterpolation
from mach3_tpu.splines.coefficients import (
    akima_coefficients,
    build_coefficients,
    evaluate_spline_np,
    linear_coefficients,
    monotonic_coefficients,
    natural_cubic_coefficients,
)
from mach3_tpu.splines.monolith import (
    SplineParamSpec,
    build_dense_table,
    build_sparse_table,
)
from mach3_tpu.splines.eval import eval_dense, eval_sparse, find_segments

import jax.numpy as jnp


X = np.array([-3.0, -1.0, 0.0, 1.0, 3.0])
Y = np.array([0.7, 0.9, 1.0, 1.15, 1.6])


def test_natural_cubic_matches_scipy():
    from scipy.interpolate import CubicSpline

    cs = CubicSpline(X, Y, bc_type="natural")
    b, c, d = natural_cubic_coefficients(X, Y)
    xq = np.linspace(-3, 3, 101)
    ours = evaluate_spline_np(X, Y, b, c, d, xq)
    assert np.allclose(ours, cs(xq), atol=1e-10)


def test_akima_matches_scipy():
    from scipy.interpolate import Akima1DInterpolator

    ak = Akima1DInterpolator(X, Y)
    b, c, d = akima_coefficients(X, Y)
    xq = np.linspace(-3, 3, 101)
    ours = evaluate_spline_np(X, Y, b, c, d, xq)
    assert np.allclose(ours, ak(xq), atol=1e-9)


def test_linear_exact_at_midpoints():
    b, c, d = linear_coefficients(X, Y)
    xq = 0.5 * (X[:-1] + X[1:])
    ours = evaluate_spline_np(X, Y, b, c, d, xq)
    expected = 0.5 * (Y[:-1] + Y[1:])
    assert np.allclose(ours, expected)
    assert np.all(c == 0) and np.all(d == 0)


def test_all_families_interpolate_knots():
    for interp in SplineInterpolation:
        b, c, d = build_coefficients(X, Y, interp)
        vals = evaluate_spline_np(X, Y, b, c, d, X[:-1])  # interior knot starts
        assert np.allclose(vals, Y[:-1], atol=1e-12), interp
        # continuity at knots from the left
        eps = 1e-9
        left = evaluate_spline_np(X, Y, b, c, d, X[1:-1] - eps)
        assert np.allclose(left, Y[1:-1], atol=1e-6), interp


def test_monotonic_preserves_monotonicity():
    y_mono = np.array([0.0, 0.1, 0.5, 0.9, 1.0])
    b, c, d = monotonic_coefficients(X, y_mono)
    xq = np.linspace(-3, 3, 1001)
    vals = evaluate_spline_np(X, y_mono, b, c, d, xq)
    assert np.all(np.diff(vals) >= -1e-12)
    # and within the knot envelope per segment
    assert vals.min() >= -1e-12 and vals.max() <= 1.0 + 1e-12


def test_monotonic_zero_tangent_at_extremum():
    y_bump = np.array([0.0, 1.0, 2.0, 1.0, 0.0])
    b, c, d = monotonic_coefficients(X, y_bump)
    xq = np.linspace(-3, 3, 1001)
    vals = evaluate_spline_np(X, y_bump, b, c, d, xq)
    assert vals.max() <= 2.0 + 1e-12  # no overshoot past the peak knot


def test_find_segments_clamps():
    knots = jnp.asarray(np.array([[0.0, 1.0, 2.0, np.inf]], np.float32))
    nk = jnp.asarray([3])
    seg, t = find_segments(knots, nk, jnp.asarray([1.5]))
    assert int(seg[0]) == 1 and float(t[0]) == pytest.approx(0.5)
    seg, t = find_segments(knots, nk, jnp.asarray([-5.0]))
    assert int(seg[0]) == 0 and float(t[0]) == pytest.approx(-5.0)
    seg, t = find_segments(knots, nk, jnp.asarray([99.0]))
    assert int(seg[0]) == 1  # clamped to n_knots - 2


def _toy_specs(n_events=50, seed=0):
    rng = np.random.default_rng(seed)
    specs = []
    # param 0: spline for every event, 5 knots
    y0 = 1.0 + 0.1 * rng.normal(size=(n_events, 5)).cumsum(axis=1)
    specs.append(
        SplineParamSpec(
            name="p0",
            param_index=2,
            x_knots=np.array([-2.0, -1.0, 0.0, 1.0, 2.0]),
            event_ids=np.arange(n_events),
            y_knots=y0,
        )
    )
    # param 1: spline for half the events, 3 knots, some flat
    ids = np.arange(0, n_events, 2)
    y1 = 1.0 + 0.2 * rng.normal(size=(len(ids), 3))
    y1[::5] = 1.0  # flat splines -> dropped in sparse table
    specs.append(
        SplineParamSpec(
            name="p1",
            param_index=4,
            x_knots=np.array([-3.0, 0.0, 3.0]),
            event_ids=ids,
            y_knots=y1,
            interpolation=SplineInterpolation.MONOTONIC,
        )
    )
    return specs


def _numpy_oracle(specs, n_events, full_params):
    total = np.ones(n_events)
    for spec in specs:
        val = full_params[spec.param_index]
        y = np.asarray(spec.y_knots, float)
        b, c, d = build_coefficients(spec.x_knots, y, spec.interpolation)
        for j, ev in enumerate(spec.event_ids):
            x = spec.x_knots
            seg = np.clip(np.searchsorted(x, val, side="right") - 1, 0, len(x) - 2)
            t = val - x[seg]
            w = y[j, seg] + b[j, seg] * t + c[j, seg] * t**2 + d[j, seg] * t**3
            total[ev] *= w
    return total


@pytest.mark.parametrize("value", [-1.3, 0.0, 0.7, 2.5, -4.0])
def test_dense_and_sparse_match_oracle(value):
    n_events = 50
    specs = _toy_specs(n_events)
    full_params = np.zeros(6)
    full_params[2] = value
    full_params[4] = value * 0.5

    dense = build_dense_table(specs, n_events)
    sparse = build_sparse_table(specs, n_events)
    pvec = jnp.asarray(full_params)

    # exact=True: the oracle validates COEFFICIENT CONSTRUCTION at f32;
    # the production evaluator's deviation-form bf16 numeric (~0.4% of
    # |resp - 1|, matching the fused kernels) is asserted separately.
    w_dense = np.asarray(eval_dense(dense, pvec, exact=True))
    w_sparse = np.asarray(eval_sparse(sparse, pvec))
    oracle = _numpy_oracle(specs, n_events, full_params)

    assert np.allclose(w_dense, oracle, rtol=2e-5)
    assert np.allclose(w_sparse, oracle, rtol=2e-5)
    assert np.allclose(w_dense, w_sparse, rtol=2e-5)
    # production (rounded) evaluator: within 0.5% of |resp-1| + f32 floor
    w_prod = np.asarray(eval_dense(dense, pvec))
    assert np.allclose(w_prod, oracle, rtol=8e-3, atol=1e-4)


def test_flat_param_values_give_unit_weight():
    n_events = 20
    specs = _toy_specs(n_events)
    # At the nominal point x=0 all knots were built around 1 but not exactly 1;
    # instead check that an all-flat spline param gives exactly 1.
    flat_spec = SplineParamSpec(
        name="flat",
        param_index=0,
        x_knots=np.array([-1.0, 0.0, 1.0]),
        event_ids=np.arange(n_events),
        y_knots=np.ones((n_events, 3)),
    )
    dense = build_dense_table([flat_spec], n_events)
    sparse = build_sparse_table([flat_spec], n_events)
    pvec = jnp.asarray(np.array([0.37]))
    assert np.allclose(np.asarray(eval_dense(dense, pvec)), 1.0)
    assert np.allclose(np.asarray(eval_sparse(sparse, pvec)), 1.0)
    # sparse table dropped every flat spline
    assert sparse.n_splines == 0


def test_knot_capping():
    n_events = 4
    spec = SplineParamSpec(
        name="capped",
        param_index=0,
        x_knots=np.array([-1.0, 0.0, 1.0]),
        event_ids=np.arange(n_events),
        y_knots=np.array([[5.0, 1.0, -3.0]] * n_events),
        knot_low=0.0,
        knot_high=2.0,
    )
    dense = build_dense_table([spec], n_events)
    w_low = np.asarray(eval_dense(dense, jnp.asarray([-1.0])))
    w_high = np.asarray(eval_dense(dense, jnp.asarray([1.0])))
    assert np.allclose(w_low, 2.0)  # capped from 5
    assert np.allclose(w_high, 0.0)  # capped from -3


def test_table_save_load_roundtrip(tmp_path):
    """Preprocessed-monolith fast path (``Splines/SplineMonolith.h:48-52``):
    tables round-trip through npz and evaluate identically."""
    from mach3_tpu.splines.monolith import load_table, save_table

    specs = _toy_specs()
    n_events = 50
    theta = jnp.zeros(6).at[2].set(0.7).at[4].set(-1.3)

    dense = build_dense_table(specs, n_events)
    sparse = build_sparse_table(specs, n_events)
    f_d, f_s = str(tmp_path / "dense.npz"), str(tmp_path / "sparse.npz")
    save_table(f_d, dense)
    save_table(f_s, sparse)
    dense2 = load_table(f_d)
    sparse2 = load_table(f_s)
    assert type(dense2) is type(dense) and type(sparse2) is type(sparse)
    np.testing.assert_array_equal(np.asarray(dense.coeffs), np.asarray(dense2.coeffs))
    w1 = np.asarray(eval_dense(dense, theta))
    w2 = np.asarray(eval_dense(dense2, theta))
    np.testing.assert_array_equal(w1, w2)
    s1 = np.asarray(eval_sparse(sparse, theta))
    s2 = np.asarray(eval_sparse(sparse2, theta))
    np.testing.assert_array_equal(s1, s2)

    # Version guard
    import numpy as _np
    bad = {k: _np.asarray(v) for k, v in
           _np.load(f_d, allow_pickle=False).items()}
    bad["__format__"] = _np.int32(99)
    _np.savez(str(tmp_path / "bad.npz"), **bad)
    with pytest.raises(ValueError):
        load_table(str(tmp_path / "bad.npz"))


def test_tf1_table_eval():
    """Linear functional responses (``SplineStructs.h:192-193``:
    w = Par[1] + Par[0]*v), unit for unmatched events, floored at 0."""
    from mach3_tpu.splines.tf1 import TF1ParamSpec, build_tf1_table

    specs = [
        TF1ParamSpec("f0", param_index=2, event_ids=np.array([0, 2]),
                     slope=np.array([0.5, -2.0]), intercept=np.array([1.0, 1.0])),
        TF1ParamSpec("f1", param_index=5, event_ids=np.array([2]),
                     slope=np.array([1.0]), intercept=np.array([0.0])),
    ]
    table = build_tf1_table(specs, n_events=4)
    params = jnp.zeros(8).at[2].set(0.4).at[5].set(3.0)
    w = np.asarray(table.eval(params))
    # event 0: 1 + 0.5*0.4 = 1.2; event 1: unmatched -> 1
    # event 2: (1 - 2*0.4) * (0 + 1*3.0) = 0.2*3 = 0.6; event 3: 1
    np.testing.assert_allclose(w, [1.2, 1.0, 0.6, 1.0], rtol=1e-6)
    # floor at zero: v = 1 makes event 2's first response negative -> 0
    w2 = np.asarray(table.eval(jnp.zeros(8).at[2].set(1.0).at[5].set(3.0)))
    assert w2[2] == 0.0


def test_tf1_in_sample_model_batched():
    """TF1 weights flow through reweight and the batched (pallas-path
    selectable) reweight identically."""
    from mach3_tpu.splines.tf1 import TF1ParamSpec, build_tf1_table
    from mach3_tpu.tutorial.toy import build_toy

    toy = build_toy(n_events=600, seed=8)
    s = toy.samples[0].replace(use_pallas=False)
    n_ev = s.n_events
    rng = np.random.default_rng(1)
    spec = TF1ParamSpec(
        "ftest", param_index=0,
        event_ids=rng.choice(n_ev, size=n_ev // 3, replace=False),
        slope=np.full(n_ev // 3, 0.3), intercept=np.full(n_ev // 3, 1.0),
    )
    s_tf1 = s.replace(tf1_table=build_tf1_table([spec], n_ev))
    theta = toy.model.prefit_vector()
    mc0, _ = s.reweight(theta)
    mc1, _ = s_tf1.reweight(theta)
    # prefit value of param 0 is 1.0 -> matched events scaled by 1.3
    assert float(mc1.sum()) > float(mc0.sum())
    thetas = jnp.tile(theta[None, :], (3, 1))
    mcb, w2b = s_tf1.reweight_batch(thetas)
    np.testing.assert_allclose(np.asarray(mcb[0]), np.asarray(mc1), rtol=1e-5)


def test_low_memory_bf16_table():
    """bf16 dense table (the reference _LOW_MEMORY_STRUCTS_ analogue,
    ``Manager/Core.h:27-41``): responses within ~1e-2 of f32, round-trips
    through save/load."""
    rng = np.random.default_rng(3)
    n_events = 200
    spec = SplineParamSpec(
        name="p0", param_index=0,
        x_knots=np.array([-2.0, -1.0, 0.0, 1.0, 2.0]),
        event_ids=np.arange(n_events),
        y_knots=1.0 + 0.1 * rng.normal(size=(n_events, 5)).cumsum(axis=1),
    )
    t32 = build_dense_table([spec], n_events)
    t16 = build_dense_table([spec], n_events, low_memory=True)
    assert t16.coeffs.dtype == jnp.bfloat16
    params = jnp.asarray([0.37])
    r32 = np.asarray(eval_dense(t32, params), np.float64)
    r16 = np.asarray(eval_dense(t16, params).astype(jnp.float32), np.float64)
    np.testing.assert_allclose(r16, r32, rtol=2e-2, atol=2e-2)

    import tempfile, os
    from mach3_tpu.splines.monolith import load_table, save_table
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "t16.npz")
        save_table(path, t16)
        back = load_table(path)
        assert back.coeffs.dtype == jnp.bfloat16
