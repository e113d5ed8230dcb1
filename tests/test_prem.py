"""PREM path geometry + atmospheric probability grids."""
import jax.numpy as jnp
import numpy as np
import pytest

from mach3_tpu.osc.prem import (
    EARTH_RADIUS_KM,
    PREM_COARSE,
    atmospheric_probabilities,
    path_through_earth,
)


def test_downgoing_path_is_short_vacuum():
    lengths, rho, ye = path_through_earth(np.array([1.0]))
    assert rho[0].max() == 0.0  # no earth matter
    assert lengths[0].sum() == pytest.approx(15.0, rel=1e-6)  # production height


def test_upgoing_through_core_length():
    lengths, rho, ye = path_through_earth(np.array([-1.0]))
    total = lengths[0].sum()
    # full diameter + production height
    assert total == pytest.approx(2 * EARTH_RADIUS_KM + 15.0, rel=1e-6)
    # hits the inner core density
    assert rho[0].max() == pytest.approx(13.0)
    # symmetric shell crossings: core flanked by mantle on both sides
    dens = rho[0][lengths[0] > 0]
    assert dens[1] == dens[-1]  # mantle symmetric (after air segment)


def test_horizontal_path_grazes():
    lengths, rho, ye = path_through_earth(np.array([-0.05]))
    total = lengths[0].sum()
    assert total < 2000.0  # grazing chord is short
    assert rho[0].max() <= 5.0  # never reaches the core


def test_total_length_continuity_across_horizon():
    l_above, _, _ = path_through_earth(np.array([0.0]))
    l_below, _, _ = path_through_earth(np.array([-0.001]))
    assert l_above[0].sum() == pytest.approx(l_below[0].sum(), rel=0.05)


def test_atmospheric_probability_grid():
    from mach3_tpu.osc import OscParams
    import jax.numpy as jnp

    params = OscParams.from_array(
        jnp.asarray([0.307, 0.022, 0.561, 0.0, 7.42e-5, 2.51e-3])
    )
    e = np.linspace(1.0, 10.0, 12)
    cz = np.array([0.5, -0.3, -0.9])
    p = np.asarray(atmospheric_probabilities(params, e, cz))
    assert p.shape == (3, 12, 3, 3)
    assert np.allclose(p.sum(axis=-1), 1.0, atol=1e-9)
    assert np.all((p >= -1e-10) & (p <= 1 + 1e-10))
    # Upward through the core differs strongly from downward
    assert not np.allclose(p[0], p[2], atol=0.01)


def test_matter_resonance_visible_in_core_crossing():
    """Up-going multi-GeV nu_mu -> nu_e transition is enhanced vs vacuum for
    normal ordering (MSW resonance in the mantle/core)."""
    from mach3_tpu.osc import OscParams, probabilities_const_density
    import jax.numpy as jnp

    params = OscParams.from_array(
        jnp.asarray([0.307, 0.022, 0.561, 0.0, 7.42e-5, 2.51e-3])
    )
    e = np.linspace(3.0, 10.0, 30)
    p_earth = np.asarray(
        atmospheric_probabilities(params, e, np.array([-0.8]))
    )[0, :, 1, 0]
    lengths, _, _ = path_through_earth(np.array([-0.8]))
    p_vac = np.asarray(
        probabilities_const_density(params, jnp.asarray(e), length=float(lengths[0].sum()))
    )[:, 1, 0]
    assert p_earth.max() > p_vac.max() * 1.3


def test_layered_f32_matrices_match_f64_at_large_phase():
    """Range-reduced trig: f32 layered probabilities stay within ~1e-5 of the
    all-f64 path even at atmospheric λL ~ 1e3 rad (the f64 trig used to be
    the dominant TPU cost of the CUDAProb3-class path)."""
    from mach3_tpu.osc.prem import path_through_earth
    from mach3_tpu.osc.prob import OscParams, probabilities_layered

    cosz = np.linspace(-1.0, -0.2, 5)
    lengths, rho, ye = path_through_earth(cosz, production_height_km=15.0)
    e = jnp.asarray(np.geomspace(0.5, 50.0, 40))
    p = OscParams.from_array(
        jnp.asarray([0.307, 0.022, 0.561, -1.601, 7.42e-5, 2.51e-3])
    )
    p64 = probabilities_layered(
        p, e, jnp.asarray(lengths), jnp.asarray(rho * (ye / 0.5)), dtype=jnp.float64
    )
    p32 = probabilities_layered(
        p, e, jnp.asarray(lengths), jnp.asarray(rho * (ye / 0.5)), dtype=jnp.float32
    )
    err = float(jnp.max(jnp.abs(p64 - p32.astype(jnp.float64))))
    assert err < 2e-4, err
    # unitarity preserved in f32
    rows = jnp.sum(p32, axis=-1)
    assert float(jnp.max(jnp.abs(rows - 1.0))) < 1e-4
