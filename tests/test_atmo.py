"""Atmospheric sample path: layered-PREM osc weights wired into a sample."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mach3_tpu.samples.events import EventData, build_atmo_osc_config, build_sample_model


@pytest.fixture(scope="module")
def atmo_sample():
    rng = np.random.default_rng(4)
    n = 3000
    e_true = rng.gamma(2.0, 2.0, n) + 0.5
    cosz = rng.uniform(-1, 1, n)
    ev = EventData(
        kinematics={
            "e_true": e_true,
            "e_reco": e_true * (1 + 0.1 * rng.normal(size=n)),
            "cos_zenith": cosz,
        },
        mode=np.zeros(n, np.int32),
        target=np.full(n, 8, np.int32),
        pdg=np.where(rng.random(n) < 0.7, 14, -14).astype(np.int32),
        preosc_pdg=np.zeros(n, np.int32),
        mc_weight=np.ones(n),
    )
    ev.preosc_pdg[:] = ev.pdg  # numu survival channels only
    cfg = build_atmo_osc_config(
        ev,
        e_grid=np.linspace(0.5, 20.0, 40),
        cosz_grid=np.linspace(-0.99, 0.99, 20),
        osc_param_gidx=[0, 1, 2, 3, 4, 5],
    )
    sm = build_sample_model(
        "atmo",
        ev,
        var_order=["e_true", "e_reco", "cos_zenith"],
        binning_edges=[np.linspace(0.0, 25.0, 11), np.linspace(-1, 1, 6)],
        binning_vars=["e_reco", "cos_zenith"],
        n_total_params=6,
        osc=cfg,
    )
    return ev, sm


PDG_OSC = jnp.asarray([0.307, 0.022, 0.561, 0.0, 7.42e-5, 2.51e-3])


def test_atmo_weights_physical(atmo_sample):
    ev, sm = atmo_sample
    w = np.asarray(jax.jit(sm._osc_weights)(PDG_OSC))
    assert np.all((w >= -1e-6) & (w <= 1 + 1e-6))
    # up-going low-E numu oscillate strongly; down-going high-E survive
    up_lowe = (ev.kinematics["cos_zenith"] < -0.6) & (ev.kinematics["e_true"] < 3)
    down_hie = (ev.kinematics["cos_zenith"] > 0.6) & (ev.kinematics["e_true"] > 10)
    assert w[up_lowe].mean() < 0.75
    assert w[down_hie].mean() > 0.9


def test_atmo_full_reweight_and_2d_binning(atmo_sample):
    ev, sm = atmo_sample
    mc, w2 = jax.jit(sm.reweight)(PDG_OSC)
    assert mc.shape == (50,)
    assert float(mc.sum()) > 0
    # oscillations deplete the total relative to no-osc weights
    assert float(mc.sum()) < ev.n_events


@pytest.mark.slow
def test_atmo_theta23_sensitivity(atmo_sample):
    ev, sm = atmo_sample
    mc_a, _ = jax.jit(sm.reweight)(PDG_OSC)
    shifted = PDG_OSC.at[2].set(0.40)
    mc_b, _ = jax.jit(sm.reweight)(shifted)
    assert not np.allclose(np.asarray(mc_a), np.asarray(mc_b), rtol=1e-3)


def test_production_height_averaging(atmo_sample):
    """CUDAProb3-style production-height averaging: a single-node quadrature
    equals the fixed-height config exactly, and a two-node average equals the
    manual weighted mean of the two single-height grids."""
    ev, _ = atmo_sample
    kwargs = dict(
        e_grid=np.linspace(0.5, 20.0, 10),
        cosz_grid=np.linspace(-0.99, 0.99, 5),
        osc_param_gidx=[0, 1, 2, 3, 4, 5],
    )
    fixed = build_atmo_osc_config(ev, production_height_km=15.0, **kwargs)
    one_node = build_atmo_osc_config(ev, production_heights=[15.0], **kwargs)
    p_fixed = fixed.prob_grids(PDG_OSC)[0]
    p_one = one_node.prob_grids(PDG_OSC)[0]
    np.testing.assert_allclose(np.asarray(p_one), np.asarray(p_fixed), atol=1e-12)

    lo = build_atmo_osc_config(ev, production_height_km=10.0, **kwargs)
    hi = build_atmo_osc_config(ev, production_height_km=25.0, **kwargs)
    avg = build_atmo_osc_config(
        ev, production_heights=[10.0, 25.0], height_weights=[0.3, 0.7], **kwargs
    )
    p_manual = 0.3 * np.asarray(lo.prob_grids(PDG_OSC)[0]) + 0.7 * np.asarray(
        hi.prob_grids(PDG_OSC)[0]
    )
    p_avg = np.asarray(avg.prob_grids(PDG_OSC)[0])
    np.testing.assert_allclose(p_avg, p_manual, atol=1e-6)
    # the average must actually differ from either endpoint (heights matter)
    assert not np.allclose(p_avg, np.asarray(lo.prob_grids(PDG_OSC)[0]), atol=1e-6)


@pytest.mark.slow
def test_zenith_group_split_matches_full_chain(atmo_sample):
    """The static zenith partition (per-group unroll depth) must reproduce the
    full padded NL-layer chain bit-for-bit in structure: same grids, same
    per-event weights."""
    ev, sm = atmo_sample
    cfg = sm.osc
    assert cfg.z_groups is not None and len(cfg.z_groups) > 1
    # every zenith bin appears exactly once across groups
    all_idx = sorted(i for idxs, _ in cfg.z_groups for i in idxs)
    assert all_idx == list(range(cfg.layer_lengths.shape[-2]))
    # down-going bins form a short group (1 air segment)
    assert min(nl for _, nl in cfg.z_groups) == 1
    full = cfg.replace(z_groups=None)
    p_g = np.asarray(cfg.prob_grids(PDG_OSC)[0])
    p_f = np.asarray(full.prob_grids(PDG_OSC)[0])
    np.testing.assert_allclose(p_g, p_f, atol=1e-6)
    w_g = np.asarray(jax.jit(sm._osc_weights)(PDG_OSC))
    w_f = np.asarray(jax.jit(sm.replace(osc=full)._osc_weights)(PDG_OSC))
    np.testing.assert_allclose(w_g, w_f, atol=1e-6)
