"""Sample engine tests: binning, norm matching, reweighting, likelihood
(reference semantics: ``Samples/SampleHandlerFD.cpp``, ``BinningHandler``)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mach3_tpu.samples.binning import SampleBinning, histogram
from mach3_tpu.samples.events import (
    EventData,
    build_osc_config,
    build_sample_model,
    match_norm_params,
)
from mach3_tpu.samples.sample import ShiftSpec
from mach3_tpu.params.parameterset import KinematicCut, ParamMeta, ParamType


def test_binning_1d():
    b = SampleBinning.build([np.array([0.0, 1.0, 2.0, 4.0])], [0])
    kin = jnp.asarray([[0.5, 1.5, 3.9, -0.1, 4.0, 2.0]])
    bins = np.asarray(b.find_bins(kin))
    # -0.1 and 4.0 are out of range -> garbage bin 3
    assert list(bins) == [0, 1, 2, 3, 3, 2]


def test_binning_2d_row_major():
    b = SampleBinning.build(
        [np.array([0.0, 1.0, 2.0]), np.array([0.0, 10.0, 20.0, 30.0])], [0, 1]
    )
    assert b.n_bins == 6
    kin = jnp.asarray([[0.5, 1.5, 0.5], [5.0, 25.0, 35.0]])
    bins = np.asarray(b.find_bins(kin))
    assert bins[0] == 0  # (0, 0)
    assert bins[1] == 1 * 3 + 2  # (1, 2)
    assert bins[2] == 6  # overflow in axis 1


def test_histogram_sums_and_w2():
    w = jnp.asarray([1.0, 2.0, 3.0, 4.0])
    bins = jnp.asarray([0, 0, 1, 2], jnp.int32)
    mc, w2 = histogram(w, bins, 3)
    assert np.allclose(np.asarray(mc), [3.0, 3.0, 4.0])
    assert np.allclose(np.asarray(w2), [5.0, 9.0, 16.0])


def _events(n=10):
    return EventData(
        kinematics={
            "e_true": np.linspace(0.1, 2.0, n),
            "e_reco": np.linspace(0.1, 2.0, n),
        },
        mode=np.array([0, 1] * (n // 2), np.int32),
        target=np.full(n, 12, np.int32),
        pdg=np.full(n, 14, np.int32),
        preosc_pdg=np.full(n, 14, np.int32),
        mc_weight=np.ones(n),
    )


def test_norm_matching_by_mode_and_kinematics():
    ev = _events(10)
    metas = [
        (ParamMeta(name="n0", index=0, ptype=ParamType.NORM, modes=[0]), 5),
        (
            ParamMeta(
                name="n1",
                index=1,
                ptype=ParamType.NORM,
                kinematic_cuts=[KinematicCut("e_true", 0.0, 1.0)],
            ),
            7,
        ),
        (ParamMeta(name="all", index=2, ptype=ParamType.NORM), 9),
    ]
    idx = match_norm_params(ev, metas, "s")
    # event 0: mode 0, e_true 0.1 -> all three match
    assert set(idx[0]) == {5, 7, 9}
    # event 1: mode 1, e_true ~0.31 -> n1 and all
    assert set(x for x in idx[1] if x >= 0) == {7, 9}
    # last event: mode 1, e_true 2.0 -> only all
    assert set(x for x in idx[-1] if x >= 0) == {9}


def test_norm_weights_multiply():
    ev = _events(4)
    metas = [(ParamMeta(name="n0", index=0, ptype=ParamType.NORM, modes=[0]), 0)]
    idx = match_norm_params(ev, metas, "s")
    sm = build_sample_model(
        "s",
        ev,
        var_order=["e_true", "e_reco"],
        binning_edges=[np.array([0.0, 1.0, 2.5])],
        binning_vars=["e_reco"],
        n_total_params=2,
        norm_idx=idx,
    )
    mc0, _ = jax.jit(sm.reweight)(jnp.asarray([1.0, 0.0]))
    mc1, _ = jax.jit(sm.reweight)(jnp.asarray([2.0, 0.0]))
    # mode-0 events double, mode-1 events unchanged
    total0, total1 = float(mc0.sum()), float(mc1.sum())
    assert total1 == pytest.approx(total0 + 2.0)  # 2 mode-0 events x (+1 each)


def test_functional_shift_migrates_events():
    ev = _events(4)
    sm = build_sample_model(
        "s",
        ev,
        var_order=["e_true", "e_reco"],
        binning_edges=[np.array([0.0, 1.0, 2.5])],
        binning_vars=["e_reco"],
        n_total_params=1,
        shifts=[ShiftSpec(fn=lambda v, x, k: x * (1.0 + v), param_index=0, var_row=1)],
    )
    mc_nom, _ = jax.jit(sm.reweight)(jnp.asarray([0.0]))
    mc_up, _ = jax.jit(sm.reweight)(jnp.asarray([0.9]))
    # big upward energy scale pushes most events to higher bins / overflow
    assert float(mc_up.sum()) < float(mc_nom.sum())
    assert float(mc_up[0]) < float(mc_nom[0])


def test_osc_config_channels_and_nc():
    n = 6
    ev = EventData(
        kinematics={"e_true": np.linspace(0.3, 1.5, n), "e_reco": np.linspace(0.3, 1.5, n)},
        mode=np.array([0, 0, 0, 3, 0, 0], np.int32),
        target=np.full(n, 12, np.int32),
        pdg=np.array([14, 12, 14, 14, -14, 12], np.int32),
        preosc_pdg=np.array([14, 14, 14, 14, -14, 12], np.int32),
        mc_weight=np.ones(n),
    )
    cfg = build_osc_config(
        ev, np.linspace(0.1, 2.0, 50), [0, 1, 2, 3, 4, 5], 295.0, 2.6, nc_modes=[3]
    )
    assert cfg.chan_alpha.shape[0] == 4  # (14,14),(14,12),(-14,-14),(12,12)
    assert bool(cfg.nc_mask[3])
    assert not bool(cfg.nc_mask[0])


def test_osc_weights_against_direct_probability():
    """Sample osc weight should equal the probability at the snapped grid point."""
    from mach3_tpu.osc import OscParams, probabilities_const_density

    n = 5
    e_true = np.array([0.4, 0.6, 0.8, 1.0, 1.4])
    ev = EventData(
        kinematics={"e_true": e_true, "e_reco": e_true},
        mode=np.zeros(n, np.int32),
        target=np.full(n, 12, np.int32),
        pdg=np.full(n, 14, np.int32),
        preosc_pdg=np.full(n, 14, np.int32),
        mc_weight=np.ones(n),
    )
    grid = np.linspace(0.05, 2.0, 400)
    cfg = build_osc_config(ev, grid, [0, 1, 2, 3, 4, 5], 295.0, 2.6)
    sm = build_sample_model(
        "s",
        ev,
        var_order=["e_true", "e_reco"],
        binning_edges=[np.array([0.0, 3.0])],
        binning_vars=["e_reco"],
        n_total_params=6,
        osc=cfg,
    )
    pars = jnp.asarray([0.307, 0.022, 0.561, -1.601, 7.42e-5, 2.51e-3])
    w = np.asarray(sm._osc_weights(pars))
    op = OscParams.from_array(pars)
    gi = np.asarray(cfg.event_grid_idx)
    p = np.asarray(
        probabilities_const_density(op, jnp.asarray(grid), length=295.0, rho=2.6)
    )[gi, 1, 1]
    # sample path computes the grid in f32 (TPU policy) vs f64 direct here
    assert np.allclose(w, p, atol=5e-6)


def test_likelihood_zero_on_asimov():
    ev = _events(20)
    sm = build_sample_model(
        "s",
        ev,
        var_order=["e_true", "e_reco"],
        binning_edges=[np.array([0.0, 0.5, 1.0, 1.5, 2.5])],
        binning_vars=["e_reco"],
        n_total_params=1,
    )
    theta = jnp.asarray([0.0])
    sm = sm.with_data(sm.asimov_data(theta))
    assert float(jax.jit(sm.log_likelihood)(theta)) == pytest.approx(0.0, abs=1e-10)


def test_shared_osc_tables_match_unshared():
    """Osc-table sharing (``OscillationHandler.cpp:18-35`` equivalent) is a
    pure optimisation: batched totals identical with and without injection."""
    import jax
    import numpy as np
    from mach3_tpu.tutorial.toy import build_toy

    toy = build_toy(n_events=1500, seed=3)
    thetas = np.tile(np.asarray(toy.model.prefit_vector()), (5, 1))
    thetas = thetas + 1e-2 * np.random.default_rng(0).normal(size=thetas.shape)
    thetas = jnp.asarray(thetas)

    # Both toy samples share grid/baseline -> one unique signature
    sigs = {s.osc_share_signature() for s in toy.samples}
    assert len(sigs) == 1

    total_shared, _, parts_shared = toy.model.total_nll_batch_parts(thetas)
    parts_direct = jnp.stack(
        [s.log_likelihood_batch(thetas) for s in toy.samples], axis=1
    )
    np.testing.assert_allclose(
        np.asarray(parts_shared), np.asarray(parts_direct), rtol=1e-12
    )
    # Total follows the OOB-sentinel semantics of total_nll (MR2T2.cpp:51-99)
    from mach3_tpu.core.precision import LARGE_LOGL

    prior = jax.vmap(toy.model.prior_nll)(thetas)
    expected = prior + jnp.where(
        prior >= LARGE_LOGL, len(toy.samples) * LARGE_LOGL, parts_direct.sum(axis=1)
    )
    np.testing.assert_allclose(np.asarray(total_shared), np.asarray(expected), rtol=1e-12)


def test_nonuniform_binning_matches_brute_force():
    """Refined-grid lookup == direct hyper-rect containment (the reference's
    MegaBin scheme, ``Samples/BinningHandler.h:103-123``)."""
    from mach3_tpu.samples.binning import NonUniformBinning

    # The doc-comment layout from BinningHandler.h: 10 bins tiling [0,4]x[0,3]
    bins = [
        [(0, 1), (2, 3)], [(1, 2.2), (2, 3)], [(2.2, 2.8), (2, 3)], [(2.8, 4), (2, 3)],
        [(0, 1), (1, 2)], [(1, 2.2), (0, 2)], [(2.2, 2.8), (1, 2)],
        [(0, 1), (0, 1)], [(2.2, 2.8), (0, 1)], [(2.8, 4), (0, 2)],
    ]
    nb = NonUniformBinning.build(bins, [0, 1])
    assert nb.n_bins == 10

    rng = np.random.default_rng(7)
    x = rng.uniform(-0.5, 4.5, size=500)
    y = rng.uniform(-0.5, 3.5, size=500)
    got = np.asarray(nb.find_bins(jnp.asarray(np.stack([x, y]))))

    ext = np.asarray(bins, np.float64)
    inside = np.all(
        (ext[:, :, 0] <= np.stack([x, y], axis=1)[:, None, :])
        & (np.stack([x, y], axis=1)[:, None, :] < ext[:, :, 1]),
        axis=2,
    )  # [E, B]
    expected = np.where(inside.any(axis=1), inside.argmax(axis=1), nb.n_bins)
    np.testing.assert_array_equal(got, expected)
    # this tiling has no gaps inside [0,4]x[0,3]
    covered = (0 <= x) & (x < 4) & (0 <= y) & (y < 3)
    assert np.all((got < nb.n_bins) == covered)


def test_nonuniform_binning_gaps_and_validation():
    from mach3_tpu.samples.binning import NonUniformBinning

    # One axis, two bins with a gap (1, 2)
    nb = NonUniformBinning.build([[(0, 1)], [(2, 3)]], [0])
    got = np.asarray(nb.find_bins(jnp.asarray([[0.5, 1.5, 2.5, 3.5]])))
    assert list(got) == [0, 2, 1, 2]
    assert nb.bin_name(0) == "[0, 1)"
    assert nb.bin_name(2) == "underflow/overflow"

    with pytest.raises(ValueError, match="overlap"):
        NonUniformBinning.build([[(0, 2)], [(1, 3)]], [0])
    with pytest.raises(ValueError, match="low < high"):
        NonUniformBinning.build([[(1, 1)]], [0])


def test_nonuniform_binning_in_sample_model():
    """A SampleModel over non-uniform bins reweights + histograms end to end."""
    from mach3_tpu.samples.binning import NonUniformBinning, histogram as _hist
    from mach3_tpu.tutorial.toy import build_toy

    toy = build_toy(n_events=800, seed=5)
    s = toy.samples[0]
    # Replace the uniform binning with a 2-bin non-uniform split of axis 0
    edges = np.asarray(s.binning.edges[0])
    n_edges = int(np.asarray(s.binning.n_bins_axis[0])) + 1
    lo, hi = float(edges[0]), float(edges[n_edges - 1])
    mid = 0.5 * (lo + hi)
    nb = NonUniformBinning.build([[(lo, mid)], [(mid, hi)]], [0])
    s2 = s.with_binning(nb).replace(use_pallas=False)
    theta = toy.model.prefit_vector()
    mc, w2 = s2.reweight(theta)
    assert mc.shape == (2,)
    # Total MC conserved vs the uniform binning (same selection range)
    mc_u, _ = s.replace(use_pallas=False).reweight(theta)
    np.testing.assert_allclose(float(mc.sum()), float(mc_u.sum()), rtol=1e-5)
    assert np.isfinite(float(s2.log_likelihood(theta)))
