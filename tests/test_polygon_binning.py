"""PolygonBinning: TH2Poly-class arbitrary-polygon bins
(``Samples/HistogramUtils.h:17-87``; ``Fitters/SampleSummary.h:23``)."""
import jax.numpy as jnp
import numpy as np
import pytest

from mach3_tpu.samples.binning import PolygonBinning, histogram


def _kin(x, y):
    return jnp.asarray(np.stack([x, y]), jnp.float32)


SQUARES = [
    [(0, 0), (1, 0), (1, 1), (0, 1)],
    [(1, 0), (2, 0), (2, 1), (1, 1)],
    [(0, 1), (2, 1), (2, 2), (0, 2)],  # wide bin on top
]


def test_points_in_squares():
    b = PolygonBinning.build(SQUARES, axis_vars=[0, 1])
    x = np.array([0.5, 1.5, 0.3, 1.7, 2.5, -0.1])
    y = np.array([0.5, 0.5, 1.5, 1.5, 0.5, 0.5])
    bins = np.asarray(b.find_bins(_kin(x, y)))
    np.testing.assert_array_equal(bins, [0, 1, 2, 2, 3, 3])  # 3 = garbage


def test_shared_border_assigns_exactly_one():
    b = PolygonBinning.build(SQUARES, axis_vars=[0, 1])
    # points exactly on the shared border x=1 between bins 0 and 1
    x = np.full(5, 1.0)
    y = np.linspace(0.1, 0.9, 5)
    bins = np.asarray(b.find_bins(_kin(x, y)))
    assert set(bins) <= {0, 1}  # never garbage, never double-counted


def test_concave_polygon():
    # L-shaped (concave) bin
    lshape = [[(0, 0), (2, 0), (2, 1), (1, 1), (1, 2), (0, 2)]]
    b = PolygonBinning.build(lshape, axis_vars=[0, 1])
    x = np.array([0.5, 1.5, 1.5, 0.5])
    y = np.array([0.5, 0.5, 1.5, 1.5])
    bins = np.asarray(b.find_bins(_kin(x, y)))
    np.testing.assert_array_equal(bins, [0, 0, 1, 0])  # notch (1.5,1.5) outside


def test_triangle_vs_matplotlib_convention():
    tri = [[(0, 0), (4, 0), (0, 4)]]
    b = PolygonBinning.build(tri, axis_vars=[0, 1])
    rng = np.random.default_rng(0)
    pts = rng.uniform(0, 4, size=(2, 2000))
    bins = np.asarray(b.find_bins(_kin(pts[0], pts[1])))
    inside_ref = pts[0] + pts[1] < 4.0
    # boundary-free points must agree exactly with the half-plane test
    clear = np.abs(pts[0] + pts[1] - 4.0) > 1e-6
    np.testing.assert_array_equal(bins[clear] == 0, inside_ref[clear])


def test_histogram_fill_matches_manual():
    b = PolygonBinning.build(SQUARES, axis_vars=[0, 1])
    rng = np.random.default_rng(1)
    x = rng.uniform(-0.5, 2.5, 5000)
    y = rng.uniform(-0.5, 2.5, 5000)
    w = rng.uniform(0.5, 1.5, 5000)
    bins = np.asarray(b.find_bins(_kin(x, y)))
    mc, w2 = histogram(jnp.asarray(w), jnp.asarray(bins), b.n_bins)
    for bi in range(b.n_bins):
        assert float(mc[bi]) == pytest.approx(w[bins == bi].sum(), rel=1e-5)


def test_build_validation():
    with pytest.raises(ValueError):
        PolygonBinning.build([[(0, 0), (1, 1)]], axis_vars=[0, 1])  # < 3 verts
    with pytest.raises(ValueError):
        PolygonBinning.build(SQUARES, axis_vars=[0])  # not 2-D

    b = PolygonBinning.build(SQUARES, axis_vars=[0, 1])
    assert "poly" in b.bin_name(0)
    assert b.bin_name(99) == "underflow/overflow"


def test_polygon_sample_end_to_end():
    """A polygon-binned sample fits end-to-end on CPU (r4 verdict #10):
    build a SampleModel over polygon bins, run a short MR2T2 chain."""
    from mach3_tpu.core.config import Config
    from mach3_tpu.fitters.mcmc import MR2T2, MCMCConfig
    from mach3_tpu.fitters.model import FitModel
    from mach3_tpu.params.parameterset import ParameterSet, ParamType
    from mach3_tpu.samples.events import EventData, build_sample_model, match_norm_params
    from mach3_tpu.tutorial.toy import xsec_config

    rng = np.random.default_rng(7)
    n = 4000
    e_reco = rng.gamma(2.0, 0.5, n).astype(np.float32)
    theta = rng.uniform(0.0, 60.0, n).astype(np.float32)
    events = EventData(
        kinematics={"e_true": e_reco * 1.05, "e_reco": e_reco, "theta_reco": theta},
        mode=rng.integers(0, 3, n).astype(np.int32),
        target=np.full(n, 12, np.int32),
        pdg=np.full(n, 14, np.int32),
        preosc_pdg=np.full(n, 14, np.int32),
        mc_weight=np.ones(n, np.float32),
    )
    # TH2Poly-style plane: triangles + quads tiling (e_reco, theta) space
    polys = [
        [(0, 0), (1.5, 0), (0, 30)],
        [(1.5, 0), (3.0, 0), (3.0, 30), (0, 30)],
        [(0, 30), (3.0, 30), (3.0, 60), (0, 60)],
    ]
    binning = PolygonBinning.build(polys, axis_vars=[1, 2])

    xsec = ParameterSet.from_config(Config(xsec_config()), name="xsec")
    norm_metas = [(m, m.index) for m in xsec.of_type(ParamType.NORM)]
    sm = build_sample_model(
        "poly_sample",
        events,
        var_order=["e_true", "e_reco", "theta_reco"],
        binning_edges=[],
        binning_vars=["e_reco", "theta_reco"],
        n_total_params=len(xsec),
        norm_idx=match_norm_params(events, norm_metas, "poly_sample"),
        binning=binning,
        use_pallas=False,
    )
    assert sm.n_bins == 3
    prefit = jnp.asarray(np.asarray(xsec.prefit))
    model = FitModel.build(
        [xsec], [sm.with_data(np.asarray(sm.asimov_data(prefit)))]
    )
    init = np.tile(np.asarray(model.prefit_vector()), (4, 1))
    f = MR2T2(model, MCMCConfig(n_steps=20, chunk_size=10), init, seed=0)
    out = f.run()
    assert np.isfinite(out["nll"]).all()
    assert out["theta"].shape == (20, 4, len(xsec))
