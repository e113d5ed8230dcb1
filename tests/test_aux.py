"""Auxiliary components: modes, tunes, histogram utils, statistical utils,
binned splines, OscProcessor, predictive throws."""
import jax
import numpy as np
import pytest

from mach3_tpu.core.modes import MaCh3Modes
from mach3_tpu.core.exceptions import ConfigError
from mach3_tpu.params.tunes import ParameterTunes
from mach3_tpu.params.parameterset import ParameterSet


MODES_CFG = {
    "Title": "Test modes",
    "GeneratorName": "NEUT",
    "Modes": [
        {"Name": "CCQE", "GeneratorMaping": [1], "PlotColor": 600, "SplineSuffix": "ccqe"},
        {"Name": "CCRES", "GeneratorMaping": [11, 12, 13]},
        {"Name": "NC", "GeneratorMaping": [31, 32], "IsNC": True},
    ],
}


def test_modes_lookup():
    m = MaCh3Modes(MODES_CFG)
    assert m.n_modes == 3
    assert m.get_mode("CCQE").index == 0
    assert m.get_mode("CCQE").spline_suffix == "ccqe"
    assert list(m.mode_from_generator(np.array([1, 11, 13, 31, 99, -2]))) == [0, 1, 1, 2, 3, 3]
    assert m.nc_mode_indices() == [2]
    with pytest.raises(ConfigError):
        m.get_mode("nope")


def test_modes_duplicate_raises():
    cfg = dict(MODES_CFG)
    cfg["Modes"] = [{"Name": "A", "GeneratorMaping": [1]}, {"Name": "A", "GeneratorMaping": [2]}]
    with pytest.raises(ConfigError):
        MaCh3Modes(cfg)


def _simple_ps():
    return ParameterSet.from_config(
        {
            "Systematics": [
                {
                    "Systematic": {
                        "Names": {"FancyName": n},
                        "ParameterValues": {"PreFitValue": 1.0},
                        "StepScale": {"MCMC": 1.0},
                        "Error": 0.1,
                        "ParameterBounds": [0, 2],
                        "Type": "Norm",
                    }
                }
                for n in ["a", "b"]
            ]
        }
    )


def test_tunes_apply():
    ps = _simple_ps()
    tunes = ParameterTunes({"Tunes": [{"Name": "PostND", "Values": {"b": 1.3}}]})
    theta = tunes.apply(ps, "PostND")
    assert theta[0] == 1.0 and theta[1] == 1.3
    with pytest.raises(ConfigError):
        tunes.get_tune("missing")


def test_histogram_utils():
    from mach3_tpu.samples.histograms import (
        fill_violin,
        normalise,
        poisson_fluctuate,
        poisson_fluctuate_by_sampling,
        project,
        ratio,
    )

    h2 = np.arange(12).reshape(3, 4).astype(float)
    assert np.allclose(project(h2, 0), h2.sum(axis=1))
    assert np.allclose(project(h2, 1), h2.sum(axis=0))
    assert normalise(h2).sum() == pytest.approx(1.0)
    r = ratio(np.array([2.0, 1.0]), np.array([4.0, 0.0]))
    assert r[0] == 0.5 and r[1] == 0.0

    rng = np.random.default_rng(0)
    base = np.full(50, 100.0)
    fl = poisson_fluctuate_by_sampling(base, rng)
    assert fl.sum() == pytest.approx(5000, rel=0.05)
    assert fl.std() == pytest.approx(10.0, rel=0.4)
    fl2 = np.asarray(poisson_fluctuate(base, jax.random.key(0)))
    assert fl2.mean() == pytest.approx(100.0, rel=0.05)

    throws = rng.poisson(50.0, size=(500, 10)).astype(float)
    v = fill_violin(throws)
    assert v["values"].shape == (5, 10)
    assert np.all(np.diff(v["values"], axis=0) >= 0)


def test_statutils():
    from mach3_tpu.diagnostics.statutils import (
        anderson_darling,
        barlow_beeston_beta,
        bic,
        bonferroni,
        fisher_combined_pvalue,
        jeffreys_scale,
        kl_divergence,
        n_effective,
        runs_test,
        suboptimality,
    )

    assert jeffreys_scale(50) == "Very strong"
    assert jeffreys_scale(0.5) == "Negative"
    assert bonferroni(0.01, 10) == pytest.approx(0.1)
    assert bic(100.0, 5, 1000) == pytest.approx(200 + 5 * np.log(1000))
    assert n_effective(np.array([10.0]), np.array([4.0]))[0] == pytest.approx(25.0)
    # beta -> 1 when w2 -> 0
    assert barlow_beeston_beta(np.array([5.0]), np.array([5.0]), np.array([1e-12]))[0] == pytest.approx(1.0, abs=1e-4)

    rng = np.random.default_rng(1)
    normal = rng.normal(size=5000)
    assert anderson_darling(normal) < 2.0
    assert anderson_darling(rng.exponential(size=5000)) > 10.0

    assert abs(runs_test(rng.normal(size=2000))) < 3.0
    trending = np.linspace(0, 1, 2000) + 0.01 * rng.normal(size=2000)
    assert runs_test(trending) < -10  # far too few runs

    # suboptimality = 1 for matched covariance
    cov = np.array([[1.0, 0.3], [0.3, 2.0]])
    assert suboptimality(cov, cov) == pytest.approx(1.0)
    assert suboptimality(np.diag([1.0, 1.0]), np.diag([1.0, 100.0])) > 1.5

    p = np.array([0.5, 0.5, 0.5])
    assert 0.4 < fisher_combined_pvalue(p) < 0.8
    assert kl_divergence(np.array([1, 1.0]), np.array([1, 1.0])) == pytest.approx(0.0)


def test_binned_spline_table():
    import jax.numpy as jnp

    from mach3_tpu.splines.binned import BinnedSplineParamSpec, build_binned_table
    from mach3_tpu.splines.eval import eval_sparse

    n_events = 10
    # 3 spline-bins; events 0-3 -> bin 0, 4-6 -> bin 1, 7-8 -> bin 2, 9 -> none
    event_bins = np.array([0, 0, 0, 0, 1, 1, 1, 2, 2, -1])
    y = np.array(
        [
            [0.8, 1.0, 1.2],  # bin 0: slope
            [1.0, 1.0, 1.0],  # bin 1: flat (dropped)
            [1.4, 1.0, 0.6],  # bin 2: negative slope
        ]
    )
    spec = BinnedSplineParamSpec(
        name="s",
        param_index=0,
        x_knots=np.array([-1.0, 0.0, 1.0]),
        y_knots=y,
        event_bins=event_bins,
    )
    table = build_binned_table([spec], n_events)
    assert table.n_splines == 2  # flat bin dropped
    w = np.asarray(eval_sparse(table, jnp.asarray([1.0])))
    assert np.allclose(w[:4], 1.2)
    assert np.allclose(w[4:7], 1.0)  # flat -> unit
    assert np.allclose(w[7:9], 0.6)
    assert w[9] == 1.0  # unmapped event


def test_oscprocessor_jarlskog():
    from mach3_tpu.diagnostics.oscprocessor import OscProcessor, jarlskog

    rng = np.random.default_rng(2)
    n = 20000
    draws = np.stack(
        [
            rng.normal(0.307, 0.01, n),
            rng.normal(0.022, 0.001, n),
            rng.normal(0.561, 0.02, n),
            rng.uniform(-np.pi, np.pi, n),
            np.where(rng.random(n) < 0.7, 2.5e-3, -2.5e-3),
        ],
        axis=1,
    )
    names = ["osc_sin2th12", "osc_sin2th13", "osc_sin2th23", "osc_delta_cp", "osc_dm2_31"]
    proc = OscProcessor(draws, names, dm31="osc_dm2_31", burn_in=0)
    res = proc.jarlskog_analysis()
    assert res.p_normal_ordering == pytest.approx(0.7, abs=0.02)
    # Jarlskog magnitude sanity: |J| <= ~0.035
    assert np.abs(res.j).max() < 0.04
    table = proc.ordering_octant_table()
    assert sum(table.values()) == pytest.approx(1.0)
    # flat-sin reweight downweights dcp ~ +-pi/2
    w = proc.flat_sin_dcp_weights()
    dcp = draws[:, 3]
    assert w[np.abs(np.abs(dcp) - np.pi / 2) < 0.1].mean() < 0.2


def test_jarlskog_formula():
    from mach3_tpu.diagnostics.oscprocessor import jarlskog

    j = jarlskog(np.array([0.307]), np.array([0.022]), np.array([0.5]), np.array([np.pi / 2]))
    # PDG-ish maximum J ~ 0.033
    assert j[0] == pytest.approx(0.033, abs=0.004)


def test_predictive_pvalue_calibrated():
    """Asimov data + posterior-width throws should give p ~ 0.5-1 (data is
    perfectly described); shifted data should give small p."""
    from mach3_tpu.diagnostics.predictive import run_predictive
    from mach3_tpu.fitters import FitModel
    from mach3_tpu.samples.events import EventData, build_sample_model

    rng = np.random.default_rng(3)
    n = 2000
    ev = EventData(
        kinematics={"x": rng.normal(1.0, 0.4, n)},
        mode=np.zeros(n, np.int32),
        target=np.full(n, 12, np.int32),
        pdg=np.full(n, 14, np.int32),
        preosc_pdg=np.full(n, 14, np.int32),
        mc_weight=np.full(n, 0.1),
    )
    ps = _simple_ps()
    norm_idx = np.zeros((n, 1), np.int64)  # param "a" scales everything
    sm = build_sample_model(
        "s",
        ev,
        var_order=["x"],
        binning_edges=[np.linspace(0, 2, 11)],
        binning_vars=["x"],
        n_total_params=2,
        norm_idx=norm_idx,
    )
    import jax.numpy as jnp

    theta0 = jnp.asarray([1.0, 1.0])
    sm = sm.with_data(sm.asimov_data(theta0))
    model = FitModel.build([ps], [sm])

    toys = np.tile(np.array([1.0, 1.0]), (200, 1)) + 0.02 * rng.normal(size=(200, 2))
    res = run_predictive(model, toys, seed=1)
    assert 0.3 < res.p_value <= 1.0

    # Now make the data badly fluctuated upward: p should drop
    sm_bad = sm.with_data(np.asarray(sm.data) * 1.5)
    model_bad = FitModel.build([ps], [sm_bad])
    res_bad = run_predictive(model_bad, toys, seed=1)
    assert res_bad.p_value < res.p_value
    assert res_bad.p_value < 0.1


def test_predictive_by_mode_and_per_bin():
    """By-mode spectra sum to the total spectrum; per-bin p-values calibrated
    (~0.5 on Asimov data) — SampleSummary's breakdowns
    (``Fitters/SampleSummary.h:23-80``)."""
    from mach3_tpu.diagnostics.predictive import run_predictive
    from mach3_tpu.fitters import FitModel
    from mach3_tpu.samples.events import EventData, build_sample_model

    rng = np.random.default_rng(9)
    n = 2000
    modes = rng.integers(0, 3, size=n).astype(np.int32)
    ev = EventData(
        kinematics={"x": rng.normal(1.0, 0.4, n)},
        mode=modes,
        target=np.full(n, 12, np.int32),
        pdg=np.full(n, 14, np.int32),
        preosc_pdg=np.full(n, 14, np.int32),
        mc_weight=np.full(n, 0.1),
    )
    ps = _simple_ps()
    sm = build_sample_model(
        "s",
        ev,
        var_order=["x"],
        binning_edges=[np.linspace(0, 2, 11)],
        binning_vars=["x"],
        n_total_params=2,
        norm_idx=np.zeros((n, 1), np.int64),
    )
    import jax.numpy as jnp

    theta0 = jnp.asarray([1.0, 1.0])
    sm = sm.with_data(sm.asimov_data(theta0))
    model = FitModel.build([ps], [sm])

    toys = np.tile(np.array([1.0, 1.0]), (100, 1)) + 0.02 * rng.normal(size=(100, 2))
    res = run_predictive(model, toys, seed=2, categories=[modes])
    assert res.spectra_by_mode is not None
    bym = res.spectra_by_mode[0]  # [T, M, B]
    assert bym.shape[1] == 3
    np.testing.assert_allclose(bym.sum(axis=1), res.spectra[0], rtol=1e-5)
    # per-bin p-values near 0.5 on Asimov (binomial spread over 100 toys)
    assert res.p_value_per_bin is not None
    pb = res.p_value_per_bin[0]
    assert pb.shape == (10,)
    assert np.all(pb > 0.15) and np.all(pb < 0.85)


def test_capture_stdout_logger():
    """``LoggerPrint`` equivalent: third-party prints land in the logger."""
    import logging as _logging

    from mach3_tpu.core.logging import capture_stdout, get_logger

    records = []

    class Sink(_logging.Handler):
        def emit(self, record):
            records.append(record.getMessage())

    logger = get_logger("capture-test")
    sink = Sink()
    logger.addHandler(sink)
    try:
        with capture_stdout("capture-test"):
            print("hello from a noisy library")
            print("partial", end="")
    finally:
        logger.removeHandler(sink)
    assert "hello from a noisy library" in records
    assert "partial" in records


def test_style_manager_defaults_and_config(tmp_path):
    """StyleManager (reference Plotting/PlottingUtils/StyleManager.h
    equivalent): palette cycling, pretty names with prefix stripping,
    YAML overrides, scoped rcParams application."""
    import matplotlib as mpl

    from mach3_tpu.plotting import StyleManager

    sm = StyleManager()
    assert sm.color(0) != sm.color(1)
    assert sm.color(len(sm.palette)) == sm.color(0)  # cycles
    assert sm.pretty_name("osc_delta_cp") == r"$\delta_{CP}$"
    assert sm.pretty_name("xsec_sin2th23") == r"$\sin^2\theta_{23}$"
    assert "_" not in sm.pretty_name("norm_ccqe_C")

    cfg = tmp_path / "style.yaml"
    cfg.write_text(
        "Style:\n"
        "  Palette: ['#112233', '#445566']\n"
        "  rcParams: {'font.size': 13}\n"
        "  PrettyNames: {'norm_ccqe_C': 'CCQE (C)'}\n"
    )
    sm2 = StyleManager(str(cfg))
    assert sm2.color(0) == "#112233"
    assert sm2.pretty_name("norm_ccqe_C") == "CCQE (C)"
    before = mpl.rcParams["font.size"]
    with sm2.context():
        assert mpl.rcParams["font.size"] == 13
        assert mpl.rcParams["axes.prop_cycle"].by_key()["color"][0] == "#112233"
    assert mpl.rcParams["font.size"] == before  # restored


def test_predictive_fluctuation_battery_calibrated():
    """SampleSummary's fluctuated-throw battery (``Fitters/SampleSummary.h:
    264-321``): on Asimov data with posterior-width throws, every direction
    of the comparison is calibrated (p not extreme) and the per-throw LLH
    arrays are finite; on badly-scaled data the data-direction p-values react
    while the fluct-vs-fluct ones stay calibrated."""
    from mach3_tpu.diagnostics.predictive import run_predictive
    from mach3_tpu.fitters import FitModel
    from mach3_tpu.samples.events import EventData, build_sample_model

    rng = np.random.default_rng(3)
    n = 2000
    ev = EventData(
        kinematics={"x": rng.normal(1.0, 0.4, n)},
        mode=np.zeros(n, np.int32),
        target=np.full(n, 12, np.int32),
        pdg=np.full(n, 14, np.int32),
        preosc_pdg=np.full(n, 14, np.int32),
        mc_weight=np.full(n, 0.1),
    )
    ps = _simple_ps()
    sm = build_sample_model(
        "s", ev, var_order=["x"], binning_edges=[np.linspace(0, 2, 11)],
        binning_vars=["x"], n_total_params=2,
        norm_idx=np.zeros((n, 1), np.int64),
    )
    import jax.numpy as jnp

    sm = sm.with_data(sm.asimov_data(jnp.asarray([1.0, 1.0])))
    model = FitModel.build([ps], [sm])
    toys = np.tile(np.array([1.0, 1.0]), (150, 1)) + 0.02 * rng.normal(size=(150, 2))
    res = run_predictive(model, toys, seed=1)
    for arr in (
        res.llh_fluctpred_vs_draw, res.llh_data_vs_fluctdraw,
        res.llh_fluctdata_vs_draw, res.llh_fluctdraw_vs_pred,
        res.llh_rate_data, res.llh_rate_fluct,
    ):
        assert arr is not None and arr.shape == (150,)
        assert np.all(np.isfinite(arr))
    assert 0.1 < res.p_value_fluct_pred <= 1.0
    assert 0.1 < res.p_value_fluct_data <= 1.0
    assert 0.05 < res.p_value_rate < 0.95
    v = res.violin(0)
    assert v.shape == (39, 10)
    assert np.all(np.diff(v, axis=0) >= 0)  # quantiles are monotone per bin

    # badly-scaled data: every comparison with Data on one side collapses,
    # while FluctData-vs-Draw (both sides carry the bad data) stays calibrated
    sm_bad = sm.with_data(np.asarray(sm.data) * 1.5)
    res_bad = run_predictive(FitModel.build([ps], [sm_bad]), toys, seed=1)
    assert res_bad.p_value_rate < 0.05
    assert res_bad.p_value_fluct_pred < 0.05
    assert 0.1 < res_bad.p_value_fluct_data <= 1.0


def test_no_sub_f32_range_literals():
    """TPU f64 is emulated as a double-float pair of f32s with f32 EXPONENT
    RANGE: literals like 1e-300 are silently 0.0 on device, and guarded
    fallback divisions by them produce inf whose where-masked cotangent is
    0*inf = NaN (r3: this NaN'd every test-statistic gradient on hardware
    while CPU f64 was clean). Pin the rule: no device-code literal may sit
    outside the f32 exponent range (~1e+/-38)."""
    import pathlib
    import re

    root = pathlib.Path(__file__).resolve().parents[1] / "mach3_tpu"
    pat = re.compile(r"\b\d+(?:\.\d+)?[eE]-?(\d{2,3})\b")
    offenders = []
    for path in root.rglob("*.py"):
        # host-side numpy diagnostics are real f64; only device (jnp) modules
        # matter, but the blanket rule is simpler and costs nothing
        for i, line in enumerate(path.read_text().splitlines(), 1):
            if "np." in line and "jnp." not in line:
                continue  # pure host-side numpy line
            for m in pat.finditer(line):
                if int(m.group(1)) > 38:
                    offenders.append(f"{path.relative_to(root)}:{i}: {line.strip()}")
    assert not offenders, "\n".join(offenders)
