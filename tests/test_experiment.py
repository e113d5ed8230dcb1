"""Config-driven experiment construction (YAML -> FitModel), the reference's
``SampleHandlerFD::ReadConfig`` + factory pipeline
(``Samples/SampleHandlerFD.cpp:169-202``, ``Fitters/MaCh3Factory.h:69-157``)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mach3_tpu.core.config import Config
from mach3_tpu.samples.experiment import build_experiment, register_shift


def _write_systematics(path):
    import yaml

    systs = [
        dict(Systematic=dict(
            Names=dict(FancyName="norm_total"),
            ParameterValues=dict(PreFitValue=1.0),
            StepScale=dict(MCMC=0.2),
            Error=0.1,
            Type="Norm",
            ParameterGroup="Xsec",
        )),
        dict(Systematic=dict(
            Names=dict(FancyName="spline_res"),
            ParameterValues=dict(PreFitValue=0.0),
            StepScale=dict(MCMC=0.2),
            Error=1.0,
            Type="Spline",
            ParameterGroup="Xsec",
            SplineInformation=dict(SplineName="res", InterpolationType="TSpline3"),
        )),
        dict(Systematic=dict(
            Names=dict(FancyName="escale"),
            ParameterValues=dict(PreFitValue=0.0),
            StepScale=dict(MCMC=0.1),
            Error=0.02,
            Type="Functional",
            ParameterGroup="Det",
        )),
        dict(Systematic=dict(
            Names=dict(FancyName="ftf1"),
            ParameterValues=dict(PreFitValue=0.0),
            StepScale=dict(MCMC=0.1),
            Error=0.5,
            Type="Functional",
            ParameterGroup="Det",
        )),
    ]
    path.write_text(yaml.safe_dump(dict(Systematics=systs)))


def _write_mc(path, n=400, seed=0):
    rng = np.random.default_rng(seed)
    np.savez(
        path,
        e_true=rng.gamma(3.0, 0.3, n) + 0.05,
        e_reco=np.clip(rng.gamma(3.0, 0.3, n), 0.02, None),
        mode=rng.integers(0, 3, n).astype(np.int32),
        target=np.full(n, 12, np.int32),
        pdg=np.full(n, 14, np.int32),
        preosc_pdg=np.full(n, 14, np.int32),
        mc_weight=np.full(n, 0.25),
    )
    return n


def _write_splines(path, n):
    rng = np.random.default_rng(1)
    knots = np.array([-2.0, -1.0, 0.0, 1.0, 2.0])
    ev = np.arange(0, n, 2)
    y = 1.0 + 0.05 * rng.normal(size=(len(ev), 5)).cumsum(axis=1)
    np.savez(path, **{"res:knots": knots, "res:event_ids": ev, "res:y": y})


def _write_tf1(path, n):
    ev = np.arange(0, n, 3)
    np.savez(
        path,
        **{
            "ftf1:event_ids": ev,
            "ftf1:slope": np.full(len(ev), 0.3),
            "ftf1:intercept": np.ones(len(ev)),
        },
    )


def test_build_experiment_end_to_end(tmp_path):
    syst = tmp_path / "systs.yaml"
    _write_systematics(syst)
    n = _write_mc(tmp_path / "mc.npz")
    _write_splines(tmp_path / "splines.npz", n)
    _write_tf1(tmp_path / "tf1.npz", n)

    cfg = Config(
        dict(
            Experiment=dict(
                Systematics=[dict(File=str(syst), Name="xsec")],
                Samples=[
                    dict(
                        Name="s1",
                        MCFile=str(tmp_path / "mc.npz"),
                        VarOrder=["e_true", "e_reco"],
                        Binning=dict(Vars=["e_reco"], Uniform=[dict(Low=0.0, High=3.0, N=12)]),
                        SplineFile=str(tmp_path / "splines.npz"),
                        TF1File=str(tmp_path / "tf1.npz"),
                        Shifts=[dict(Function="scale", Parameter="escale", Var="e_reco")],
                        TestStatistic="Poisson",
                    )
                ],
                Data="Asimov",
            )
        )
    )
    exp = build_experiment(cfg)
    assert exp.model.n_params == 4
    s = exp.samples[0]
    assert s.n_bins == 12
    assert s.spline_table is not None and s.tf1_table is not None
    assert s.static_bins is None  # has a shift
    theta0 = exp.model.prefit_vector()
    nll = float(exp.model.total_nll(theta0))
    assert np.isfinite(nll)
    # Asimov data at prefit: sample LLH contribution ~ 0
    s_nll = float(s.log_likelihood(theta0))
    assert abs(s_nll) < 1e-6
    # moving the TF1 parameter changes the likelihood
    theta1 = np.asarray(theta0).copy()
    theta1[exp.param_sets[0].index_of("ftf1")] = 0.5
    assert float(exp.model.total_nll(jnp.asarray(theta1))) > 1e-3


def test_build_experiment_nonuniform_and_custom_shift(tmp_path):
    syst = tmp_path / "systs.yaml"
    _write_systematics(syst)
    _write_mc(tmp_path / "mc.npz")
    register_shift("double_scale", lambda v, x, kin: x * (1.0 + 2.0 * v))

    cfg = Config(
        dict(
            Experiment=dict(
                Systematics=[dict(File=str(syst))],
                Samples=[
                    dict(
                        Name="s1",
                        MCFile=str(tmp_path / "mc.npz"),
                        VarOrder=["e_true", "e_reco"],
                        Binning=dict(
                            Vars=["e_reco"],
                            NonUniformBins=[[[0.0, 1.0]], [[1.0, 3.0]]],
                        ),
                        Shifts=[
                            dict(Function="double_scale", Parameter="escale", Var="e_reco")
                        ],
                    )
                ],
            )
        )
    )
    exp = build_experiment(cfg)
    s = exp.samples[0]
    assert s.n_bins == 2
    mc, _ = s.reweight(exp.model.prefit_vector())
    assert float(mc.sum()) > 0


def test_build_experiment_errors(tmp_path):
    from mach3_tpu.core.exceptions import ConfigError

    syst = tmp_path / "systs.yaml"
    _write_systematics(syst)
    _write_mc(tmp_path / "mc.npz")
    base = dict(
        Name="s1",
        MCFile=str(tmp_path / "mc.npz"),
        VarOrder=["e_true", "e_reco"],
        Binning=dict(Vars=["e_reco"], Uniform=[dict(Low=0, High=3, N=4)]),
    )
    bad = dict(base, Shifts=[dict(Function="nope", Parameter="escale", Var="e_reco")])
    cfg = Config(dict(Experiment=dict(Systematics=[dict(File=str(syst))], Samples=[bad])))
    with pytest.raises(ConfigError, match="Unknown shift"):
        build_experiment(cfg)
