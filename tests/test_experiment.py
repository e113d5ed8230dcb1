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


def _weight_systs(path):
    import yaml

    systs = [
        dict(Systematic=dict(
            Names=dict(FancyName="norm_total"),
            ParameterValues=dict(PreFitValue=1.0),
            StepScale=dict(MCMC=0.2),
            Error=0.1,
            Type="Norm",
        )),
        dict(Systematic=dict(
            Names=dict(FancyName="eres_scale"),
            ParameterValues=dict(PreFitValue=0.0),
            StepScale=dict(MCMC=0.5),
            Error=0.2,
            Type="Functional",
            Mode=[0, 1],   # matched like norms: only CC modes
        )),
    ]
    path.write_text(yaml.safe_dump(dict(Systematics=systs)))


def _write_mc_res(path, n=400, seed=0, frac=0.35):
    """MC where e_reco IS a smeared e_true (resolution frac) — the setting a
    resolution-scale weight systematic describes."""
    rng = np.random.default_rng(seed)
    e_true = rng.gamma(3.0, 0.3, n) + 0.05
    e_reco = np.clip(e_true * (1.0 + frac * rng.normal(size=n)), 0.02, None)
    np.savez(
        path,
        e_true=e_true,
        e_reco=e_reco,
        mode=rng.integers(0, 3, n).astype(np.int32),
        target=np.full(n, 12, np.int32),
        pdg=np.full(n, 14, np.int32),
        preosc_pdg=np.full(n, 14, np.int32),
        mc_weight=np.full(n, 0.25),
    )


def _weight_cfg(tmp_path, syst):
    return Config(
        dict(
            Experiment=dict(
                Systematics=[dict(File=str(syst), Name="xsec")],
                Samples=[
                    dict(
                        Name="s1",
                        MCFile=str(tmp_path / "mc.npz"),
                        VarOrder=["e_true", "e_reco"],
                        Binning=dict(Vars=["e_reco"], Uniform=[dict(Low=0.0, High=3.0, N=12)]),
                        WeightFunctions=[
                            dict(
                                Function="res_scale_weight",
                                Parameter="eres_scale",
                                Var="e_reco",
                                Args=dict(true_var="e_true", sigma_frac=0.35),
                            )
                        ],
                        TestStatistic="Poisson",
                    )
                ],
                Data="Asimov",
            )
        )
    )


def test_weight_valued_functional_systematic(tmp_path):
    """The reference's weight-valued FuncParFuncType callbacks
    (``SampleHandlerFD.cpp:465-564``): a resolution-scale systematic that
    reweights (not shifts) events, matched by mode like a norm."""
    syst = tmp_path / "systs.yaml"
    _weight_systs(syst)
    _write_mc_res(tmp_path / "mc.npz")
    exp = build_experiment(_weight_cfg(tmp_path, syst))
    s = exp.samples[0]
    assert s.weight_fns and s.static_bins is not None  # weights do NOT move bins
    theta0 = np.asarray(exp.model.prefit_vector())
    i = exp.param_sets[0].index_of("eres_scale")

    # nominal: weight response is exactly 1 (Asimov nll ~ 0)
    assert abs(float(s.log_likelihood(jnp.asarray(theta0)))) < 1e-8
    # moving the parameter reweights ONLY matched (mode 0/1) events
    th = theta0.copy()
    th[i] = 0.4
    w0, _ = s.event_weights(jnp.asarray(theta0))
    w1, _ = s.event_weights(jnp.asarray(th))
    mask = np.asarray(s.weight_fns[0].mask)
    changed = np.asarray(w1) != np.asarray(w0)
    assert changed.any()
    assert not changed[~mask].any()
    assert float(exp.model.total_nll(jnp.asarray(th))) > 1e-3

    # batched path agrees with the unbatched one
    thetas = jnp.asarray(np.stack([theta0, th]))
    nll_b = np.asarray(s.log_likelihood_batch(thetas))
    np.testing.assert_allclose(
        nll_b, [float(s.log_likelihood(jnp.asarray(t))) for t in [theta0, th]],
        rtol=1e-10, atol=1e-10,
    )
    # differentiable (gradient samplers see the weight response)
    g = jax.grad(lambda t: exp.model.log_posterior(t))(jnp.asarray(th))
    assert np.isfinite(np.asarray(g)).all() and float(np.asarray(g)[i]) != 0.0


def test_weight_systematic_posterior_pull(tmp_path):
    """Asimov fit: the weight-valued parameter's posterior must centre on its
    truth (0) within statistical error — the end-to-end validation that the
    response enters the likelihood correctly."""
    from mach3_tpu.fitters import MCMCConfig, MR2T2

    syst = tmp_path / "systs.yaml"
    _weight_systs(syst)
    _write_mc_res(tmp_path / "mc.npz", n=2000, seed=3)
    exp = build_experiment(_weight_cfg(tmp_path, syst))
    theta0 = np.asarray(exp.model.prefit_vector())
    rng = np.random.default_rng(0)
    init = np.tile(theta0, (16, 1)) + 1e-3 * rng.normal(size=(16, len(theta0)))
    fit = MR2T2(exp.model, MCMCConfig(n_steps=800, chunk_size=200), init, seed=2)
    out = fit.run()
    i = exp.param_sets[0].index_of("eres_scale")
    draws = out["theta"][400:, :, i].ravel()
    # posterior pull: |mean| within 4 sigma_mean-ish of truth, width < prior
    assert abs(draws.mean()) < max(4 * draws.std() / np.sqrt(20), 0.05)
    assert 0.001 < draws.std() < 0.2
