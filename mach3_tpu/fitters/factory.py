"""Config-driven factories.

TPU-native equivalent of ``Fitters/MaCh3Factory.cpp``:

* :func:`make_fitter` — fitter by config name (MR2T2 / DelayedMR2T2 / HMC /
  PSO / Minimizer; ``MaCh3FitterFactory``, ``MaCh3Factory.cpp:5-38``),
* :func:`manager_from_args` — Config from argv with ``Key:Sub:Value``
  overrides and ``--override second.yaml`` merging (``MaCh3Factory.cpp:41-80``),
* :func:`make_parameter_set` — covariance factory: YAML + fixed params + step
  scales + tune application (``MaCh3CovarianceFactory``, ``MaCh3Factory.h:69-120``).
"""
from __future__ import annotations

from typing import Sequence

import numpy as np

from ..core.config import Config, load_configs
from ..core.exceptions import ConfigError
from ..core.logging import get_logger
from ..params.parameterset import ParameterSet
from .delayed import DelayedConfig, DelayedMR2T2
from .hmc import HMC, HMCConfig
from .mcmc import MCMCConfig, MR2T2
from .model import FitModel

_log = get_logger("factory")


def manager_from_args(argv: Sequence[str]) -> Config:
    """argv: [config.yaml, ..., --override extra.yaml, Key:Sub:Value, ...]."""
    files: list[str] = []
    overrides: list[str] = []
    override_files: list[str] = []
    it = iter(argv)
    for a in it:
        if a == "--override":
            override_files.append(next(it))
        elif a.endswith((".yaml", ".yml")):
            files.append(a)
        elif ":" in a:
            overrides.append(a)
        else:
            raise ConfigError(f"Unrecognised argument: {a}")
    cfg = load_configs(files)
    for f in override_files:
        cfg.merge(Config.from_file(f))
    cfg.override(*overrides)
    return cfg


def make_parameter_set(
    cfg: Config,
    name: str = "params",
    fixed: Sequence[str] = (),
    step_scale: float | None = None,
    pca_threshold: float | None = None,
    pca_params: tuple[int, int] | None = None,
) -> ParameterSet:
    """Covariance factory (``MaCh3CovarianceFactory``, ``MaCh3Factory.h:69-120``).

    PCA follows the reference config surface: ``PCAThreshold`` (absent/-1 =
    off) and ``PCAParams: [first, last]`` (-999 = full range,
    ``MaCh3Factory.h:80-85``) — read from the YAML unless given explicitly.
    """
    ps = ParameterSet.from_config(cfg, name=name)
    for pname in fixed:
        ps.fix_parameter(pname)
    if step_scale is not None:
        ps.global_step_scale = step_scale
    if pca_threshold is None:
        raw = cfg.get("PCAThreshold", -1)
        pca_threshold = float(raw) if raw is not None else -1.0
    if pca_params is None:
        raw = cfg.get("PCAParams", [-999, -999]) or [-999, -999]
        pca_params = (int(raw[0]), int(raw[1]))
    if pca_threshold > 0:
        first = 0 if pca_params[0] == -999 else pca_params[0]
        last = None if pca_params[1] == -999 else pca_params[1]
        ps.construct_pca(pca_threshold, first=first, last=last)
    return ps


def _mcmc_config(cfg: Config) -> MCMCConfig:
    g = cfg.sub("General").sub("MCMC") if cfg.has("General.MCMC") else Config({})
    adaption = cfg.get("AdaptionOptions.Settings", {}) or {}
    return MCMCConfig(
        n_steps=int(g.get("NSteps", 10000)),
        chunk_size=int(g.get("AutoSave", 500)),
        anneal_temp=g.get("AnnealTemp", None),
        adaptive=bool(cfg.get("AdaptionOptions.Covariance", {}) or adaption),
        adaption_mode=str(adaption.get("Mode", "pooled")),
        adaption_start_throw=int(adaption.get("StartThrow", 1000)),
        adaption_start_update=int(adaption.get("StartUpdate", 100)),
        adaption_end_update=int(adaption.get("EndUpdate", 1_000_000)),
        adaption_update_step=int(adaption.get("UpdateStep", 100)),
        adaption_blocks=_adaption_blocks(cfg),
        record_breakdown=bool(g.get("RecordLLHBreakdown", False)),
    )


def _adaption_blocks(cfg: Config):
    """``AdaptionOptions.Covariance.MatrixBlocks`` — flat (lb, ub) index pairs
    per block (``AdaptiveMCMCHandler.cpp:121-135``)."""
    blocks = cfg.get("AdaptionOptions.Covariance.MatrixBlocks", None)
    if not blocks:
        return None
    return tuple(tuple(int(x) for x in b) for b in blocks)


def make_fitter(
    cfg: Config,
    model: FitModel,
    init_theta: np.ndarray | None = None,
    seed: int = 0,
):
    """Fitter by ``General.FittingAlgorithm`` (default MR2T2)."""
    algo = str(cfg.get("General.FittingAlgorithm", "MR2T2"))
    n_chains = int(cfg.get("General.MCMC.NChains", 8))
    if init_theta is None:
        init_theta = np.tile(np.asarray(model.prefit_vector()), (n_chains, 1))

    if algo == "MR2T2" or algo == "MCMC":
        return MR2T2(model, _mcmc_config(cfg), init_theta, seed=seed)
    if algo == "DelayedMR2T2":
        base = _mcmc_config(cfg)
        g = cfg.sub("General").sub("MCMC") if cfg.has("General.MCMC") else Config({})
        dc = DelayedConfig(
            **{f.name: getattr(base, f.name) for f in base.__dataclass_fields__.values()},
            decay_rate=float(g.get("DecayRate", 0.1)),
            max_rejections=int(g.get("MaxRejections", 1)),
            initial_scale=float(g.get("InitialScale", 1.0)),
            delay_probability=float(g.get("DelayProbability", 1.0)),
        )
        return DelayedMR2T2(model, dc, init_theta, seed=seed)
    if algo in ("HMC", "NUTS", "MALA"):
        g = cfg.sub("General").sub("MCMC") if cfg.has("General.MCMC") else Config({})
        if algo == "MALA":
            # Metropolis-adjusted Langevin == HMC with exactly one leapfrog
            # step (the kinetic-energy MH ratio IS the asymmetric-proposal
            # correction); optimal acceptance 0.574 (Roberts & Rosenthal).
            hc = HMCConfig(
                n_steps=int(g.get("NSteps", 1000)),
                n_leapfrog=1,
                jitter_trajectory=False,
                step_size=float(g.get("StepSize", 0.01)),
                target_accept=float(g.get("TargetAccept", 0.574)),
            )
        else:
            hc = HMCConfig(
                n_steps=int(g.get("NSteps", 1000)),
                n_leapfrog=int(g.get("NLeapfrog", 16)),
                step_size=float(g.get("StepSize", 0.01)),
                target_accept=float(g.get("TargetAccept", 0.8)),
                # ChEES cross-chain trajectory adaptation (the NUTS answer):
                # on by request or when the algorithm is spelled "NUTS".
                adapt_trajectory=bool(g.get("AdaptTrajectory", algo == "NUTS")),
                max_leapfrog=int(g.get("MaxLeapfrog", 128)),
            )
        return HMC(model, hc, init_theta, seed=seed)
    if algo == "Ensemble":
        from .ensemble import EnsembleConfig, EnsembleSampler

        ec = EnsembleConfig(
            n_steps=int(cfg.get("General.MCMC.NSteps", 10000)),
            chunk_size=int(cfg.get("General.MCMC.AutoSave", 500)),
            stretch_a=float(cfg.get("General.Ensemble.StretchA", 2.0)),
        )
        n_walkers = max(n_chains, 2 * model.n_params + (2 * model.n_params) % 2)
        if init_theta.shape[0] != n_walkers:
            reps = -(-n_walkers // init_theta.shape[0])
            init_theta = np.tile(init_theta, (reps, 1))[:n_walkers]
            rng = np.random.default_rng(seed)
            init_theta = init_theta + 1e-4 * rng.normal(size=init_theta.shape)
        return EnsembleSampler(model, ec, init_theta, seed=seed)
    if algo in ("ParallelTempering", "PTMCMC", "PT"):
        from .tempering import ParallelTempering, PTConfig

        g = cfg.sub("General").sub("MCMC") if cfg.has("General.MCMC") else Config({})
        pc = PTConfig(
            n_steps=int(g.get("NSteps", 1000)),
            chunk_size=int(g.get("AutoSave", 100)),
            n_temps=int(cfg.get("General.PT.NTemps", 8)),
            max_temp=float(cfg.get("General.PT.MaxTemp", 64.0)),
            swap_every=int(cfg.get("General.PT.SwapEvery", 1)),
            scale_throws=bool(cfg.get("General.PT.ScaleThrows", True)),
            beta_zero=bool(cfg.get("General.PT.BetaZero", False)),
        )
        return ParallelTempering(model, pc, init_theta, seed=seed)
    if algo == "PSO":
        from .pso import PSOConfig, run_pso

        class _PSORunner:
            def __init__(self):
                self.config = PSOConfig(
                    n_particles=int(cfg.get("General.PSO.Particles", 64)),
                    n_iterations=int(cfg.get("General.PSO.Iterations", 500)),
                )

            def run(self):
                return run_pso(model, self.config, seed=seed)

        return _PSORunner()
    if algo in ("Minuit2", "Minimizer", "LBFGS"):
        from .minimize import run_minimizer

        class _MinRunner:
            def run(self):
                return run_minimizer(model)

        return _MinRunner()
    raise ConfigError(f"Unknown fitting algorithm '{algo}'")
