from .delayed import DelayedConfig, DelayedMR2T2
from .factory import make_fitter, make_parameter_set, manager_from_args
from .hmc import HMC, HMCConfig
from .mcmc import AdaptiveState, ChainState, MCMCConfig, MR2T2, make_step_fn
from .minimize import FitResult, run_minimizer
from .model import FitModel
from .pso import PSOConfig, PSOResult, run_pso
from .scans import drag_race, llh_map, llh_scan_1d, llh_scan_2d, sigma_variations
from .tempering import ParallelTempering, PTConfig

__all__ = [
    "DelayedConfig",
    "DelayedMR2T2",
    "make_fitter",
    "make_parameter_set",
    "manager_from_args",
    "HMC",
    "HMCConfig",
    "AdaptiveState",
    "ChainState",
    "MCMCConfig",
    "MR2T2",
    "make_step_fn",
    "FitResult",
    "run_minimizer",
    "FitModel",
    "PSOConfig",
    "PSOResult",
    "run_pso",
    "ParallelTempering",
    "PTConfig",
    "drag_race",
    "llh_map",
    "llh_scan_1d",
    "llh_scan_2d",
    "sigma_variations",
]
