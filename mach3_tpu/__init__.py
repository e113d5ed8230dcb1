"""mach3_tpu — a TPU-native Bayesian MCMC framework for binned neutrino-oscillation
analyses, with the capabilities of mach3-software/MaCh3 re-designed for
JAX/XLA/Pallas/pjit.

Layer map (mirrors the reference's capability, not its architecture):

* ``core``        — config (YAML), logging, precision policy, RNG, checkpointing
* ``params``      — prior model, correlated proposals, adaptive covariance, PCA
* ``splines``     — systematic-response splines: coefficients, monolith, eval kernels
* ``osc``         — 3-flavour oscillation probabilities (vacuum/matter/PREM grids)
* ``samples``     — event store, binning, reweighting, binned test statistics
* ``fitters``     — MR2T2 (Metropolis), delayed rejection, HMC/NUTS, minimisers, PSO
* ``diagnostics`` — autocorrelation/ESS/R-hat/Geweke, posterior processing, predictive
* ``distributed`` — device meshes, chain sharding, cross-chain collectives
* ``tutorial``    — in-repo toy experiment driving validations and benchmarks
"""
from .core import precision  # noqa: F401 — establishes the x64 policy on import

__version__ = "0.1.0"
