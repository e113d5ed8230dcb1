"""Gradient-based maximum-likelihood fit (Minuit2-Migrad/Hesse equivalent).

TPU-native replacement for ``Fitters/LikelihoodFit.cpp`` + ``MinuitFit.cpp``:
the reference drives ROOT Minuit2 (gradient-free) over ``CalcChi2`` (2x -logL,
no out-of-bounds cap, ``LikelihoodFit.cpp:39-139``). Here the posterior is
differentiable, so we use L-BFGS-B with exact ``jax.grad`` (bounds passed to
the optimiser instead of the reference's mirroring trick) and obtain the
postfit covariance from the exact ``jax.hessian`` — the Hesse step, without
finite differences.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..core.logging import get_logger
from ..core.precision import ATYPE
from .model import FitModel

_log = get_logger("minimize")


@dataclasses.dataclass
class FitResult:
    x: np.ndarray  # best-fit parameters
    chi2: float  # 2 x -logL at minimum
    covariance: np.ndarray | None  # inverse Hessian (Hesse equivalent)
    errors: np.ndarray | None  # sqrt(diag(covariance))
    success: bool
    n_evaluations: int
    message: str


def _chi2_fn(model: FitModel):
    """CalcChi2: 2 x (prior CalcLikelihood [no OOB sentinel] + sample -logL)
    — the sentinel-free path Minuit needs (``LikelihoodFit.cpp:98``)."""

    def chi2(theta: jnp.ndarray) -> jnp.ndarray:
        return _chi2_of(model, theta)

    return chi2


def _chi2_of(mdl: FitModel, theta: jnp.ndarray) -> jnp.ndarray:
    total = jnp.zeros((), ATYPE)
    for prior, (start, size) in zip(mdl.priors, mdl.slices):
        block = jax.lax.dynamic_slice(theta, (start,), (size,))
        d = jnp.where(prior.flat_prior, 0.0, block - prior.prefit)
        total = total + 0.5 * d @ (prior.inv_cov @ d)
    return 2.0 * (total + mdl.sample_nll(theta))


def bounds_of(model: FitModel) -> list[tuple[float, float]]:
    out = []
    for prior in model.priors:
        lo = np.asarray(prior.low_bound)
        hi = np.asarray(prior.up_bound)
        out.extend(zip(lo.tolist(), hi.tolist()))
    return out


def run_minimizer(
    model: FitModel,
    x0: np.ndarray | None = None,
    run_hesse: bool = True,
    fixed: np.ndarray | None = None,
    maxiter: int = 2000,
) -> FitResult:
    """Migrad+Hesse equivalent (``MinuitFit.cpp:41-120``)."""
    from scipy.optimize import minimize

    # Model as a jit argument: tables as buffers, not HLO constants.
    vg_m = jax.jit(lambda m, t: jax.value_and_grad(lambda tt: _chi2_of(m, tt))(t))
    vg = lambda t: vg_m(model, t)

    if x0 is None:
        x0 = np.asarray(model.prefit_vector())
    x0 = np.asarray(x0, np.float64)

    fixed_mask = np.zeros(len(x0), bool) if fixed is None else np.asarray(fixed, bool)
    for prior, (start, size) in zip(model.priors, model.slices):
        fixed_mask[start : start + size] |= np.asarray(prior.fixed)

    free = ~fixed_mask
    bounds_all = np.asarray(bounds_of(model))

    def fun(xf):
        x = x0.copy()
        x[free] = xf
        v, g = vg(jnp.asarray(x))
        return float(v), np.asarray(g)[free]

    res = minimize(
        fun,
        x0[free],
        jac=True,
        method="L-BFGS-B",
        bounds=[tuple(b) for b in bounds_all[free]],
        options={"maxiter": maxiter},
    )
    x_best = x0.copy()
    x_best[free] = res.x

    cov = errors = None
    if run_hesse:
        h = np.asarray(
            jax.jit(lambda m, t: jax.hessian(lambda tt: _chi2_of(m, tt))(t))(
                model, jnp.asarray(x_best)
            )
        )
        h_free = h[np.ix_(free, free)]
        try:
            # chi2 = 2*nll -> cov = 2 * H^-1 (H of chi2)
            cov_free = 2.0 * np.linalg.inv(h_free)
            cov = np.zeros((len(x0), len(x0)))
            cov[np.ix_(free, free)] = cov_free
            errors = np.sqrt(np.maximum(np.diag(cov), 0.0))
        except np.linalg.LinAlgError:
            _log.warning("Hesse failed: singular Hessian")

    _log.info(
        "Minimizer: chi2 = %.4f after %d evaluations (%s)",
        res.fun,
        res.nfev,
        "converged" if res.success else res.message,
    )
    return FitResult(
        x=x_best,
        chi2=float(res.fun),
        covariance=cov,
        errors=errors,
        success=bool(res.success),
        n_evaluations=int(res.nfev),
        message=str(res.message),
    )
