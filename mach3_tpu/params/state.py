"""Device-side prior model and proposal kernel.

TPU-native equivalent of the reference proposal + prior hot path
(``Parameters/ParameterHandlerBase.cpp:652-867``):

* ``Randomize + CorrelateSteps`` (per-thread TRandom3 Gaussians, custom OMP
  Cholesky multiply) -> one ``jax.random.normal`` + a single matvec, vmappable
  over a chain batch axis.
* ``SpecialStepProposal`` (circular bounds e.g. deltaCP, then mass-ordering
  flips; reference order is "Step -> Circular Bounds -> Flip",
  ``ParameterHandlerBase.cpp:667-684,769-784``) -> elementwise ``fmod``/``where``.
* ``CalcLikelihood`` (half quadratic form with flat-prior skip,
  ``ParameterHandlerBase.cpp:816-841``) -> masked quadratic form in f64.
* ``CheckBounds``/``GetLikelihood`` (``:844-867``): out-of-bounds proposals cost
  ``NOutside * _LARGE_LOGL_``.

All state lives in arrays; there is no mutable handler object. The reference's
``RetPointer``/``_fPropVal`` pointer channel becomes explicit functional data
flow: samples receive the proposed parameter vector as an argument.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..core.precision import ATYPE, LARGE_LOGL
from .parameterset import ParameterSet


@struct.dataclass
class PriorModel:
    """Static per-handler arrays consumed by the jitted step (all f64; P is small)."""

    prefit: jnp.ndarray  # [P] prior central values
    inv_cov: jnp.ndarray  # [P, P] inverse covariance, flat-prior rows/cols zeroed
    chol: jnp.ndarray  # [P, P] Cholesky factor of the throw matrix
    step_scale: jnp.ndarray  # [P] individual x global step scale (0 for fixed)
    low_bound: jnp.ndarray  # [P]
    up_bound: jnp.ndarray  # [P]
    flat_prior: jnp.ndarray  # [P] bool
    fixed: jnp.ndarray  # [P] bool
    circ_mask: jnp.ndarray  # [P] bool — circular-bound params (deltaCP)
    circ_low: jnp.ndarray  # [P]
    circ_high: jnp.ndarray  # [P]
    flip_mask: jnp.ndarray  # [P] bool — flip proposal params (mass ordering)
    flip_point: jnp.ndarray  # [P]

    @property
    def n_params(self) -> int:
        return self.prefit.shape[0]

    @classmethod
    def from_parameter_set(cls, ps: ParameterSet) -> "PriorModel":
        flat = ps.flat_prior.astype(bool)
        # Flat-prior parameters contribute nothing to the Gaussian penalty:
        # zero their rows/columns of the inverse covariance up front instead of
        # branching per (i, j) like the reference inner loop.
        inv_cov = np.linalg.inv(ps.covariance)
        keep = (~flat).astype(np.float64)
        inv_cov = inv_cov * np.outer(keep, keep)
        # The prior always uses the nominal covariance; the PROPOSAL uses the
        # throw matrix, which may carry full/sub-block overrides
        # (``ParameterHandlerBase.cpp:158-236``) — or, with PCA constructed,
        # the rectangular [P, K] reduced-basis factor (``PCAHandler.cpp:194-226``:
        # the reference proposes in the PCA basis every step; folding the basis
        # into the throw factor is distributionally identical with no per-step
        # TransferToPCA/TransferToParam round trips).
        if ps.pca is not None:
            from ..core.exceptions import ConfigError

            pca = ps.pca
            p = len(ps)
            in_block = np.zeros(p, bool)
            in_block[pca.first : pca.last + 1] = True
            if np.any(ps.fixed & in_block):
                raise ConfigError(
                    "Fixed parameters inside the PCA block are not supported "
                    "(elementwise zeroing would rotate throws out of the kept "
                    "subspace); fix them outside the block or shrink the block"
                )
            chol = np.array(pca.throw_matrix, np.float64)
            # Step scales follow ``PCAHandler::CorrelateSteps``
            # (``PCAHandler.cpp:194-226``): decomposed components all share the
            # FIRST decomposed parameter's step scale (applied in the PCA
            # basis); undecomposed components keep their individual scales.
            # Fold both into the factor so the elementwise multiply in
            # ``propose_step`` is the identity and throws never leave the kept
            # subspace.
            chol[:, : pca.n_kept] *= ps.step_scales[pca.first] * ps.global_step_scale
            out_rows = ~in_block
            row_scale = ps.step_scales * ps.global_step_scale * (~ps.fixed)
            chol[out_rows, pca.n_kept :] *= row_scale[out_rows, None]
            scale = np.ones(p)
        else:
            chol = np.linalg.cholesky(ps.throw_matrix)
            scale = ps.step_scales * ps.global_step_scale * (~ps.fixed)
        return cls(
            prefit=jnp.asarray(ps.prefit, ATYPE),
            inv_cov=jnp.asarray(inv_cov, ATYPE),
            chol=jnp.asarray(chol, ATYPE),
            step_scale=jnp.asarray(scale, ATYPE),
            low_bound=jnp.asarray(ps.low_bounds, ATYPE),
            up_bound=jnp.asarray(ps.up_bounds, ATYPE),
            flat_prior=jnp.asarray(flat),
            fixed=jnp.asarray(ps.fixed.astype(bool)),
            circ_mask=jnp.asarray(ps.circ_mask.astype(bool)),
            circ_low=jnp.asarray(ps.circ_low, ATYPE),
            circ_high=jnp.asarray(ps.circ_high, ATYPE),
            flip_mask=jnp.asarray(ps.flip_mask.astype(bool)),
            flip_point=jnp.asarray(ps.flip_point, ATYPE),
        )


def circular_wrap(value: jnp.ndarray, low: jnp.ndarray, high: jnp.ndarray) -> jnp.ndarray:
    """Wrap into [low, high] with the reference's fmod semantics
    (``ParameterHandlerBase.cpp:769-778`` ``CircularParBounds``)."""
    width = high - low
    above = low + jnp.fmod(value - high, width)
    below = high - jnp.fmod(low - value, width)
    return jnp.where(value > high, above, jnp.where(value < low, below, value))


def propose_step(
    model: PriorModel, current: jnp.ndarray, key: jax.Array,
    z: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """One correlated Metropolis proposal for a single chain.

    current: [P] -> proposed: [P]. vmap over chains for the batch axis.
    ``z`` injects the standard-normal throws directly, the reference's
    ``SetRandomThrow`` CI/debug hook (``ParameterHandlerBase.h:68-74``);
    by default they are drawn from ``key``.
    """
    key_norm, key_flip = jax.random.split(key)
    # z dimension follows the throw-matrix columns: square Cholesky normally,
    # rectangular [P, K] when a PCA-reduced basis is in use (params/pca.py).
    if z is None:
        z = jax.random.normal(key_norm, (model.chol.shape[1],), dtype=ATYPE)
    # Correlated throw: chol @ z, scaled per-parameter. Fixed params have
    # step_scale 0 so they never move (reference zeroes their randParams).
    delta = model.chol @ z
    prop = current + delta * model.step_scale

    # Circular bounds (before flips, matching reference order).
    wrapped = circular_wrap(prop, model.circ_low, model.circ_high)
    prop = jnp.where(model.circ_mask & ~model.fixed, wrapped, prop)

    # Random flips about a point (mass-ordering): each flip param flips with
    # probability 1/2 (``FlipParameterValue``, ``ParameterHandlerBase.cpp:780-784``).
    do_flip = jax.random.uniform(key_flip, (model.n_params,)) < 0.5
    flipped = 2.0 * model.flip_point - prop
    prop = jnp.where(model.flip_mask & ~model.fixed & do_flip, flipped, prop)
    return prop


def propose_step_batch(
    model: PriorModel, current: jnp.ndarray, key: jax.Array,
    scale: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Correlated proposals for a CHAIN BATCH: current [C, P] -> [C, P].

    Identical distribution to ``vmap(propose_step)`` but with TWO rng calls
    total (one normal batch, one uniform batch) instead of per-chain key
    splits — hundreds of tiny threefry derivations per step measurably cost
    on TPU — and the Cholesky correlation as ONE [C, K] @ [K, P] matmul.

    scale: optional [C] per-chain throw multiplier (parallel tempering scales
    hot chains' throws by sqrt(T)); None = 1.
    """
    key_norm, key_flip = jax.random.split(key)
    c = current.shape[0]
    z = jax.random.normal(key_norm, (c, model.chol.shape[1]), dtype=ATYPE)
    delta = (z @ model.chol.T) * model.step_scale[None, :]
    if scale is not None:
        delta = delta * scale[:, None]
    prop = current + delta

    wrapped = circular_wrap(prop, model.circ_low, model.circ_high)
    prop = jnp.where(model.circ_mask & ~model.fixed, wrapped, prop)

    do_flip = jax.random.uniform(key_flip, (c, model.n_params)) < 0.5
    flipped = 2.0 * model.flip_point - prop
    return jnp.where(model.flip_mask & ~model.fixed & do_flip, flipped, prop)


def prior_logl(model: PriorModel, prop: jnp.ndarray) -> jnp.ndarray:
    """Gaussian prior -logL: 1/2 d^T V^-1 d with flat priors excluded
    (``ParameterHandlerBase.cpp:816-841``). f64 matvec over a small P."""
    d = jnp.where(model.flat_prior, 0.0, prop.astype(ATYPE) - model.prefit)
    return 0.5 * d @ (model.inv_cov @ d)


def count_out_of_bounds(model: PriorModel, prop: jnp.ndarray) -> jnp.ndarray:
    """Number of parameters outside physical bounds (``CheckBounds``, ``:844-856``)."""
    outside = (prop > model.up_bound) | (prop < model.low_bound)
    return jnp.sum(outside.astype(jnp.int32))


def get_likelihood(model: PriorModel, prop: jnp.ndarray) -> jnp.ndarray:
    """Prior -logL with the out-of-bounds sentinel (``GetLikelihood``, ``:859-867``).

    Returns ``NOutside * _LARGE_LOGL_`` when any parameter is out of bounds.
    Branchless: both terms are computed and selected, which is the right shape
    for TPU (uniform compute, masked result).
    """
    n_out = count_out_of_bounds(model, prop)
    penalty = prior_logl(model, prop)
    return jnp.where(n_out > 0, n_out.astype(ATYPE) * LARGE_LOGL, penalty)
