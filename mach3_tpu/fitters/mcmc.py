"""MR2T2 — Metropolis-Hastings MCMC, vectorised over a chain batch axis.

TPU-native redesign of the reference's production algorithm
(``Fitters/MR2T2.cpp``, ``Fitters/MCMCBase.cpp``):

* The per-step object dance (propose -> reweight -> accept -> tree fill)
  becomes ONE pure jitted function ``(ChainState) -> ChainState`` scanned with
  ``lax.scan`` over a chunk of steps; many chains run as a leading batch axis
  (``vmap``), sharded across chips by the caller (``distributed/``).
* The reference's out-of-bounds reweight short-circuit (``MR2T2.cpp:51-62``)
  becomes uniform compute + sentinel masking (TPU compute is lockstep).
* Adaptive covariance (Haario) and acceptance-rate tracking are carried in the
  state as running moments — with per-chain or cross-chain-pooled estimation,
  the latter being a capability the single-chain reference cannot have
  (``Parameters/AdaptiveMCMCHandler.cpp:332-400``).
* Simulated annealing matches ``MR2T2::AcceptanceProbability``
  (``MR2T2.cpp:103-115``): ``exp(-dL / exp(-step / T))``.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..core.logging import get_logger
from ..core.precision import ATYPE, LARGE_LOGL
from .model import FitModel

_log = get_logger("mcmc")

#: Models whose arrays total at most this many bytes are BAKED into the
#: compiled chunk as HLO constants; larger models ride as traced arguments.
#: Constants let XLA specialise gathers/layouts around the static tables —
#: measured 2.7x step throughput on the 100k-event toy (2.86 vs 7.65 ms/step
#: at 256 chains on one v5e) — but the remote TPU compile service rejects
#: programs with GB-scale embedded constants (HTTP 413), hence the cap.
#: Override with MACH3_BAKE_LIMIT_MB (0 disables baking entirely).
BAKE_LIMIT_MB_DEFAULT = 64


def _model_nbytes(model) -> int:
    return sum(
        x.nbytes for x in jax.tree_util.tree_leaves(model) if hasattr(x, "nbytes")
    )


def make_chunk_runner(run_chunk, model, n_static: int = 1):
    """jit ``run_chunk(model, state, *static)`` with the model either baked
    as constants (small models; see BAKE_LIMIT_MB_DEFAULT) or as a traced
    argument (reference scale). The returned callable keeps the
    ``(model, state, *static)`` signature either way; when baked, the model
    passed at CALL time is ignored in favour of the construction-time
    snapshot (fitters never swap their model after __init__)."""
    import os

    limit = float(os.environ.get("MACH3_BAKE_LIMIT_MB", BAKE_LIMIT_MB_DEFAULT))
    statics = tuple(range(1, 1 + n_static))
    if 0 < _model_nbytes(model) <= limit * 1024 * 1024:
        inner = jax.jit(
            lambda state, *sargs: run_chunk(model, state, *sargs),
            static_argnums=statics,
        )
        baked_leaves = jax.tree_util.tree_leaves(model)
        baked_ids = tuple(id(x) for x in baked_leaves)

        def call_baked(mdl, state, *sargs):
            # The baked executable ignores the call-time model: refuse a
            # swapped model loudly instead of silently using the stale bake.
            lv = jax.tree_util.tree_leaves(mdl)
            if tuple(id(x) for x in lv) != baked_ids:
                raise ValueError(
                    "this chunk runner baked its model into the compiled "
                    "program at construction; a different model pytree was "
                    "passed at call time. Rebuild the fitter for the new "
                    "model, or set MACH3_BAKE_LIMIT_MB=0 to pass models as "
                    "traced arguments."
                )
            return inner(state, *sargs)

        return call_baked
    return jax.jit(run_chunk, static_argnums=tuple(s + 1 for s in statics))


@struct.dataclass
class AdaptiveState:
    """Running moments for Haario adaptive covariance.

    Two modes (``MCMCConfig.adaption_mode``):

    * ``"pooled"`` — one set of moments shared by all chains (mean [P],
      cov/chol [P, P], log_scale scalar): each step contributes the
      chain-averaged outer products. A cross-chain capability the
      single-chain reference cannot have.
    * ``"per_chain"`` — the reference semantics
      (``AdaptiveMCMCHandler.cpp:332-400``): every chain carries its own
      moments (mean [C, P], cov/chol [C, P, P], log_scale [C]) and follows
      the single-chain Haario recursion exactly.

    ``chol`` is refreshed every ``update_step`` steps from the scaled
    covariance; ``log_scale`` is the Robbins-Monro global scale.
    """

    mean: jnp.ndarray  # [P] pooled | [C, P] per-chain
    cov: jnp.ndarray  # [P, P] | [C, P, P]
    chol: jnp.ndarray  # current throw matrix (replaces PriorModel.chol)
    n_updates: jnp.ndarray  # i32 — steps accumulated into the moments
    log_scale: jnp.ndarray  # Robbins-Monro global scale (log), target-acceptance tuned

    @property
    def per_chain(self) -> bool:
        """Static mode discriminator (array ranks are trace-time constants)."""
        return self.cov.ndim == 3


@struct.dataclass
class ChainState:
    theta: jnp.ndarray  # [C, P]
    nll: jnp.ndarray  # [C] current -logL (prior + samples)
    key: jax.Array
    step: jnp.ndarray  # i32 global step counter
    n_accepted: jnp.ndarray  # [C] i32
    adaptive: AdaptiveState | None = None


@dataclasses.dataclass(frozen=True)
class MCMCConfig:
    """Static knobs (reference YAML ``General.MCMC`` + ``AdaptionOptions``)."""

    n_steps: int = 1000
    chunk_size: int = 100  # steps per jitted scan; host sees outputs per chunk
    anneal_temp: float | None = None  # simulated annealing temperature (MCMCBase.cpp:19-26)
    # Adaptive covariance (AdaptiveMCMCHandler.cpp:68-98 config keys)
    adaptive: bool = False
    # "pooled" (cross-chain moments, TPU-native generalisation) or
    # "per_chain" (the reference's single-chain Haario recursion per chain).
    adaption_mode: str = "pooled"
    adaption_start_throw: int = 1000  # start throwing with the adapted matrix
    adaption_start_update: int = 100  # start accumulating moments
    adaption_end_update: int = 1_000_000
    adaption_update_step: int = 100  # refresh Cholesky cadence
    # Adaption blocks (``AdaptiveMCMCHandler::SetAdaptiveBlocks``,
    # ``AdaptiveMCMCHandler.cpp:152-190``): each entry is a flat tuple of
    # (lower, upper) index pairs assigned to that block; unassigned parameters
    # form the default block. The adapted covariance is masked to
    # block-diagonal — cross-block correlations are never learned.
    adaption_blocks: tuple[tuple[int, ...], ...] | None = None
    target_scale: float | None = None  # None -> 2.38^2 / d (Haario optimal)
    # Robbins-Monro global-scale adaptation towards the optimal acceptance
    # rate (reference ``AdaptiveMCMCHandler.h:228-239``, target 0.234).
    robbins_monro: bool = True
    target_accept: float = 0.234
    # Record per-sample / per-handler -logL pieces each step, the reference's
    # ``LogL_sample_*`` / ``LogL_systematic_*`` chain branches
    # (``Fitters/FitterBase.cpp:185-197``). Reuses the step's likelihood
    # evaluation — no extra reweight.
    record_breakdown: bool = False


def _masked_cholesky(cov: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Cholesky with a diagonal jitter floor so early (rank-deficient) moment
    estimates do not produce NaNs."""
    d = cov.shape[0]
    jitter = eps * jnp.eye(d, dtype=cov.dtype)
    return jnp.linalg.cholesky(cov + jitter)


def adaption_block_mask(n_params: int, blocks) -> jnp.ndarray | None:
    """[P, P] 0/1 mask keeping only same-block covariance entries (None when
    no blocks are configured — everything adapts jointly)."""
    if not blocks:
        return None
    ids = np.zeros(n_params, np.int32)
    for b, ranges in enumerate(blocks):
        for k in range(0, len(ranges) - 1, 2):
            lb, ub = int(ranges[k]), int(ranges[k + 1])
            if lb > n_params or ub > n_params:
                raise ValueError(
                    f"Adaption block [{lb}, {ub}) exceeds {n_params} parameters"
                )
            ids[lb:ub] = b + 1
    return jnp.asarray((ids[:, None] == ids[None, :]).astype(np.float64))


def adaptive_propose(
    flat, ad: AdaptiveState, theta: jnp.ndarray, key: jax.Array,
    extra_scale: float = 1.0,
) -> jnp.ndarray:
    """Batched adaptive throw from the adapted matrix, shared by every fitter
    (the reference keeps adaptation in the parameter handler so all fitters
    see it, ``ParameterHandlerBase.cpp:652-684``): one normal batch, one
    Cholesky contraction, whole-vector wraps/flips. ``extra_scale`` is the
    delayed-rejection cascade's shrink factor (1.0 for plain MR2T2).

    theta [C, P] -> proposed [C, P]. Pooled mode uses the shared [P, P]
    matrix; per-chain mode contracts each chain with its own [P, P] factor.
    """
    from ..params.state import circular_wrap

    n_chains, n_params = theta.shape
    key_n, key_f = jax.random.split(key)
    z = jax.random.normal(key_n, (n_chains, n_params), dtype=ATYPE)
    if ad.per_chain:
        delta = jnp.einsum("cij,cj->ci", ad.chol, z)
        scale = jnp.exp(ad.log_scale)[:, None] * extra_scale
    else:
        delta = z @ ad.chol.T
        scale = jnp.exp(ad.log_scale) * extra_scale
    prop = theta + scale * delta
    prop = jnp.where(flat.fixed, theta, prop)
    wrapped = circular_wrap(prop, flat.circ_low, flat.circ_high)
    prop = jnp.where(flat.circ_mask & ~flat.fixed, wrapped, prop)
    do_flip = jax.random.uniform(key_f, (n_chains, n_params)) < 0.5
    flipped = 2.0 * flat.flip_point - prop
    return jnp.where(flat.flip_mask & ~flat.fixed & do_flip, flipped, prop)


def make_step_fn_args(
    config: MCMCConfig,
    chain_axis: str | None = None,
    event_axis: str | None = None,
) -> Callable[[FitModel, ChainState], tuple[ChainState, dict[str, jnp.ndarray]]]:
    """Build the pure single-step transition ``step(model, state)`` with the
    model passed as a TRACED pytree argument.

    Passing the model as an argument (rather than closing over it) keeps its
    arrays — at reference scale, GBs of spline/norm tables — out of the
    compiled program's constants. The remote-TPU compile service rejects
    HLO with embedded GB-scale constants (HTTP 413), and even locally,
    argument buffers are shared across executables while constants are not.

    chain_axis / event_axis: mesh axis names when the step runs INSIDE
    ``shard_map`` (``distributed/shard_step.py``). The chain axis decorrelates
    per-shard RNG (fold_in of the shard index) and pools cross-chain
    reductions (adaptive moments, Robbins-Monro acceptance) with ``pmean``;
    the event axis ``psum``s the partial per-shard histograms. ``None`` (the
    default) is the single-device / GSPMD-jit form.
    """

    def step_fn(model: FitModel, state: ChainState):
        block_mask = adaption_block_mask(model.n_params, config.adaption_blocks)
        key, k_prop, k_acc = jax.random.split(state.key, 3)
        n_chains = state.theta.shape[0]
        if chain_axis is not None:
            # Same base key on every shard: fold in the chain-shard index so
            # shards draw independent throws, while event shards (same
            # chains) stay identical.
            shard = jax.lax.axis_index(chain_axis)
            k_prop = jax.random.fold_in(k_prop, shard)
            k_acc = jax.random.fold_in(k_acc, shard)

        if state.adaptive is None:
            from ..params.state import propose_step_batch

            proposed = propose_step_batch(model._flat(), state.theta, k_prop)
        else:
            proposed = adaptive_propose(
                model._flat(), state.adaptive, state.theta, k_prop
            )
        nll_prop, prior_parts, sample_parts = model.total_nll_batch_parts(
            proposed, want_parts=config.record_breakdown, event_axis=event_axis
        )

        # Acceptance probability (MR2T2.cpp:103-115)
        d_nll = nll_prop - state.nll
        if config.anneal_temp is not None:
            temp = jnp.exp(-state.step.astype(ATYPE) / config.anneal_temp)
            log_acc = -d_nll / temp
        else:
            log_acc = -d_nll
        acc_prob = jnp.minimum(1.0, jnp.exp(jnp.minimum(log_acc, 0.0)))

        u = jax.random.uniform(k_acc, (n_chains,), dtype=ATYPE)
        out_of_bounds = nll_prop >= LARGE_LOGL
        accept = (~out_of_bounds) & (u < acc_prob)

        theta = jnp.where(accept[:, None], proposed, state.theta)
        nll = jnp.where(accept, nll_prop, state.nll)
        step = state.step + 1

        adaptive = state.adaptive
        if adaptive is not None:
            adaptive = _update_adaptive(
                adaptive, theta, step, config, acc_prob, block_mask,
                chain_axis=chain_axis,
            )

        new_state = ChainState(
            theta=theta,
            nll=nll,
            key=key,
            step=step,
            n_accepted=state.n_accepted + accept.astype(jnp.int32),
            adaptive=adaptive,
        )
        outputs = {
            "theta": theta,
            "nll": nll,
            "acc_prob": acc_prob,
            "accepted": accept,
        }
        if config.record_breakdown:
            # Pieces of the PROPOSED step's -logL — matching the reference,
            # whose per-sample/per-syst branches hold the values of the last
            # Reweight (the proposal) at tree-fill time.
            outputs["prior_nll_parts"] = prior_parts
            outputs["sample_nll_parts"] = sample_parts
        return new_state, outputs

    return step_fn


def make_step_fn(
    model: FitModel, config: MCMCConfig
) -> Callable[[ChainState], tuple[ChainState, dict[str, jnp.ndarray]]]:
    """Single-step transition closing over the model — the convenience form
    for tests/small models. Production drivers use ``make_step_fn_args`` and
    pass the model per call (see its docstring for why)."""
    inner = make_step_fn_args(config)

    def step_fn(state: ChainState):
        return inner(model, state)

    return step_fn


def _moment_update(
    mean: jnp.ndarray, cov: jnp.ndarray, n: jnp.ndarray,
    x: jnp.ndarray, xxt: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """One Haario recursion step (``AdaptiveMCMCHandler.cpp:332-400``):
    mean/cov [P]/[P, P] updated with one sample x (outer product xxt)."""
    new_mean = (x + mean * n) / (n + 1.0)
    # cov_t = cov*(n-1)/n + (n*m_prev m_prev^T - (n+1)*m m^T + x x^T)/n, n>0
    safe_n = jnp.maximum(n, 1.0)
    cov_updated = cov * (safe_n - 1.0) / safe_n + (
        n * jnp.outer(mean, mean)
        - (n + 1.0) * jnp.outer(new_mean, new_mean)
        + xxt
    ) / safe_n
    new_cov = jnp.where(n > 0, cov_updated, cov)
    return new_mean, new_cov


def _update_adaptive(
    ad: AdaptiveState,
    theta: jnp.ndarray,
    step: jnp.ndarray,
    config: MCMCConfig,
    acc_prob: jnp.ndarray,
    block_mask: jnp.ndarray | None = None,
    chain_axis: str | None = None,
) -> AdaptiveState:
    """Haario moment update, pooled or per-chain (see :class:`AdaptiveState`).

    Pooled generalises ``AdaptiveMCMCHandler.cpp:332-400``: each step
    contributes the chain-averaged outer products (C samples at once).
    Per-chain runs the reference recursion independently per chain.
    ``chain_axis``: inside shard_map, pooled reductions span all shards
    (pmean over the mesh axis); per-chain mode needs no communication.
    """
    in_window = (step >= config.adaption_start_update) & (step <= config.adaption_end_update)
    th = theta.astype(ATYPE)
    n = ad.n_updates.astype(ATYPE)
    if ad.per_chain:
        xxt = jnp.einsum("ci,cj->cij", th, th)
        new_mean, new_cov = jax.vmap(_moment_update, in_axes=(0, 0, None, 0, 0))(
            ad.mean, ad.cov, n, th, xxt
        )
    else:
        x = jnp.mean(th, axis=0)  # pooled "current value" [P]
        xxt = jnp.einsum("ci,cj->ij", th, th) / th.shape[0]
        if chain_axis is not None:
            x = jax.lax.pmean(x, chain_axis)
            xxt = jax.lax.pmean(xxt, chain_axis)
        new_mean, new_cov = _moment_update(ad.mean, ad.cov, n, x, xxt)
    if block_mask is not None:
        # Independent adaption blocks: cross-block entries never learned
        # (``SetAdaptiveBlocks``, ``AdaptiveMCMCHandler.cpp:152-190``).
        new_cov = new_cov * block_mask

    mean = jnp.where(in_window, new_mean, ad.mean)
    cov = jnp.where(in_window, new_cov, ad.cov)
    n_updates = ad.n_updates + in_window.astype(jnp.int32)

    # Refresh the throw matrix on cadence once throwing has started.
    d = theta.shape[1]
    scale = config.target_scale if config.target_scale is not None else 5.6644 / d
    refresh = (
        (step >= config.adaption_start_throw)
        & ((step - config.adaption_start_throw) % config.adaption_update_step == 0)
    )
    chol_fn = jax.vmap(_masked_cholesky) if ad.per_chain else _masked_cholesky
    chol = jax.lax.cond(
        refresh,
        lambda: chol_fn(cov * scale),
        lambda: ad.chol,
    )

    # Robbins-Monro global-scale update towards the target acceptance rate
    # (stochastic approximation: log s += gamma_t (acc - target)); pooled
    # tunes one shared scale from the mean acceptance, per-chain tunes each
    # chain's scale from its own acceptance probability.
    if config.robbins_monro:
        t = jnp.maximum(step.astype(ATYPE), 1.0)
        gamma = 2.0 / t**0.66
        acc = acc_prob if ad.per_chain else jnp.mean(acc_prob)
        if chain_axis is not None and not ad.per_chain:
            acc = jax.lax.pmean(acc, chain_axis)
        log_scale = ad.log_scale + gamma * (acc - config.target_accept)
        log_scale = jnp.clip(log_scale, -8.0, 4.0)
    else:
        log_scale = ad.log_scale
    return AdaptiveState(
        mean=mean, cov=cov, chol=chol, n_updates=n_updates, log_scale=log_scale
    )


class MR2T2:
    """Chunked MCMC driver: jit-compiled scan per chunk, host-side chain storage.

    Mirrors ``MCMCBase::RunMCMC`` (``Fitters/MCMCBase.cpp:32-123``): the chunk
    boundary is where the reference fills its TTree and auto-saves.
    """

    def __init__(self, model: FitModel, config: MCMCConfig, init_theta: np.ndarray, seed: int = 0):
        self.model = model
        self.config = config
        n_chains, n_params = init_theta.shape
        step_fn = make_step_fn_args(config)

        # Small models are BAKED into the chunk as constants (2.7x faster);
        # reference-scale models ride as traced arguments (remote compile
        # rejects GB-scale constants). See make_chunk_runner.
        def run_chunk(mdl: FitModel, state: ChainState, n_steps: int):
            def body(s, _):
                return step_fn(mdl, s)

            return jax.lax.scan(body, state, None, length=n_steps)

        self._run_chunk = make_chunk_runner(run_chunk, model)

        adaptive = None
        if config.adaptive and any(
            p.chol.shape[0] != p.chol.shape[1] for p in model.priors
        ):
            raise ValueError(
                "Adaptive covariance on a PCA-reduced proposal basis is not "
                "supported: adaptation learns in full parameter space and "
                "would re-introduce the dropped directions. Use PCA or "
                "adaptive, not both."
            )
        if config.adaptive:
            # Seed the moments with the prior covariance scaled like the
            # initial throw matrix (reference initial_throw_matrix); the
            # initial Cholesky carries the Haario 2.38^2/d optimal scaling.
            cov0 = self._initial_cov()
            scale0 = (
                config.target_scale if config.target_scale is not None else 5.6644 / n_params
            )
            chol0 = np.linalg.cholesky(scale0 * cov0 + 1e-12 * np.eye(n_params))
            if config.adaption_mode == "per_chain":
                adaptive = AdaptiveState(
                    mean=jnp.zeros((n_chains, n_params), ATYPE),
                    cov=jnp.tile(jnp.asarray(cov0, ATYPE), (n_chains, 1, 1)),
                    chol=jnp.tile(jnp.asarray(chol0, ATYPE), (n_chains, 1, 1)),
                    n_updates=jnp.asarray(0, jnp.int32),
                    log_scale=jnp.zeros((n_chains,), ATYPE),
                )
            elif config.adaption_mode == "pooled":
                adaptive = AdaptiveState(
                    mean=jnp.zeros((n_params,), ATYPE),
                    cov=jnp.asarray(cov0, ATYPE),
                    chol=jnp.asarray(chol0, ATYPE),
                    n_updates=jnp.asarray(0, jnp.int32),
                    log_scale=jnp.asarray(0.0, ATYPE),
                )
            else:
                raise ValueError(
                    f"adaption_mode must be 'pooled' or 'per_chain', got "
                    f"{config.adaption_mode!r}"
                )

        theta0 = jnp.asarray(init_theta, ATYPE)
        nll0 = jax.jit(lambda m, t: m.total_nll_batch(t))(model, theta0)
        n_oob = int(np.asarray(jnp.sum(nll0 >= LARGE_LOGL, dtype=jnp.int32)))
        if n_oob:
            # A chain at the sentinel may never repair itself (accept requires
            # an in-bounds proposal, and narrow parameters — e.g. a 3e-5-wide
            # dm2_21 prior — make that a vanishing-probability event under
            # prior-scaled throws). Loud warning, not an error: deliberate
            # OOB starts are conceivable in tests.
            _log.warning(
                "%d/%d initial chains are OUT OF BOUNDS (nll at the "
                "LARGE_LOGL sentinel) — they will likely stay stuck; clip "
                "the initial throws into the parameter bounds",
                n_oob, theta0.shape[0],
            )
        self.state = ChainState(
            theta=theta0,
            nll=nll0,
            key=jax.random.key(seed),
            step=jnp.asarray(0, jnp.int32),
            n_accepted=jnp.zeros((n_chains,), jnp.int32),
            adaptive=adaptive,
        )

    def _initial_cov(self) -> np.ndarray:
        """Block-diagonal prior covariance scaled by the per-param step scales."""
        blocks = []
        for prior in self.model.priors:
            chol = np.asarray(prior.chol)
            scale = np.asarray(prior.step_scale)
            c = chol * scale[:, None]
            blocks.append(c @ c.T)
        total = sum(b.shape[0] for b in blocks)
        cov = np.zeros((total, total))
        at = 0
        for b in blocks:
            cov[at : at + b.shape[0], at : at + b.shape[0]] = b
            at += b.shape[0]
        return cov

    def run(
        self, n_steps: int | None = None, callback=None, collect: bool = True
    ) -> dict[str, np.ndarray]:
        """Run the chain; returns host-side arrays
        theta [S, C, P], nll [S, C], acc_prob [S, C], accepted [S, C],
        step_time [S] (per-step wall seconds, the reference's ``stepTime``
        branch, ``Fitters/FitterBase.h:140-142``).

        Double-buffered chain fetch: chunk k+1 is DISPATCHED before chunk
        k's outputs are converted to host, so the device->host transfer of
        the draws (expensive over the remote-TPU tunnel: ~2.9 of 5.8
        ms/step measured on the 256-chain toy) overlaps the next chunk's
        compute. Results and callback semantics are unchanged — each
        callback still sees its own chunk's host draws (one dispatch behind
        the device).

        collect=False: STREAMING mode (the reference's TTree role,
        ``FitterBase.cpp:153-205``) — chunks are handed to ``callback``
        only and dropped; nothing accumulates in host RAM and run()
        returns {}. Pair with ``diagnostics.chain_io.ChainShardWriter``."""
        import time

        n_steps = n_steps or self.config.n_steps
        if n_steps <= 0:
            return {}
        chunks: list[dict[str, np.ndarray]] = []
        done = 0
        pending: tuple | None = None  # (done, state, out, t0, n)

        def drain(pend):
            done_p, state_p, out_p, t0_p, n_p = pend
            if not collect and callback is None:
                # nobody consumes the draws: skip the device->host fetch
                # entirely (the remote-TPU tunnel reads ~15-27 MB/s on first
                # touch — a [250, 1024, P] f64 chunk costs seconds)
                return
            host = {k: np.asarray(v) for k, v in out_p.items()}
            host["step_time"] = np.full(n_p, (time.perf_counter() - t0_p) / n_p)
            if collect:
                chunks.append(host)
            if callback is not None:
                callback(done_p, state_p, host)

        while done < n_steps:
            n = min(self.config.chunk_size, n_steps - done)
            t0 = time.perf_counter()
            self.state, out = self._run_chunk(self.model, self.state, n)
            done += n
            if pending is not None:
                drain(pending)
            pending = (done, self.state, out, t0, n)
        drain(pending)
        if not collect:
            return {}
        return {k: np.concatenate([c[k] for c in chunks], axis=0) for k in chunks[0]}

    def online_rhat(self, recent: dict[str, np.ndarray]) -> np.ndarray:
        """Split R-hat over the chains of a chunk's draws — cheap online
        convergence telemetry between autosaves (a capability the reference's
        offline-only RHat tool lacks)."""
        from ..diagnostics.rhat import split_rhat

        return np.asarray(split_rhat(recent["theta"]))

    @property
    def acceptance_rate(self) -> np.ndarray:
        return np.asarray(self.state.n_accepted) / max(int(self.state.step), 1)
