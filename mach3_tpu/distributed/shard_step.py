"""shard_map multi-chip MCMC: the explicit-collectives form of the fit step.

Two ways to run a multi-chip fit:

* **GSPMD jit** (``mesh.py`` + plain ``jax.jit``): shardings annotate the
  arrays and XLA partitions the XLA-path step automatically. This is the
  zero-effort form, but it cannot partition an opaque ``pallas_call`` — on a
  real multi-chip TPU the fused reweight kernel's operands would be forced
  replicated.
* **shard_map** (this module): the step function runs per-shard on local
  blocks with explicit collectives — the fused Pallas kernel executes on each
  shard's local (chains x events) block, partial histograms ``psum`` over the
  event axis, pooled-adaptation moments and Robbins-Monro acceptance ``pmean``
  over the chain axis, and per-shard RNG decorrelates by folding in the chain
  shard index (``fitters/mcmc.make_step_fn_args(chain_axis=..., event_axis=...)``).

This is the scaling design SURVEY §2.9 calls for: chains = data-parallel
axis, events = model-parallel (FSDP-like) axis, collectives riding ICI.
The reference's equivalent is independent processes + offline merging
(``Diagnostics/CombineMaCh3Chains.cpp``) — no in-fit communication at all.
"""
from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.4.35 exposes it at the top level
    from jax import shard_map  # type: ignore[attr-defined]
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

import inspect as _inspect

# The replication-check kwarg was renamed check_rep -> check_vma across jax
# versions; outputs marked replicated here are computed identically on every
# shard (pmean'd adaptation, split keys), so the check is safely disabled.
_CHECK_KW = (
    "check_vma"
    if "check_vma" in _inspect.signature(shard_map).parameters
    else "check_rep"
)

from ..core.logging import get_logger
from ..fitters.mcmc import AdaptiveState, ChainState, MCMCConfig, make_step_fn_args
from .mesh import CHAIN_AXIS, EVENT_AXIS, _event_spec_for_path

_log = get_logger("distributed")


def model_pspecs(model: Any) -> Any:
    """PartitionSpec pytree for a FitModel: event axes sharded over
    EVENT_AXIS (same field map as GSPMD placement), everything else
    replicated."""

    def spec(path, leaf):
        if not hasattr(leaf, "ndim"):
            return P()
        return _event_spec_for_path(jax.tree_util.keystr(path), leaf.ndim)

    return jax.tree_util.tree_map_with_path(spec, model)


def state_pspecs(state: ChainState) -> ChainState:
    """PartitionSpec pytree for a ChainState: chain-batch leaves sharded over
    CHAIN_AXIS; RNG key, step counter and pooled adaptive moments replicated
    (per-chain adaptive moments ride the chain axis)."""
    ad = None
    if state.adaptive is not None:
        pc = state.adaptive.per_chain
        ad = AdaptiveState(
            mean=P(CHAIN_AXIS, None) if pc else P(),
            cov=P(CHAIN_AXIS, None, None) if pc else P(),
            chol=P(CHAIN_AXIS, None, None) if pc else P(),
            n_updates=P(),
            log_scale=P(CHAIN_AXIS) if pc else P(),
        )
    return ChainState(
        theta=P(CHAIN_AXIS, None),
        nll=P(CHAIN_AXIS),
        key=P(),
        step=P(),
        n_accepted=P(CHAIN_AXIS),
        adaptive=ad,
    )


def _out_pspecs(config: MCMCConfig) -> dict:
    """Specs for the scanned per-step outputs (leading time axis unsharded)."""
    out = {
        "theta": P(None, CHAIN_AXIS, None),
        "nll": P(None, CHAIN_AXIS),
        "acc_prob": P(None, CHAIN_AXIS),
        "accepted": P(None, CHAIN_AXIS),
    }
    if config.record_breakdown:
        out["prior_nll_parts"] = P(None, CHAIN_AXIS, None)
        out["sample_nll_parts"] = P(None, CHAIN_AXIS, None)
    return out


def prepare_model_for_shard_map(model: Any, n_event_shards: int = 1) -> Any:
    """Make a FitModel shardable:

    * drop ``norm_onehot`` ([E*W, NP+1] interleaves the W norm slots inside
      its leading axis, so an even split would cut within an event — the
      log-matmul ``norm_s`` / gather paths take over; they are the
      reference-scale paths anyway), and
    * pad every sample's event axis to a multiple of ``n_event_shards`` with
      zero-weight copies of the last event (weight 0 ⇒ no histogram
      contribution, so likelihoods are bit-for-bit unchanged).
    """

    def pad_sample(s):
        e = s.n_events
        target = -(-e // n_event_shards) * n_event_shards
        pad = target - e
        if pad == 0:
            return s

        def pad_leaf(path, leaf):
            if not hasattr(leaf, "ndim") or leaf.ndim == 0:
                return leaf
            key = jax.tree_util.keystr(path)
            spec = _event_spec_for_path(key, leaf.ndim)
            axes = [i for i, ax in enumerate(spec) if ax == EVENT_AXIS]
            if not axes or leaf.shape[axes[0]] != e:
                return leaf
            widths = [(0, 0)] * leaf.ndim
            widths[axes[0]] = (0, pad)
            if key.endswith("mc_weight"):
                return jnp.pad(leaf, widths)  # zero weight: inert events
            return jnp.pad(leaf, widths, mode="edge")

        return jax.tree_util.tree_map_with_path(pad_leaf, s)

    samples = tuple(
        pad_sample(
            s.replace(
                norm_onehot=None,
                # The narrow-histogram tile plan is laid out for the FULL
                # event axis; per-shard local tiling differs — fall back to
                # the wide kernel on shards.
                hist_tile_starts=None,
                hist_nbl=None,
                hist_block_plan=None,
                hist_block_nact=None,
            )
        )
        for s in model.samples
    )
    return model.replace(samples=samples)


def make_sharded_chunk_runner(
    mesh: Mesh, config: MCMCConfig, model: Any, state: ChainState
):
    """Jitted ``run(model, state, n_steps) -> (state, outputs)`` where the
    n-step scan executes inside shard_map over the (chains, events) mesh.

    The model/state passed at call time must be placed to match the specs
    (``mesh.shard_fit_model`` / ``mesh.chain_state_sharding``); the chain
    count must divide by the chain-shard count and every sample's event count
    by the event-shard count (pad events with zero-weight rows otherwise).
    """
    step = make_step_fn_args(config, chain_axis=CHAIN_AXIS, event_axis=EVENT_AXIS)
    mspecs = model_pspecs(model)
    sspecs = state_pspecs(state)
    ospecs = _out_pspecs(config)
    _log.info(
        "sharded step: %d chain-shards x %d event-shards",
        mesh.shape[CHAIN_AXIS], mesh.shape[EVENT_AXIS],
    )

    def chunk(n, mdl, st):
        def body(s, _):
            return step(mdl, s)

        return jax.lax.scan(body, st, None, length=n)

    @partial(jax.jit, static_argnums=2)
    def run(mdl, st, n):
        f = shard_map(
            partial(chunk, n),
            mesh=mesh,
            in_specs=(mspecs, sspecs),
            out_specs=(sspecs, ospecs),
            **{_CHECK_KW: False},
        )
        return f(mdl, st)

    return run
