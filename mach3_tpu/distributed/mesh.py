"""Device meshes and sharding layouts for multi-chip fits.

The reference has NO distributed backend (SURVEY §2.9): scale-out is
independent processes merged offline (``Diagnostics/CombineMaCh3Chains.cpp``).
Here scale-out is first-class: a 2D mesh

* ``chains``  — data-parallel axis: the chain batch is sharded; all per-chain
  state (theta, nll, rng) lives on its shard. Cross-chain pooled adaptation
  and online R-hat become XLA collectives over this axis.
* ``events``  — model-parallel axis: when one replica's event tables exceed
  HBM, the event dimension of every sample array is sharded; the histogram
  ``segment_sum`` then yields partial per-shard histograms that XLA
  all-reduces over ICI automatically (FSDP-like event sharding, SURVEY §2.9).

Everything goes through ``jax.jit`` + ``NamedSharding`` — XLA GSPMD inserts
the collectives; no hand-written communication.
"""
from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.logging import get_logger

_log = get_logger("distributed")

CHAIN_AXIS = "chains"
EVENT_AXIS = "events"


def make_mesh(
    n_chain_shards: int | None = None,
    n_event_shards: int = 1,
    devices=None,
) -> Mesh:
    """Build the (chains, events) mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_chain_shards is None:
        n_chain_shards = n // n_event_shards
    if n_chain_shards * n_event_shards != n:
        raise ValueError(
            f"{n_chain_shards} x {n_event_shards} != {n} devices"
        )
    dev_array = np.asarray(devices).reshape(n_chain_shards, n_event_shards)
    _log.info("Mesh: %d chain-shards x %d event-shards", n_chain_shards, n_event_shards)
    return Mesh(dev_array, (CHAIN_AXIS, EVENT_AXIS))


def chain_state_sharding(mesh: Mesh, state: Any) -> Any:
    """Shard a ChainState pytree: leading chain axis split over CHAIN_AXIS,
    everything else (rng key, step counters, pooled adaptive moments)
    replicated."""

    def spec_for(leaf):
        if hasattr(leaf, "ndim") and leaf.ndim >= 1 and leaf.shape[0] > 1:
            return NamedSharding(mesh, P(CHAIN_AXIS, *([None] * (leaf.ndim - 1))))
        return NamedSharding(mesh, P())

    # theta [C, P], nll [C], n_accepted [C] get the chain axis; key/step/adaptive replicate.
    from ..fitters.mcmc import AdaptiveState, ChainState  # local import, avoids cycle

    assert isinstance(state, ChainState)
    repl = NamedSharding(mesh, P())
    adaptive = None
    if state.adaptive is not None:
        adaptive = AdaptiveState(
            mean=jax.device_put(state.adaptive.mean, repl),
            cov=jax.device_put(state.adaptive.cov, repl),
            chol=jax.device_put(state.adaptive.chol, repl),
            n_updates=jax.device_put(state.adaptive.n_updates, repl),
            log_scale=jax.device_put(state.adaptive.log_scale, repl),
        )
    return ChainState(
        theta=jax.device_put(state.theta, NamedSharding(mesh, P(CHAIN_AXIS, None))),
        nll=jax.device_put(state.nll, NamedSharding(mesh, P(CHAIN_AXIS))),
        key=jax.device_put(state.key, repl),
        step=jax.device_put(state.step, repl),
        n_accepted=jax.device_put(state.n_accepted, NamedSharding(mesh, P(CHAIN_AXIS))),
        adaptive=adaptive,
    )


def _event_spec_for_path(path: str, ndim: int) -> P:
    """PartitionSpec for a SampleModel leaf, by field name: the event axis of
    each array is sharded over EVENT_AXIS, everything else replicated."""
    event_axis_by_field = {
        # field name -> which axis is the event axis
        "kin": 1,  # [V, E]
        "mc_weight": 0,  # [E]
        "norm_idx": 0,  # [E, W]
        "norm_s": 1,  # [NP+1, E] match-count matrix
        "event_grid_idx": 0,
        "event_channel": 0,
        "event_flat_idx": 0,  # atmospheric per-event gather index
        "nc_mask": 0,
        "event_splines": 0,  # sparse table [E, W]
        "static_bins": 0,  # [E] precomputed bin map
        "shift_static_base": 0,  # [E] static-axis bin contribution
        "slope": 1,  # TF1 [Pt, E]
        "intercept": 1,  # TF1 [Pt, E]
        "coeffs": None,  # set below: dense [P, K, 4, E] -> axis 3
    }
    # norm_onehot is [E*W, NP+1]: its leading axis is event-major but W-strided,
    # so a raw split would cut within an event — replicate it (reference-scale
    # models use norm_s instead; the one-hot is size-gated to small tables).
    for field, axis in event_axis_by_field.items():
        if path.endswith(field):
            if field == "coeffs":
                if ndim == 3:  # dense monolith [P, K4, E] -> event axis 2
                    return P(None, None, EVENT_AXIS)
                return P()  # (legacy 4-D handled nowhere: dense is flat now)
            spec = [None] * ndim
            spec[axis] = EVENT_AXIS
            return P(*spec)
    return P()


def shard_fit_model(mesh: Mesh, model: Any) -> Any:
    """Place a FitModel's arrays: event-dimension sharded, all else replicated."""

    def place(path, leaf):
        if not hasattr(leaf, "ndim"):
            return leaf
        pathstr = jax.tree_util.keystr(path)
        spec = _event_spec_for_path(pathstr, leaf.ndim)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, model)
