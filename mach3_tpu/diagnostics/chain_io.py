"""Chain storage, merging, and checkpoint/resume.

Replaces the reference's ROOT-based chain persistence:

* the "posteriors" TTree with per-step branches (param values, LogL, accProb,
  step, per-sample/per-syst LLH — ``Fitters/FitterBase.cpp:153-205``) becomes
  a compressed ``.npz`` chain file with a JSON metadata header carrying the
  full YAML config, framework version, and parameter names (the reference
  embeds config + version as TMacro in every output, ``FitterBase.cpp:79``);
* ``CombineMaCh3Chains`` (``Diagnostics/CombineMaCh3Chains.cpp``) becomes
  :func:`combine_chains`, with the same guarantee: refuse to merge chains from
  differing versions or configs;
* ``StartFromPreviousFit`` (``FitterBase.cpp:348+``, ``MCMCBase.cpp:149-173``)
  becomes :func:`load_checkpoint` — the LAST state (params, rng key, step
  counter, adaptive moments) is stored alongside the draws so a fit resumes
  exactly;
* the periodic ``AutoSave`` becomes atomic re-writes at chunk boundaries.
"""
from __future__ import annotations

import json
import os
import tempfile
from typing import Any

import numpy as np

from .. import __version__
from ..core.exceptions import MaCh3Error
from ..core.logging import get_logger

_log = get_logger("chain_io")


def save_chain(
    path: str,
    draws: dict[str, np.ndarray],
    names: list[str],
    config_yaml: str = "",
    extra_meta: dict[str, Any] | None = None,
    state: dict[str, np.ndarray] | None = None,
) -> None:
    """Atomically write a chain file.

    draws: output arrays from the fitter (theta [S, C, P], nll, acc_prob, ...).
    state: final sampler state for exact resume (theta, key_data, step,
    adaptive moments).
    """
    meta = {
        "version": __version__,
        "names": names,
        "config": config_yaml,
        **(extra_meta or {}),
    }
    payload = {f"draw_{k}": np.asarray(v) for k, v in draws.items()}
    if state:
        payload.update({f"state_{k}": np.asarray(v) for k, v in state.items()})
    payload["meta_json"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8
    )
    d = os.path.dirname(os.path.abspath(path)) or "."
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    os.close(fd)
    try:
        np.savez_compressed(tmp, **payload)
        os.replace(tmp + ".npz" if os.path.exists(tmp + ".npz") else tmp, path)
    finally:
        for p in (tmp, tmp + ".npz"):
            if os.path.exists(p):
                os.remove(p)
    _log.info("Saved chain to %s (%d draw arrays)", path, len(draws))


def load_chain(path: str) -> tuple[dict[str, np.ndarray], dict[str, Any], dict[str, np.ndarray]]:
    """Returns (draws, meta, state).

    Sharded chains (written by :class:`ChainShardWriter`) are merged on
    load: the manifest file carries the metadata and shard list, the draws
    are concatenated from the per-chunk part files."""
    with np.load(path, allow_pickle=False) as f:
        meta = json.loads(bytes(f["meta_json"]).decode())
        draws = {k[5:]: f[k] for k in f.files if k.startswith("draw_")}
        state = {k[6:]: f[k] for k in f.files if k.startswith("state_")}
    if meta.get("shards"):
        parts = list(iter_chain_shards(path, meta))
        draws = {
            k: np.concatenate([p[k] for p in parts], axis=0)
            for k in parts[0]
        }
    return draws, meta, state


def iter_chain_shards(path: str, meta: dict | None = None):
    """Stream a sharded chain one chunk at a time (bounded memory) —
    the reading twin of :class:`ChainShardWriter`. Yields draw dicts."""
    if meta is None:
        with np.load(path, allow_pickle=False) as f:
            meta = json.loads(bytes(f["meta_json"]).decode())
    shard_dir = path + ".d"
    for part in meta.get("shards", []):
        with np.load(os.path.join(shard_dir, part), allow_pickle=False) as f:
            yield {k[5:]: f[k] for k in f.files if k.startswith("draw_")}


class ChainShardWriter:
    """Streaming chain storage: one compressed npz shard per autosave chunk.

    The reference streams every step to disk (TTree fill + AutoSave,
    ``Fitters/FitterBase.cpp:153-205``); the in-memory-concatenate design
    cannot produce a 100k-step x 1000-chain x 101-param chain (~80 GB).
    This writer holds only the CURRENT chunk in host RAM: each ``append``
    atomically writes ``<path>.d/part-NNNNN.npz`` and drops the data;
    ``finalize`` writes the manifest chain file (meta + shard list, no
    draws) that ``load_chain``/``iter_chain_shards``/``combine_chains``
    resolve transparently.

    Resume-friendly: constructing over an existing shard directory
    continues the part numbering, so a resumed fit appends."""

    def __init__(
        self,
        path: str,
        names: list[str],
        config_yaml: str = "",
        extra_meta: dict[str, Any] | None = None,
    ) -> None:
        self.path = path
        self.names = names
        self.config_yaml = config_yaml
        self.extra_meta = dict(extra_meta or {})
        self.shard_dir = path + ".d"
        os.makedirs(self.shard_dir, exist_ok=True)
        self.parts: list[str] = sorted(
            p for p in os.listdir(self.shard_dir)
            if p.startswith("part-") and p.endswith(".npz")
        )
        self.n_steps = 0
        for p in self.parts:  # resumed run: recount prior steps
            with np.load(os.path.join(self.shard_dir, p)) as f:
                first = [k for k in f.files if k.startswith("draw_")][0]
                self.n_steps += f[first].shape[0]
        #: accountability for the bounded-memory contract (tested):
        self.max_resident_bytes = 0
        self.disk_bytes = 0

    def append(self, draws: dict[str, np.ndarray]) -> None:
        """Write one chunk as the next shard (atomic), then forget it."""
        payload = {f"draw_{k}": np.asarray(v) for k, v in draws.items()}
        self.max_resident_bytes = max(
            self.max_resident_bytes, sum(v.nbytes for v in payload.values())
        )
        name = f"part-{len(self.parts):05d}.npz"
        fd, tmp = tempfile.mkstemp(dir=self.shard_dir, suffix=".tmp")
        os.close(fd)
        try:
            np.savez_compressed(tmp, **payload)
            src = tmp + ".npz" if os.path.exists(tmp + ".npz") else tmp
            os.replace(src, os.path.join(self.shard_dir, name))
        finally:
            for p in (tmp, tmp + ".npz"):
                if os.path.exists(p):
                    os.remove(p)
        self.parts.append(name)
        self.n_steps += next(iter(draws.values())).shape[0]
        self.disk_bytes += os.path.getsize(os.path.join(self.shard_dir, name))

    def truncate(self, n_steps: int) -> None:
        """Drop shard steps beyond ``n_steps`` (crash consistency: a kill can
        land after a shard write but before its checkpoint, leaving the
        shards one chunk ahead of the resumable state)."""
        if self.n_steps <= n_steps:
            return
        kept: list[str] = []
        cum = 0
        for p in self.parts:
            path = os.path.join(self.shard_dir, p)
            with np.load(path, allow_pickle=False) as f:
                keys = [k for k in f.files if k.startswith("draw_")]
                s = f[keys[0]].shape[0]
                take = min(s, max(0, n_steps - cum))
                partial = (
                    {k: f[k][:take] for k in keys} if 0 < take < s else None
                )
            if take == s:
                kept.append(p)
            else:
                os.remove(path)
                if partial is not None:
                    np.savez_compressed(path[:-4], **partial)
                    kept.append(p)
            cum += take
        self.parts = kept
        self.n_steps = cum
        _log.info("Truncated chain shards to %d steps (%d parts)", cum, len(kept))

    def finalize(self, state: dict[str, np.ndarray] | None = None) -> None:
        """Write the manifest chain file referencing the shards."""
        save_chain(
            self.path,
            {},
            self.names,
            self.config_yaml,
            extra_meta={
                **self.extra_meta,
                "shards": self.parts,
                "n_steps": self.n_steps,
            },
            state=state,
        )


def combine_chains(paths: list[str], out_path: str, check: bool = True) -> None:
    """Merge chain files along the step axis (multi-run) — with the reference's
    reproducibility enforcement: identical version + config required
    (``CombineMaCh3Chains.cpp`` header checks)."""
    if not paths:
        raise MaCh3Error("No chain files to combine")
    all_draws, metas = [], []
    for p in paths:
        draws, meta, _ = load_chain(p)
        all_draws.append(draws)
        metas.append(meta)
    if check:
        ref = metas[0]
        for p, m in zip(paths[1:], metas[1:]):
            if m.get("version") != ref.get("version"):
                raise MaCh3Error(
                    f"Version mismatch: {paths[0]} has {ref.get('version')}, "
                    f"{p} has {m.get('version')}"
                )
            if m.get("config") != ref.get("config"):
                raise MaCh3Error(f"Config mismatch between {paths[0]} and {p}")
            if m.get("names") != ref.get("names"):
                raise MaCh3Error(f"Parameter-name mismatch between {paths[0]} and {p}")
    keys = all_draws[0].keys()
    merged = {k: np.concatenate([d[k] for d in all_draws], axis=0) for k in keys}
    save_chain(out_path, merged, metas[0]["names"], metas[0].get("config", ""),
               extra_meta={"combined_from": paths})


def save_checkpoint(
    path: str, fitter, names: list[str], config_yaml: str = "", state_pytree=None
) -> None:
    """Persist the exact sampler state for resume (no draws).

    Generic over the fitter's state pytree (MR2T2 ``ChainState``, HMC/ChEES
    ``HMCState``, ...): every array leaf is stored under its tree path; PRNG
    key arrays round-trip through ``key_data``. The reference restores by
    branch name from the old chain (``FitterBase::StartFromPreviousFit``);
    here the state IS the whole sampler.

    state_pytree: the state snapshot to persist; defaults to the fitter's
    LIVE state. Mid-run autosave callbacks MUST pass their own chunk's
    snapshot — the double-buffered run loop has already dispatched the next
    chunk by the time a callback fires, so ``fitter.state`` is one chunk
    ahead of the drained draws."""
    import jax

    if state_pytree is None:
        state_pytree = fitter.state
    state = {}
    for p, leaf in jax.tree_util.tree_leaves_with_path(state_pytree):
        k = "st" + jax.tree_util.keystr(p)
        if hasattr(leaf, "dtype") and jax.dtypes.issubdtype(
            leaf.dtype, jax.dtypes.prng_key
        ):
            state[k + "#key"] = np.asarray(jax.random.key_data(leaf))
        else:
            state[k] = np.asarray(leaf)
    save_chain(path, {}, names, config_yaml, state=state)


def load_checkpoint(path: str, fitter) -> None:
    """Restore a fitter's state from a checkpoint (``StartFromPreviousFit``).

    The fitter must be constructed with the same configuration (same state
    tree structure) — the reference has the same constraint: resuming reads
    branches the new fit also declares."""
    import jax
    import jax.numpy as jnp

    _, meta, state = load_chain(path)
    if any(k.startswith("st.") or k.startswith("st[") for k in state):
        leaves_paths = jax.tree_util.tree_leaves_with_path(fitter.state)
        treedef = jax.tree_util.tree_structure(fitter.state)
        new_leaves = []
        consumed = set()
        for p, leaf in leaves_paths:
            k = "st" + jax.tree_util.keystr(p)
            if k + "#key" in state:
                consumed.add(k + "#key")
                new_leaves.append(
                    jax.random.wrap_key_data(jnp.asarray(state[k + "#key"]))
                )
            elif k in state:
                consumed.add(k)
                new_leaves.append(jnp.asarray(state[k], getattr(leaf, "dtype", None)))
            else:
                raise KeyError(
                    f"checkpoint {path} is missing state leaf {k!r}: it was "
                    "written by a fitter with a different configuration"
                )
        leftover = {k for k in state if k.startswith("st")} - consumed
        if leftover:
            # The mismatch cuts both ways: silently dropping checkpoint state
            # (e.g. adaptive moments resumed into a non-adaptive fitter)
            # would "resume" a different chain with no diagnostic.
            raise KeyError(
                f"checkpoint {path} carries state the resuming fitter does "
                f"not declare ({sorted(leftover)}): configurations differ"
            )
        fitter.state = jax.tree_util.tree_unflatten(treedef, new_leaves)
        step = state.get("st.step", 0)
    else:  # legacy fixed-name layout (round-1 MR2T2 checkpoints)
        from ..fitters.mcmc import AdaptiveState, ChainState

        adaptive = None
        if "ad_mean" in state and fitter.state.adaptive is not None:
            adaptive = AdaptiveState(
                mean=jnp.asarray(state["ad_mean"]),
                cov=jnp.asarray(state["ad_cov"]),
                chol=jnp.asarray(state["ad_chol"]),
                n_updates=jnp.asarray(state["ad_n"]),
                log_scale=jnp.asarray(state.get("ad_log_scale", 0.0)),
            )
        fitter.state = ChainState(
            theta=jnp.asarray(state["theta"]),
            nll=jnp.asarray(state["nll"]),
            key=jax.random.wrap_key_data(jnp.asarray(state["key_data"])),
            step=jnp.asarray(state["step"]),
            n_accepted=jnp.asarray(state["n_accepted"]),
            adaptive=adaptive,
        )
        step = state["step"]
    _log.info("Resumed fit at step %d from %s", int(np.asarray(step)), path)
