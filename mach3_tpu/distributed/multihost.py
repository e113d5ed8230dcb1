"""Multi-host runtime: initialisation, cross-host collectives, sharded output.

The reference scales out by launching independent processes and merging chain
files offline (``Diagnostics/CombineMaCh3Chains.cpp``). Here multi-host is a
first-class runtime: ``jax.distributed`` + a global mesh make N hosts one
logical device array; chains shard across all chips; adaptation moments and
convergence statistics are global through XLA collectives (psum over the mesh
axes happens automatically inside the jitted step via GSPMD).

Per-host chain output: each host writes only its addressable chain shard
(``save_host_shard``), and shards are merged offline with the same
version/config enforcement as single-host combining.
"""
from __future__ import annotations

import os

import numpy as np

from ..core.logging import get_logger

_log = get_logger("distributed")


def initialise(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Initialise ``jax.distributed`` (no-op in single-process runs).

    Arguments default from the standard env vars (JAX_COORDINATOR_ADDRESS,
    JAX_NUM_PROCESSES, JAX_PROCESS_ID) / cloud-TPU auto-detection.
    """
    import jax

    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if coordinator_address is None and num_processes is None:
        _log.info("Single-process run (no coordinator configured)")
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    _log.info(
        "jax.distributed initialised: process %d/%d, %d local / %d global devices",
        jax.process_index(),
        jax.process_count(),
        jax.local_device_count(),
        jax.device_count(),
    )


def local_chain_slice(n_chains_global: int) -> slice:
    """The chain-index slice owned by this host for a chain axis sharded
    evenly over processes."""
    import jax

    per = n_chains_global // jax.process_count()
    start = per * jax.process_index()
    return slice(start, start + per)


def save_host_shard(
    path_pattern: str,
    draws: dict[str, np.ndarray],
    names: list[str],
    config_yaml: str = "",
) -> str:
    """Write this host's chain shard as ``pattern.format(host=i)``; returns the
    path. Shards carry their host index + count so the merge tool can check
    completeness."""
    import jax

    from ..diagnostics.chain_io import save_chain

    path = path_pattern.format(host=jax.process_index())
    save_chain(
        path,
        draws,
        names,
        config_yaml,
        extra_meta={"host": jax.process_index(), "n_hosts": jax.process_count()},
    )
    return path


def merge_host_shards(paths: list[str], out_path: str) -> None:
    """Merge per-host shards along the chain axis (axis 1), enforcing matching
    version/config and complete host coverage."""
    from ..core.exceptions import MaCh3Error
    from ..diagnostics.chain_io import load_chain, save_chain

    loaded = [load_chain(p) for p in paths]
    ref_meta = loaded[0][1]
    hosts = sorted(m.get("host", 0) for _, m, _ in loaded)
    n_hosts = ref_meta.get("n_hosts", len(paths))
    if hosts != list(range(n_hosts)):
        raise MaCh3Error(f"Incomplete host shards: got {hosts}, expected 0..{n_hosts - 1}")
    for p, (_, m, _) in zip(paths[1:], loaded[1:]):
        if m.get("version") != ref_meta.get("version") or m.get("config") != ref_meta.get("config"):
            raise MaCh3Error(f"Version/config mismatch in shard {p}")
    order = np.argsort([m.get("host", 0) for _, m, _ in loaded])
    draws0 = loaded[0][0]
    merged = {
        k: np.concatenate([loaded[i][0][k] for i in order], axis=1) for k in draws0
    }
    save_chain(out_path, merged, ref_meta["names"], ref_meta.get("config", ""),
               extra_meta={"merged_hosts": int(n_hosts)})
