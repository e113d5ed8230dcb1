"""1024-chain toy throughput probe (r4 verdict #4: scaling regressed).

Judge run B measured 54,246 chain-steps/s at 1024 chains vs 76,695 at 256 —
scaling efficiency 0.707, where BENCH_r02 had 1.245. Suspects: the r4 baked-
model chunk runner at 1024 chains, chunk-size interaction, chain fetch
overlap. This probe sweeps (chunk_size, bake) at 256 and 1024 chains in one
process, logging incrementally.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_1024.py
"""
from __future__ import annotations

import os
import time

OUT = os.environ.get("MACH3_PROBE_OUT", "/tmp/probe_1024.log")


def log(msg: str) -> None:
    line = f"[{time.strftime('%H:%M:%S')}] {msg}"
    print(line, flush=True)
    with open(OUT, "a") as f:
        f.write(line + "\n")


def main():
    log(f"probe start pid={os.getpid()}")
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("MACH3_JAX_CACHE", "/root/repo/.jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import jax.numpy as jnp
    import numpy as np

    from mach3_tpu.core.fixture_cache import load_or_build
    from mach3_tpu.fitters.mcmc import MR2T2, MCMCConfig
    from mach3_tpu.tutorial.toy import build_toy

    cpu0 = jax.local_devices(backend="cpu")[0]
    dev0 = jax.devices()[0]
    kw = dict(n_events=100_000, seed=42, e_grid_size=200, use_pallas=True)
    with jax.default_device(cpu0):
        toy = load_or_build("bench_toy", lambda: build_toy(**kw), kwargs=kw)
    model = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, dev0) if hasattr(x, "dtype") else x, toy.model
    )
    log("fixture ready")

    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import jitter_init

    theta0 = np.asarray(toy.model.prefit_vector())
    rng = np.random.default_rng(0)

    for n_chains, chunk, bake_mb in [
        (256, 250, None),      # headline config (baked: toy is 40 MB < 64)
        (1024, 50, None),      # the r4 regressed config
        (1024, 250, None),     # longer chunks
        (1024, 250, "0"),      # argument-passed model
        (1024, 125, None),
    ]:
        tag = f"C={n_chains} chunk={chunk} bake={'off' if bake_mb else 'on'}"
        try:
            if bake_mb is not None:
                os.environ["MACH3_BAKE_LIMIT_MB"] = bake_mb
            elif "MACH3_BAKE_LIMIT_MB" in os.environ:
                del os.environ["MACH3_BAKE_LIMIT_MB"]
            init = jitter_init(np, toy.model, theta0, n_chains, rng)
            t0 = time.time()
            f = MR2T2(model, MCMCConfig(n_steps=2 * chunk, chunk_size=chunk),
                      init, seed=3)
            f.run(n_steps=chunk)  # compile + warm (one full chunk)
            log(f"{tag}: compile+warm {time.time()-t0:.1f}s")
            t0 = time.perf_counter()
            f.run(n_steps=2 * chunk)
            jax.block_until_ready(f.state.theta)
            dt = time.perf_counter() - t0
            sps = 2 * chunk * n_chains / dt
            log(f"{tag}: {sps:,.0f} chain-steps/s ({1e3*dt/(2*chunk):.2f} ms/step)")
        except Exception as exc:
            log(f"{tag}: FAILED {type(exc).__name__}: {str(exc)[:200]}")
    log("probe done")


if __name__ == "__main__":
    main()
