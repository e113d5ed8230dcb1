"""Headline benchmark: MCMC throughput on the tutorial-scale fit.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: total chain-steps/second on one chip — a full MR2T2 transition
(correlated proposal over 16 params, oscillation-probability grids, spline
monolith reweight of every MC event, norm/functional systematics, histogram
fill, Barlow-Beeston likelihood, accept/reject) for a batch of chains.

vs_baseline: the reference's stated ND-fit target is "<0.1 s/step eventually"
on CPU for a comparable reweight (``Samples/SampleHandlerFD.cpp:396-408``),
i.e. 10 steps/s on a single chain. vs_baseline = value / 10.
"""
from __future__ import annotations

import json
import time


def main() -> None:
    import os

    # Allow a CPU backend next to the TPU one so build-time work (Asimov data)
    # avoids minutes of remote TPU compilation; the fit itself runs on TPU.
    if os.environ.get("JAX_PLATFORMS") and "cpu" not in os.environ["JAX_PLATFORMS"]:
        os.environ["JAX_PLATFORMS"] = os.environ["JAX_PLATFORMS"] + ",cpu"
    import jax

    # Persistent compilation cache: remote-TPU compiles take minutes; cached
    # executables make warm reruns start in seconds.
    jax.config.update("jax_compilation_cache_dir", "/tmp/mach3_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import jax.numpy as jnp
    import numpy as np

    from mach3_tpu.fitters.mcmc import MR2T2, MCMCConfig
    from mach3_tpu.tutorial.toy import build_toy

    import sys

    n_events = 100_000
    n_chains = 256
    n_steps = 200

    def stage(msg, t0):
        print(f"# {msg}: {time.perf_counter() - t0:.1f}s", file=sys.stderr, flush=True)
        return time.perf_counter()

    t = time.perf_counter()
    toy = build_toy(n_events=n_events, seed=42, e_grid_size=200, use_pallas=True)
    t = stage("build_toy", t)
    theta0 = np.asarray(toy.model.prefit_vector())
    init = np.tile(theta0, (n_chains, 1))
    # Jitter starts so chains decorrelate
    rng = np.random.default_rng(0)
    init = init + 1e-3 * rng.normal(size=init.shape)

    config = MCMCConfig(n_steps=n_steps, chunk_size=50)
    fitter = MR2T2(toy.model, config, init, seed=1)
    t = stage("fitter init", t)

    # Warm-up: compile + one chunk
    fitter.run(n_steps=50)
    t = stage("warmup (compile + 50 steps)", t)
    t0 = time.perf_counter()
    fitter.run(n_steps=n_steps)
    jax.block_until_ready(fitter.state.theta)
    dt = time.perf_counter() - t0

    chain_steps_per_sec = n_steps * n_chains / dt
    print(
        json.dumps(
            {
                "metric": "mcmc_chain_steps_per_sec",
                "value": round(chain_steps_per_sec, 2),
                "unit": f"chain-steps/s ({n_chains} chains x {n_events} events, 1 chip)",
                "vs_baseline": round(chain_steps_per_sec / 10.0, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
