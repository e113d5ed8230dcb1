"""Decomposition round 2 with the DCE-fixed scan_time (every output leaf
feeds the carry): osc grids, per-sample LLH (reweight + test stat), prior,
and the full NLL — accounting for the ~3.9 ms the kernel sums do not cover.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_decomp2.py
"""
from __future__ import annotations

import os
import time

OUT = os.environ.get("MACH3_PROBE_OUT", "/tmp/probe_decomp2.log")


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
    from mach3_tpu.tutorial.large import build_large

    cpu0 = jax.local_devices(backend="cpu")[0]
    dev0 = jax.devices()[0]
    kw = dict(use_pallas=True, low_memory=True)
    with jax.default_device(cpu0):
        exp = load_or_build(
            "bench_large", lambda: build_large(**kw), kwargs=kw,
            validate=lambda e: e.model.n_params == 101,
        )
    model = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, dev0) if hasattr(x, "dtype") else x, exp.model
    )
    jax.block_until_ready(jax.tree_util.tree_leaves(model)[0])
    log("fixture on device")

    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import jitter_init, noop_floor, scan_time

    rng = np.random.default_rng(0)
    c = 128
    th = jax.device_put(jnp.asarray(
        jitter_init(np, exp.model, np.asarray(exp.model.prefit_vector()), c, rng)
    ), dev0)

    iters = 40
    floor = noop_floor(jax, jnp, model, th, iters=iters)
    log(f"noop floor {1e3*floor:.3f} ms at iters={iters}")

    def t(name, fn, mdl, *arrs, it=iters):
        t1 = time.time()
        try:
            ms = 1e3 * (scan_time(jax, jnp, fn, mdl, *arrs, iters=it) - floor)
            log(f"{name}: {ms:.3f} ms  (wall {time.time()-t1:.0f}s)")
            return ms
        except Exception as exc:
            log(f"{name}: ERROR {type(exc).__name__} {str(exc)[:250]}")
            return None

    t("osc_grids_all", lambda m, x: m._shared_osc_tables(x), model, th)
    # beam and atmo grids separately (samples 0/1 share the beam grid)
    t("osc_grid_beam",
      lambda m, x: jax.vmap(m.samples[0].osc_prob_grids)(x), model, th)
    t("osc_grid_atmo",
      lambda m, x: jax.vmap(m.samples[2].osc_prob_grids)(x), model, th)

    tabs = jax.block_until_ready(
        jax.jit(lambda m, x: m._shared_osc_tables(x))(model, th)
    )
    for i, s in enumerate(model.samples):
        tb = tabs[i]
        t(f"{s.name}.llh",
          lambda m, x, tb=tb: m.log_likelihood_batch(x, osc_grids_batch=tb),
          s, th)
    t("prior", lambda m, x: jax.vmap(m.prior_nll_breakdown)(x), model, th)
    t("full_nll", lambda m, x: m.total_nll_batch(x), model, th)
    log("probe done")


if __name__ == "__main__":
    main()
