"""Measure the r5 window-aware tile cuts on the real chip.

Compares the large fixture's per-sample fused reweight + full LLH at 128
chains against the r4 decomposition (ROOFLINE.md: numu 1.7 / nue 1.6 /
atmo 3.4 ms kernels, full LLH ~9.9 ms dispatch-corrected). On-device
fused-vs-XLA parity is asserted alongside the timings (a fast-but-wrong
kernel must fail here, not in the record).

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_window.py
"""
from __future__ import annotations

import os
import time

OUT = os.environ.get("MACH3_PROBE_OUT", "/tmp/probe_window.log")


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
    t0 = time.time()
    with jax.default_device(cpu0):
        exp = load_or_build(
            "bench_large", lambda: build_large(**kw), kwargs=kw,
            validate=lambda e: e.model.n_params == 101,
        )
    log(f"fixture load {time.time()-t0:.1f}s")
    t0 = time.time()
    model = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, dev0) if hasattr(x, "dtype") else x, exp.model
    )
    jax.block_until_ready(jax.tree_util.tree_leaves(model)[0])
    log(f"device_put {time.time()-t0:.1f}s")
    for s in model.samples:
        log(f"  {s.name}: nbl={s.hist_nbl} etiles="
            f"{None if s.hist_tile_starts is None else s.hist_tile_starts.shape[0]}")

    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import jitter_init, noop_floor, parity_check, scan_time

    rng = np.random.default_rng(0)
    c = 128
    th = jax.device_put(jnp.asarray(
        jitter_init(np, exp.model, np.asarray(exp.model.prefit_vector()), c, rng)
    ), dev0)

    # parity first (compiles fused + XLA routes at C=2)
    try:
        t0 = time.time()
        par = parity_check(jax, jnp, np, model, th[:2], rtol=1e-4)
        log(f"parity ({time.time()-t0:.1f}s): "
            + ", ".join(f"{k}:{v['relerr_max']:.2g}" for k, v in par.items()))
    except Exception as exc:
        log(f"parity FAILED: {str(exc)[:400]}")

    iters = 20
    floor = noop_floor(jax, jnp, model, th, iters=iters)
    log(f"noop floor {1e3*floor:.2f} ms at iters={iters}")
    dt = scan_time(jax, jnp, lambda m, t: m.total_nll_batch(t), model, th, iters=iters)
    log(f"full LLH {1e3*dt:.2f} ms raw, {1e3*(dt-floor):.2f} ms corrected "
        f"(r4: ~9.9 corrected)")
    tabs = jax.jit(lambda m, t: m._shared_osc_tables(t))(model, th)
    for i, s in enumerate(model.samples):
        d = scan_time(
            jax, jnp,
            lambda s_, t, tb=tabs[i]: s_.reweight_batch(t, osc_grids_batch=tb),
            model.samples[i], th, iters=iters,
        )
        log(f"  {s.name} reweight (grids precomputed) {1e3*(d-floor):.2f} ms "
            f"corrected")
    log("probe done")


if __name__ == "__main__":
    main()
