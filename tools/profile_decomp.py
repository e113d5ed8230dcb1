"""Full per-sample decomposition of the large-fixture LLH at 128 chains.

r5 found the window narrowing neutral (numu 1.74 / nue 1.74 / atmo 3.75 ms
with 128-bin windows vs 1.7/1.6/3.4 at 384/640) — the r4 ROOFLINE
attribution of ~2.7 ms to the wide histogram window was wrong. This probe
splits each sample's isolated reweight into:

  selector  — spline_selector (segment search + one-hot) [C, P, K4]
  base      — mc_weight x osc gather (x func weights)    [C, E]
  norm_ext  — per-chain extended norm vector             [C, NA+1]
  kernel    — the fused pallas call with ALL inputs precomputed
  reweight  — the composed production path (= what bench measures)

plus the shared osc-grid build and the test statistic, so the ~10 ms
corrected LLH is accounted component by component.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_decomp.py
"""
from __future__ import annotations

import os
import time

OUT = os.environ.get("MACH3_PROBE_OUT", "/tmp/probe_decomp.log")


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
    from mach3_tpu.splines.pallas_reweight import spline_selector
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

    # shared osc grids (all samples)
    t("osc_grids_all", lambda m, x: m._shared_osc_tables(x), model, th)

    tabs = jax.block_until_ready(
        jax.jit(lambda m, x: m._shared_osc_tables(x))(model, th)
    )

    for i, s in enumerate(model.samples):
        tb = tabs[i]
        name = s.name
        t(f"{name}.selector",
          lambda m, x: spline_selector(m.spline_table, x), s, th)
        t(f"{name}.base",
          lambda m, x, tb=tb: jax.vmap(
              lambda t_, cg: m.mc_weight * m._osc_weights(t_, cg),
              in_axes=(0, 0))(x, tb),
          s, th)
        if s.norm_s is not None:
            t(f"{name}.norm_ext",
              lambda m, x: m._norm_ext_batch(x), s, th)

        # kernel-only: every input precomputed and passed as a jit arg
        sel = jax.block_until_ready(
            jax.jit(lambda m, x: spline_selector(m.spline_table, x))(s, th)
        )
        base = jax.block_until_ready(jax.jit(
            lambda m, x, tb=tb: jax.vmap(
                lambda t_, cg: m.mc_weight * m._osc_weights(t_, cg),
                in_axes=(0, 0))(x, tb)
        )(s, th))
        nx = jax.block_until_ready(
            jax.jit(lambda m, x: m._norm_ext_batch(x))(s, th)
        ) if s.norm_s is not None else None
        kr = s.kernel_route
        if s.static_bins is not None and kr is not None:
            from mach3_tpu.splines.pallas_reweight import (
                fused_reweight_histogram_shared,
            )

            def kern(m, sel_, base_, nx_):
                kwargs = dict(
                    chain_tile=kr.chain_tile, event_tile=kr.event_tile,
                    param_tile=kr.param_tile,
                )
                if nx_ is not None:
                    kwargs.update(norm_ext=nx_, norm_s=m.norm_s)
                if m.hist_tile_starts is not None and m.hist_nbl is not None:
                    kwargs.update(
                        tile_starts=m.hist_tile_starts, nbl=m.hist_nbl,
                        block_plan=m.hist_block_plan,
                        block_nact=m.hist_block_nact,
                    )
                return fused_reweight_histogram_shared(
                    sel_, m.spline_table.coeffs, base_, m.static_bins,
                    n_bins=m.n_bins, **kwargs,
                )

            t(f"{name}.kernel_only", kern, s, sel, base, nx)
        elif s.kernel_shift is not None and kr is not None:
            from mach3_tpu.splines.pallas_reweight import (
                fused_reweight_histogram_shifted,
            )

            fn, pidx, edges, stride_j, n_axis_j = s.kernel_shift
            xn = s.kin[s.shifts[0].var_row]

            def kern_sh(m, sel_, base_, nx_):
                return fused_reweight_histogram_shifted(
                    sel_, m.spline_table.coeffs, base_,
                    th[:, pidx].astype(jnp.float32), xn, m.shift_static_base,
                    n_bins=m.n_bins, shift_fn=fn, edges=edges,
                    stride_j=stride_j, n_axis_j=n_axis_j,
                    norm_ext=nx_, norm_s=m.norm_s,
                    chain_tile=kr.chain_tile, event_tile=kr.event_tile,
                    param_tile=kr.param_tile,
                )

            t(f"{name}.kernel_only", kern_sh, s, sel, base, nx)

        t(f"{name}.reweight",
          lambda m, x, tb=tb: m.reweight_batch(x, osc_grids_batch=tb), s, th)
    log("probe done")


if __name__ == "__main__":
    main()
