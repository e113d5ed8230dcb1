"""r5 tile sweep on the kernel-only costs (decomp showed: numu 0.66 /
nue 1.22 / atmo 2.49 ms at 128 chains vs ~0.3-1.0 ms floors, with glue
free — suspect per-grid-step Mosaic overhead: atmo runs 216x3 = 648 grid
steps at ET=1024).

Sweeps event_tile (shared samples) and chain_tile (shifted sample) on the
kernel with precomputed inputs.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_tiles5.py
"""
from __future__ import annotations

import os
import time

OUT = os.environ.get("MACH3_PROBE_OUT", "/tmp/probe_tiles5.log")


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
    from mach3_tpu.samples.events import build_sample_model  # noqa: F401 (fingerprint dep)
    from mach3_tpu.splines.pallas_reweight import (
        fused_reweight_histogram_shared,
        fused_reweight_histogram_shifted,
        hist_tile_plan,
        param_block_plan,
        spline_selector,
    )
    from mach3_tpu.splines.monolith import dense_table_activity
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
    log(f"noop floor {1e3*floor:.3f} ms")

    tabs = jax.block_until_ready(
        jax.jit(lambda m, x: m._shared_osc_tables(x))(model, th)
    )

    def t(name, fn, mdl, *arrs, it=iters):
        t1 = time.time()
        try:
            ms = 1e3 * (scan_time(jax, jnp, fn, mdl, *arrs, iters=it) - floor)
            log(f"{name}: {ms:.3f} ms  (wall {time.time()-t1:.0f}s)")
            return ms
        except Exception as exc:
            log(f"{name}: ERROR {type(exc).__name__} {str(exc)[:200]}")
            return None

    # ---- shared samples: replan at several event tiles
    for i in (0, 2):  # numu, atmo
        s = model.samples[i]
        tb = tabs[i]
        sel = jax.block_until_ready(
            jax.jit(lambda m, x: spline_selector(m.spline_table, x))(s, th))
        base = jax.block_until_ready(jax.jit(
            lambda m, x, tb=tb: jax.vmap(
                lambda t_, cg: m.mc_weight * m._osc_weights(t_, cg),
                in_axes=(0, 0))(x, tb))(s, th))
        nx = jax.block_until_ready(
            jax.jit(lambda m, x: m._norm_ext_batch(x))(s, th))
        act = dense_table_activity(s.spline_table)  # already permuted layout
        bins_np = np.asarray(s.static_bins)
        kr = s.kernel_route
        for et in (1024, 2048, 4096):
            plan = hist_tile_plan(bins_np, s.n_bins, et)
            if plan is None:
                # events were cut for ET=1024 windows: larger tiles may widen
                # the window; fall back to trivial starts (wide window)
                starts = np.zeros(-(-len(bins_np) // et), np.int32)
                nbl_et = -(-(s.n_bins + 1) // 128) * 128
            else:
                starts, nbl_et = plan
            bplan, bnact = param_block_plan(act, et, kr.param_tile)
            if len(bins_np) % et and len(bins_np) % 1024 == 0:
                # event axis padded to 1024-multiples at build; pallas_call
                # re-pads to et internally, but the PLANS must match the
                # padded tile count — skip mismatched cases
                n_etiles = -(-len(bins_np) // et)
                if starts.shape[0] != n_etiles:
                    log(f"{s.name}.et{et}: skip (plan mismatch)")
                    continue

            def kern(m, sel_, base_, nx_, et=et, starts=jnp.asarray(starts),
                     nbl_et=int(nbl_et), bplan=jnp.asarray(bplan),
                     bnact=jnp.asarray(bnact)):
                return fused_reweight_histogram_shared(
                    sel_, m.spline_table.coeffs, base_, m.static_bins,
                    n_bins=m.n_bins, chain_tile=kr.chain_tile, event_tile=et,
                    param_tile=kr.param_tile, norm_ext=nx_, norm_s=m.norm_s,
                    tile_starts=starts, nbl=nbl_et,
                    block_plan=bplan, block_nact=bnact,
                )

            t(f"{s.name}.et{et}.nbl{int(nbl_et)}", kern, s, sel, base, nx)
        # wide (non-sorted) kernel for comparison at et=4096
        def kern_wide(m, sel_, base_, nx_):
            return fused_reweight_histogram_shared(
                sel_, m.spline_table.coeffs, base_, m.static_bins,
                n_bins=m.n_bins, chain_tile=kr.chain_tile, event_tile=2048,
                param_tile=kr.param_tile, norm_ext=nx_, norm_s=m.norm_s,
            )
        t(f"{s.name}.wide_et2048", kern_wide, s, sel, base, nx)

    # ---- shifted sample: chain-tile sweep
    s = model.samples[1]
    tb = tabs[1]
    sel = jax.block_until_ready(
        jax.jit(lambda m, x: spline_selector(m.spline_table, x))(s, th))
    base = jax.block_until_ready(jax.jit(
        lambda m, x, tb=tb: jax.vmap(
            lambda t_, cg: m.mc_weight * m._osc_weights(t_, cg),
            in_axes=(0, 0))(x, tb))(s, th))
    nx = jax.block_until_ready(
        jax.jit(lambda m, x: m._norm_ext_batch(x))(s, th))
    fn, pidx, edges, stride_j, n_axis_j = s.kernel_shift
    xn = s.kin[s.shifts[0].var_row]
    shift_vals = jax.block_until_ready(th[:, pidx].astype(jnp.float32))
    for ct in (64, 128):
        for et in (2048, 4096):
            def kern_sh(m, sel_, base_, nx_, ct=ct, et=et):
                return fused_reweight_histogram_shifted(
                    sel_, m.spline_table.coeffs, base_, shift_vals, xn,
                    m.shift_static_base, n_bins=m.n_bins, shift_fn=fn,
                    edges=edges, stride_j=stride_j, n_axis_j=n_axis_j,
                    norm_ext=nx_, norm_s=m.norm_s,
                    chain_tile=ct, event_tile=et, param_tile=kr.param_tile,
                )
            t(f"nue.ct{ct}.et{et}", kern_sh, s, sel, base, nx)
    log("probe done")


if __name__ == "__main__":
    main()
