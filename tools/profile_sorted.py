"""Measure the bin-sorted narrow-histogram kernel vs the r4 wide baseline."""
from __future__ import annotations

import os

import json, os, sys, time

if os.environ.get("JAX_PLATFORMS") and "cpu" not in os.environ["JAX_PLATFORMS"]:
    os.environ["JAX_PLATFORMS"] = os.environ["JAX_PLATFORMS"] + ",cpu"
import jax
jax.config.update("jax_compilation_cache_dir", os.environ.get("MACH3_JAX_CACHE", "/root/repo/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import jax.numpy as jnp
import numpy as np
sys.path.insert(0, "/root/repo")
from bench import jitter_init, scan_time

OUT = os.environ.get("PROF_OUT", "/tmp/profile_sorted.json")
out = {}
def flush():
    with open(OUT, "w") as f: json.dump(out, f)

def main():
    from mach3_tpu.tutorial.large import build_large
    c = 128
    t0 = time.time()
    exp = build_large(use_pallas=True, low_memory=True)
    print(f"# build: {time.time()-t0:.0f}s", flush=True)
    model = exp.model
    for s in model.samples:
        print(f"# {s.name}: route={s.kernel_route.variant} "
              f"nbl={s.hist_nbl} starts={None if s.hist_tile_starts is None else s.hist_tile_starts.shape}",
              flush=True)
        out[f"{s.name}.nbl"] = s.hist_nbl
    rng = np.random.default_rng(0)
    th = jnp.asarray(jitter_init(np, model, np.asarray(model.prefit_vector()), c, rng))
    iters = 40
    def t(name, fn, mdl, *arrs):
        try:
            ms = 1e3 * scan_time(jax, jnp, fn, mdl, *arrs, iters=iters)
            out[name] = round(ms, 3)
            print(f"# {name}: {ms:.3f} ms", flush=True)
        except Exception as exc:
            out[name] = f"ERR {str(exc)[:200]}"
            print(f"# {name}: ERROR {str(exc)[:300]}", flush=True)
        flush()
    t("noop", lambda m, x: x * 1.0000001, None, th)
    tabs = jax.block_until_ready(jax.jit(lambda m, x: m._shared_osc_tables(x))(model, th))
    from mach3_tpu.splines.pallas_reweight import (
        fused_reweight_histogram_shared, spline_selector,
    )
    for i, s in enumerate(model.samples):
        t(f"{s.name}.reweight_full", lambda m, x, tb=tabs[i]: m.reweight_batch(x, tb), s, th)
        if s.hist_nbl is None:
            continue
        def mk_base(m, x, tb=tabs[i]):
            def one(t_, cg):
                w = m.mc_weight * m._osc_weights(t_, cg)
                if m.tf1_table is not None:
                    w = w * m.tf1_table.eval(t_)
                fw = m._func_weights(t_)
                return w if fw is None else w * fw
            return jax.vmap(one)(x, tb)
        t(f"{s.name}.base_w", mk_base, s, th)
        t(f"{s.name}.selector",
          lambda m, x: spline_selector(m.spline_table, x), s, th)
        base_w = jax.block_until_ready(jax.jit(mk_base)(s, th))
        selector = jax.block_until_ready(
            jax.jit(lambda m, x: spline_selector(m.spline_table, x))(s, th))
        tbl = s.spline_table
        coeffs = tbl.coeffs
        ne = jnp.concatenate([
            jnp.take(th, s.norm_applied, axis=1).astype(jnp.float32),
            jnp.ones((th.shape[0], 1), jnp.float32)], 1)
        kr = s.kernel_route
        def kern(m, sel, co, bw, nx):
            return fused_reweight_histogram_shared(
                sel, co, bw, m.static_bins, n_bins=m.n_bins,
                norm_ext=nx, norm_s=m.norm_s,
                chain_tile=kr.chain_tile, event_tile=kr.event_tile,
                param_tile=kr.param_tile,
                tile_starts=m.hist_tile_starts, nbl=m.hist_nbl,
                block_plan=m.hist_block_plan, block_nact=m.hist_block_nact)
        t(f"{s.name}.kernel_only", kern, s, selector, coeffs, base_w, ne)
        # composed: selector+base+kernel chained in ONE program (vs parts)
        def composed(m, x, tb=tabs[i], kr=kr):
            sel = spline_selector(m.spline_table, x)
            def one(t_, cg):
                w = m.mc_weight * m._osc_weights(t_, cg)
                if m.tf1_table is not None:
                    w = w * m.tf1_table.eval(t_)
                fw = m._func_weights(t_)
                return w if fw is None else w * fw
            bw = jax.vmap(one)(x, tb)
            co = m.spline_table.coeffs
            nx = jnp.concatenate([
                jnp.take(x, m.norm_applied, axis=1).astype(jnp.float32),
                jnp.ones((x.shape[0], 1), jnp.float32)], 1)
            return fused_reweight_histogram_shared(
                sel, co, bw, m.static_bins, n_bins=m.n_bins,
                norm_ext=nx, norm_s=m.norm_s,
                chain_tile=kr.chain_tile, event_tile=kr.event_tile,
                param_tile=kr.param_tile,
                tile_starts=m.hist_tile_starts, nbl=m.hist_nbl,
                block_plan=m.hist_block_plan, block_nact=m.hist_block_nact)
        t(f"{s.name}.composed", composed, s, th)
    t("total_nll_batch", lambda m, x: m.total_nll_batch(x), model, th)
    # nue shifted-kernel piece timings
    s = model.samples[1]
    tb = tabs[1]
    def nue_base(m, x, tb=tb):
        def one(t_, cg):
            w = m.mc_weight * m._osc_weights(t_, cg)
            if m.tf1_table is not None:
                w = w * m.tf1_table.eval(t_)
            fw = m._func_weights(t_)
            return w if fw is None else w * fw
        return jax.vmap(one)(x, tb)
    t("nue.base_w", nue_base, s, th)
    t("nue.selector", lambda m, x: spline_selector(m.spline_table, x), s, th)
    # correctness on hardware: sorted kernel vs XLA reference path
    for i, s in enumerate(model.samples):
        if s.hist_nbl is None: continue
        tb8 = jax.tree_util.tree_map(lambda a: a[:8], tabs[i])
        mcp, w2p = jax.jit(lambda m, x, tb=tb8: m.reweight_batch(x, tb))(s, th[:8])
        mcx, w2x = jax.jit(
            lambda m, x, tb=tb8: jax.vmap(m.reweight, in_axes=(0, 0))(x, tb)
        )(s, th[:8])
        dmc = float(jnp.max(jnp.abs(mcp - mcx) / (jnp.abs(mcx) + 1e-3)))
        dw2 = float(jnp.max(jnp.abs(w2p - w2x) / (jnp.abs(w2x) + 1e-3)))
        out[f"{s.name}.parity_relerr"] = [round(dmc, 6), round(dw2, 6)]
        print(f"# {s.name} parity rel err mc={dmc:.2e} w2={dw2:.2e}", flush=True)
        flush()
    print(json.dumps(out), flush=True)

main()
