"""Isolate the composition overhead (reshape copy?) + nue shifted variants."""
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
OUT = "/tmp/profile_glue.json"
out = {}
def flush():
    with open(OUT, "w") as f: json.dump(out, f)

def main():
    from mach3_tpu.splines.pallas_reweight import (
        fused_reweight_histogram_shared, fused_reweight_histogram_shifted,
        spline_selector,
    )
    from mach3_tpu.tutorial.large import build_large
    c = 128
    exp = build_large(use_pallas=True, low_memory=True)
    model = exp.model
    rng = np.random.default_rng(0)
    th = jnp.asarray(jitter_init(np, model, np.asarray(model.prefit_vector()), c, rng))
    def t(name, fn, mdl, *arrs, iters=40):
        t1 = time.time()
        try:
            ms = 1e3 * scan_time(jax, jnp, fn, mdl, *arrs, iters=iters)
            out[name] = round(ms, 3)
            print(f"# {name}: {ms:.3f} ms ({time.time()-t1:.0f}s)", flush=True)
        except Exception as exc:
            out[name] = f"ERR {str(exc)[:160]}"
            print(f"# {name}: ERROR {str(exc)[:250]}", flush=True)
        flush()
    t("noop", lambda m, x: x * 1.0000001, None, th)
    tabs = jax.block_until_ready(jax.jit(lambda m, x: m._shared_osc_tables(x))(model, th))
    s = model.samples[0]  # numu
    tb = tabs[0]
    tbl = s.spline_table
    coeffs_flat = jax.block_until_ready(
        tbl.coeffs)
    kr = s.kernel_route
    def base_and_sel(m, x, tb=tb):
        sel = spline_selector(m.spline_table, x)
        def one(t_, cg):
            w = m.mc_weight * m._osc_weights(t_, cg)
            fw = m._func_weights(t_)
            return w if fw is None else w * fw
        return sel, jax.vmap(one)(x, tb)
    def composed_pre(m, x, co):
        sel, bw = base_and_sel(m, x)
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
    t("numu.composed_preflat", composed_pre, s, th, coeffs_flat)
    def composed_reshape(m, x):
        co = m.spline_table.coeffs
        return composed_pre(m, x, co)
    t("numu.composed_inreshape", composed_reshape, s, th)

    # nue shifted kernel CT sweep with precomputed inputs
    s = model.samples[1]
    tb = tabs[1]
    def mk_base(m, x, tb=tb):
        def one(t_, cg):
            w = m.mc_weight * m._osc_weights(t_, cg)
            fw = m._func_weights(t_)
            return w if fw is None else w * fw
        return jax.vmap(one)(x, tb)
    base_w = jax.block_until_ready(jax.jit(mk_base)(s, th))
    selector = jax.block_until_ready(jax.jit(
        lambda m, x: spline_selector(m.spline_table, x))(s, th))
    co_nue = jax.block_until_ready(s.spline_table.coeffs)
    fn, param_index, edges, stride_j, n_axis_j = s.kernel_shift
    ne = jnp.concatenate([
        jnp.take(th, s.norm_applied, axis=1).astype(jnp.float32),
        jnp.ones((c, 1), jnp.float32)], 1)
    shift_vals = th[:, param_index].astype(jnp.float32)
    x_nom = s.kin[s.shifts[0].var_row]
    for ct in (16, 64, 128):
        def k(m, sel, co, bw, nx, ct=ct):
            return fused_reweight_histogram_shifted(
                sel, co, bw, shift_vals, x_nom, m.shift_static_base,
                n_bins=m.n_bins, shift_fn=fn, edges=edges, stride_j=stride_j,
                n_axis_j=n_axis_j, norm_ext=nx, norm_s=m.norm_s,
                chain_tile=ct, event_tile=2048, param_tile=8)
        t(f"nue.kernel_ct{ct}", k, s, selector, co_nue, base_w, ne)
    print(json.dumps(out), flush=True)

main()
