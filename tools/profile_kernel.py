"""Isolated fused-kernel timings on the large fixture (incremental logging).

Writes every measurement to PROF_OUT (default /tmp/profile_kernel.json) AS IT
LANDS — a harness kill loses nothing. Each tile config is a fresh remote
Mosaic compile (~minutes); keep the variant list short. The scan_time
dispatch offset is reported as `noop` at the same iters — subtract it.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_kernel.py
Env: PROF_ITERS (40), PROF_OUT, PROF_VARIANTS="ct,et,pt;ct,et,pt;..."
"""
from __future__ import annotations

import json
import os
import sys
import time

if os.environ.get("JAX_PLATFORMS") and "cpu" not in os.environ["JAX_PLATFORMS"]:
    os.environ["JAX_PLATFORMS"] = os.environ["JAX_PLATFORMS"] + ",cpu"

import jax

jax.config.update("jax_compilation_cache_dir", os.environ.get("MACH3_JAX_CACHE", "/root/repo/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from bench import jitter_init, scan_time  # noqa: E402

ITERS = int(os.environ.get("PROF_ITERS", 40))
OUT_PATH = os.environ.get("PROF_OUT", "/tmp/profile_kernel.json")
VARIANTS = [
    tuple(int(x) for x in v.split(","))
    for v in os.environ.get("PROF_VARIANTS", "128,1024,8;128,2048,8").split(";")
    if v
]

out: dict = {"iters": ITERS}


def flush() -> None:
    with open(OUT_PATH, "w") as f:
        json.dump(out, f)
        f.write("\n")


def main() -> None:
    from mach3_tpu.splines.pallas_reweight import (
        fused_reweight_histogram_shared,
        spline_selector,
    )
    from mach3_tpu.tutorial.large import build_large

    c = 128
    t0 = time.time()
    exp = build_large(use_pallas=True, low_memory=True)
    print(f"# build_large: {time.time()-t0:.0f}s", flush=True)
    model = exp.model
    rng = np.random.default_rng(0)
    th = jnp.asarray(jitter_init(np, model, np.asarray(model.prefit_vector()), c, rng))
    out["chains"] = c
    flush()

    def t(name, fn, mdl, *arrs, iters=ITERS):
        t1 = time.time()
        try:
            ms = 1e3 * scan_time(jax, jnp, fn, mdl, *arrs, iters=iters)
            out[name] = round(ms, 3)
            print(f"# {name}: {ms:.3f} ms (wall {time.time()-t1:.0f}s)", flush=True)
        except Exception as exc:
            out[name] = f"ERR {str(exc)[:160]}"
            print(f"# {name}: ERROR {str(exc)[:200]}", flush=True)
        flush()

    t("noop", lambda m, x: x * 1.0000001, None, th)

    tabs = jax.block_until_ready(
        jax.jit(lambda m, x: m._shared_osc_tables(x))(model, th)
    )
    for i, s in enumerate(model.samples):
        if s.static_bins is None:
            continue
        tab = tabs[i]

        def mk_base(m, x, tb=tab):
            def one(t_, cg):
                w = m.mc_weight * m._osc_weights(t_, cg)
                if m.tf1_table is not None:
                    w = w * m.tf1_table.eval(t_)
                fw = m._func_weights(t_)
                return w if fw is None else w * fw
            return jax.vmap(one)(x, tb)

        base_w = jax.block_until_ready(jax.jit(mk_base)(s, th))
        selector = jax.block_until_ready(
            jax.jit(lambda m, x: spline_selector(m.spline_table, x))(s, th)
        )
        tbl = s.spline_table
        coeffs = tbl.coeffs
        ones = jnp.ones((c, 1), jnp.float32)
        norm_ext = jnp.concatenate(
            [jnp.take(th, s.norm_applied, axis=1).astype(jnp.float32), ones], 1
        ) if s.norm_applied is not None else jnp.concatenate(
            [th.astype(jnp.float32), ones], 1
        )
        kr = s.kernel_route
        print(f"# {s.name}: P={coeffs.shape[0]} E={coeffs.shape[2]} "
              f"bins={s.n_bins} route ct={kr.chain_tile} et={kr.event_tile} "
              f"pt={kr.param_tile} NA1={norm_ext.shape[1]}", flush=True)
        configs = [(kr.chain_tile, kr.event_tile, kr.param_tile)] + VARIANTS
        for ct, et, pt in configs:
            # Large arrays ride as scan args (closure constants -> HTTP 413).
            def k(m, sel, co, bw, ne, ct=ct, et=et, pt=pt):
                return fused_reweight_histogram_shared(
                    sel, co, bw, m.static_bins, n_bins=m.n_bins,
                    norm_ext=ne, norm_s=m.norm_s,
                    chain_tile=ct, event_tile=et, param_tile=pt,
                )
            t(f"{s.name}.kernel_ct{ct}_et{et}_pt{pt}", k, s,
              selector, coeffs, base_w, norm_ext)

        def k_nonorm(m, sel, co, bw):
            return fused_reweight_histogram_shared(
                sel, co, bw, m.static_bins, n_bins=m.n_bins,
                chain_tile=kr.chain_tile, event_tile=kr.event_tile,
                param_tile=kr.param_tile,
            )
        t(f"{s.name}.kernel_nonorm_routed", k_nonorm, s,
          selector, coeffs, base_w)

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
