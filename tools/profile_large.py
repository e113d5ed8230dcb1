"""Per-component on-device decomposition of the large-fixture step.

r3 verdict #2: ROOFLINE.md hypothesised where the ~22 ms between the 2.47 ms
memory floor and the ~24.6 ms measured step go; this script MEASURES the
decomposition on the real chip (scan-timed, dispatch-free) and prints one
JSON blob for ROOFLINE.md's measured table.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_large.py
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


def main() -> None:
    from mach3_tpu.samples.sample import AtmoOscConfig
    from mach3_tpu.samples.teststats import get_test_stat_fn
    from mach3_tpu.splines.pallas_reweight import spline_selector
    from mach3_tpu.tutorial.large import build_large

    c = int(os.environ.get("PROF_CHAINS", 128))
    iters = int(os.environ.get("PROF_ITERS", 40))
    out_path = os.environ.get("PROF_OUT", "/tmp/profile_large.json")
    t0 = time.time()
    exp = build_large(use_pallas=True, low_memory=True)
    print(f"# build_large: {time.time()-t0:.0f}s", file=sys.stderr, flush=True)
    model = exp.model
    rng = np.random.default_rng(0)
    th = jnp.asarray(jitter_init(np, model, np.asarray(model.prefit_vector()), c, rng))

    out: dict = {"chains": c, "iters": iters}

    def t(name, fn, mdl, *arrs, **kw):
        try:
            ms = 1e3 * scan_time(jax, jnp, fn, mdl, *arrs, iters=iters, **kw)
            out[name] = round(ms, 3)
            print(f"# {name}: {ms:.3f} ms", file=sys.stderr, flush=True)
        except Exception as exc:
            ms = float("nan")
            out[name] = f"ERR {str(exc)[:160]}"
            print(f"# {name}: ERROR {str(exc)[:200]}", file=sys.stderr, flush=True)
        with open(out_path, "w") as f:  # incremental: a kill loses nothing
            json.dump(out, f)
        return ms

    # ---- dispatch floor (subtract from everything below)
    t("noop", lambda m, x: x * 1.0000001, None, th)
    # ---- whole things
    t("total_nll_batch", lambda m, x: m.total_nll_batch(x), model, th)
    t("prior_nll", lambda m, x: jax.vmap(m.prior_nll)(x), model, th)

    # ---- oscillation grids (shared beam + atmo)
    groups = model.osc_groups
    uniq = sorted({g for g in groups if g >= 0})
    for g in uniq:
        s = model.samples[g]
        kind = "atmo" if isinstance(s.osc, AtmoOscConfig) else "beam"
        t(f"osc_grids_{kind}_{s.name}",
          lambda m, x: jax.vmap(m.osc_prob_grids)(x), s, th)

    # ---- per-sample pieces
    tabs = jax.jit(lambda m, x: m._shared_osc_tables(x))(model, th)
    tabs = jax.block_until_ready(tabs)
    for i, s in enumerate(model.samples):
        tab = tabs[i]

        # osc gather [C, E] given precomputed grids
        t(f"{s.name}.osc_gather",
          lambda m, x, tb=tab: jax.vmap(m._osc_weights)(x, tb), s, th)
        # norm product (log-matmul or one-hot)
        t(f"{s.name}.norm_weights",
          lambda m, x: jax.vmap(m._norm_weights)(x), s, th)
        # full base-weight assembly (what reweight_batch feeds the kernel),
        # norm included iff it is NOT in-kernel for this route
        norm_in_kernel = s.norm_s is not None and (
            s.kernel_shift is not None or s.static_bins is not None
        )

        def base(m, x, tb=tab, nik=norm_in_kernel):
            def one(t_, cg):
                w = m.mc_weight * m._osc_weights(t_, cg)
                if not nik:
                    w = w * m._norm_weights(t_)
                if m.tf1_table is not None:
                    w = w * m.tf1_table.eval(t_)
                fw = m._func_weights(t_)
                return w if fw is None else w * fw
            return jax.vmap(one)(x, tb)

        t(f"{s.name}.base_w", base, s, th)
        # spline selector
        t(f"{s.name}.selector",
          lambda m, x: spline_selector(m.spline_table, x), s, th)
        # full fused reweight (kernel + everything above)
        t(f"{s.name}.reweight_full",
          lambda m, x, tb=tab: m.reweight_batch(x, tb), s, th)
        # test statistic on precomputed histograms
        mc, w2 = jax.block_until_ready(
            jax.jit(lambda m, x, tb=tab: m.reweight_batch(x, tb))(s, th)
        )
        stat = get_test_stat_fn(s.test_statistic)

        def ts(m, mc_, w2_=w2):
            from mach3_tpu.core.precision import ATYPE
            per = stat(m.data[None, :], mc_.astype(ATYPE), w2_.astype(ATYPE))
            return jnp.sum(per, axis=1)

        t(f"{s.name}.teststat", ts, s, mc)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
