"""Headline benchmark: MCMC throughput on the tutorial-scale fit, plus the
BASELINE.md north-star metrics as extra fields.

Prints ONE JSON line whose required keys are {"metric", "value", "unit",
"vs_baseline"}; additional fields carry:

* adaptive — the PRODUCTION sampler (pooled Haario + Robbins-Monro, the
  reference's default mode): steps/s, acceptance, and ESS/hour on the toy,
* spline_reweight_events_per_sec — per-sample fused reweight throughput,
* ess_per_hour — fixed-proposal ESS/hour (kept for r01/r02 comparability),
* component_ms — per-step component budget at 256 chains,
* chains_1024 — throughput point at 1024 chains,
* parallel_tempering — cold-chain steps/s + swap acceptance on the toy,
* large_scale — the reference-scale fixture (101 params, 510k events,
  3 samples, 2,182 bins): steps/s at 128 chains, reweight events/s, and the
  ADAPTIVE sampler's ESS/hour at this scale,
* hmc — gradient samplers: ChEES-HMC toy steps/s + ESS/hour, and the
  large-fixture gradient-path budget (XLA forward / backward vs the fused
  Pallas forward),
* headline_floor — guard against silent throughput regressions (r01 anchor).

Environment knobs: MACH3_BENCH_{LARGE,HMC,PT,ADAPTIVE}=0 skip sections;
MACH3_BENCH_SMALL=1 shrinks every size for CI shape checks (numbers are then
meaningless — the driver runs the full sizes on TPU hardware).

vs_baseline: the reference's stated ND-fit target is "<0.1 s/step
eventually" on CPU for a comparable reweight
(``Samples/SampleHandlerFD.cpp:396-408``), i.e. 10 steps/s on a single
chain; vs_baseline = value / 10. This is an aspirational note in the
reference, not a measured number (BASELINE.json is empty).
"""
from __future__ import annotations

import json
import os
import sys
import time

# r01 headline (chain-steps/s, 256 chains x 100k events, 1 chip) — the floor
# guard: BENCH_r02 silently regressed 18.7% against this before it was caught.
R01_HEADLINE = 44_768.0


def stage(msg, t0):
    print(f"# {msg}: {time.perf_counter() - t0:.1f}s", file=sys.stderr, flush=True)
    return time.perf_counter()


def scan_time(jax, jnp, fn, mdl, *arrs, iters=20):
    """Per-call time of fn(mdl, *arrs) inside a lax.scan (dispatch-free). The
    model is a jit ARGUMENT so its tables are buffers, not HLO constants
    (the remote compile service rejects constant-laden programs); the carry
    perturbs the first array arg so XLA cannot hoist the body."""
    def run(m):
        def body(carry, _):
            a0 = arrs[0] + carry * 0
            out = fn(m, a0, *arrs[1:])
            leaf = jax.tree_util.tree_leaves(out)[0]
            return carry + jnp.sum(leaf).astype(jnp.float32) * 1e-30, None

        return jax.lax.scan(body, jnp.float32(0), None, length=iters)[0]

    g = jax.jit(run)
    jax.block_until_ready(g(mdl))  # compile + warm
    t0 = time.perf_counter()
    jax.block_until_ready(g(mdl))
    return (time.perf_counter() - t0) / iters


def jitter_init(np, model, theta0, n_chains, rng, frac=0.05):
    """Initial chain positions: prefit + frac*prior-sigma jitter, clipped
    inside the bounds. A flat 1e-3 jitter (r01/r02 bench) threw ~99% of
    chains out of bounds on narrow parameters (dm2_21 prior sigma ~1.8e-5,
    bounds [6e-5, 9e-5]) where they stay stuck — every ESS/acceptance
    number measured mostly-frozen chains."""
    flat = model._flat()
    chol = np.asarray(flat.chol)
    sig = np.sqrt(np.diag(chol @ chol.T))
    lo, hi = np.asarray(flat.low_bound), np.asarray(flat.up_bound)
    init = theta0 + frac * sig * rng.normal(size=(n_chains, len(theta0)))
    eps = 1e-6 * (hi - lo)
    return np.clip(init, lo + eps, hi - eps)


def _pooled_ess(jax, jnp, np, draws):
    """Min/median ESS over params, chains pooled. draws [S, C, P]."""
    from mach3_tpu.diagnostics.autocorr import effective_sample_size

    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        ess = np.asarray(
            jax.jit(jax.vmap(effective_sample_size, in_axes=1, out_axes=0))(
                jnp.asarray(draws)
            )
        )  # [C, P]
    tot = ess.sum(axis=0)
    return float(tot.min()), float(np.median(tot))


def main() -> None:
    # Allow a CPU backend next to the TPU one so build-time work (Asimov data)
    # avoids minutes of remote TPU compilation; the fit itself runs on TPU.
    if os.environ.get("JAX_PLATFORMS") and "cpu" not in os.environ["JAX_PLATFORMS"]:
        os.environ["JAX_PLATFORMS"] = os.environ["JAX_PLATFORMS"] + ",cpu"
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/mach3_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import jax.numpy as jnp
    import numpy as np

    from mach3_tpu.fitters.mcmc import MR2T2, MCMCConfig
    from mach3_tpu.tutorial.toy import build_toy

    small = os.environ.get("MACH3_BENCH_SMALL", "0") == "1"
    n_events = 2_000 if small else 100_000
    n_chains = 16 if small else 256
    n_steps = 60 if small else 200
    e_grid = 40 if small else 200
    extras: dict = {}

    t = time.perf_counter()
    # "auto" in small mode: CI shape checks run on CPU where the fused Pallas
    # route cannot execute; the TPU bench keeps the explicit request.
    toy = build_toy(
        n_events=n_events, seed=42, e_grid_size=e_grid,
        use_pallas="auto" if small else True,
    )
    t = stage("build_toy", t)
    theta0 = np.asarray(toy.model.prefit_vector())
    rng = np.random.default_rng(0)
    init = jitter_init(np, toy.model, theta0, n_chains, rng)

    fitter = MR2T2(toy.model, MCMCConfig(n_steps=n_steps, chunk_size=50), init, seed=1)
    fitter.run(n_steps=50)  # compile + warm-up
    t = stage("warmup (compile + 50 steps)", t)
    t0 = time.perf_counter()
    out = fitter.run(n_steps=n_steps)
    jax.block_until_ready(fitter.state.theta)
    dt = time.perf_counter() - t0
    chain_steps_per_sec = n_steps * n_chains / dt
    t = stage(f"headline run ({chain_steps_per_sec:,.0f} chain-steps/s)", t)
    if not small:
        extras["headline_floor"] = {
            "r01_anchor": R01_HEADLINE,
            "ratio_vs_r01": round(chain_steps_per_sec / R01_HEADLINE, 3),
            "regressed": bool(chain_steps_per_sec < 0.9 * R01_HEADLINE),
        }

    # ---- ESS/hour on the toy fit (pooled over chains, min over params)
    try:
        mn, md = _pooled_ess(jax, jnp, np, out["theta"])
        wall_hours = dt / 3600.0
        extras["ess_per_hour"] = {
            "min": round(mn / wall_hours, 1),
            "median": round(md / wall_hours, 1),
            "steps_measured": n_steps,
        }
        t = stage("ess", t)
    except Exception as exc:  # pragma: no cover
        extras["ess_per_hour"] = {"error": str(exc)[:200]}

    # ---- PRODUCTION sampler: pooled Haario + Robbins-Monro adaptive MCMC
    if os.environ.get("MACH3_BENCH_ADAPTIVE", "1") != "0":
        try:
            n_ad = 100 if small else 600
            cfg_ad = MCMCConfig(
                n_steps=n_ad, chunk_size=50, adaptive=True,
                adaption_mode="pooled", adaption_start_update=50,
                adaption_start_throw=200, adaption_update_step=100,
            )
            fa = MR2T2(toy.model, cfg_ad, init, seed=2)
            fa.run(n_steps=max(100, n_ad // 2))  # compile + adaptation warm-up
            t0 = time.perf_counter()
            out_a = fa.run(n_steps=n_ad)
            jax.block_until_ready(fa.state.theta)
            dt_a = time.perf_counter() - t0
            mn, md = _pooled_ess(jax, jnp, np, out_a["theta"])
            extras["adaptive"] = {
                "chain_steps_per_sec": round(n_ad * n_chains / dt_a, 1),
                "acceptance": round(float(np.mean(out_a["accepted"])), 3),
                "ess_per_hour": {
                    "min": round(mn / (dt_a / 3600.0), 1),
                    "median": round(md / (dt_a / 3600.0), 1),
                },
                "vs_fixed_steps_per_sec": round(
                    (n_ad * n_chains / dt_a) / chain_steps_per_sec, 3
                ),
            }
            t = stage("adaptive (production sampler)", t)
        except Exception as exc:  # pragma: no cover
            extras["adaptive"] = {"error": str(exc)[:200]}

    # ---- parallel tempering (multimodal production mode; octant physics)
    if os.environ.get("MACH3_BENCH_PT", "1") != "0":
        try:
            from mach3_tpu.fitters.tempering import ParallelTempering, PTConfig

            n_w = 8 if small else 64
            n_pt = 60 if small else 300
            init_pt = jitter_init(np, toy.model, theta0, n_w, rng)
            pt = ParallelTempering(
                toy.model,
                PTConfig(n_steps=n_pt, n_temps=6, max_temp=32.0, chunk_size=50),
                init_pt,
                seed=5,
            )
            pt.run(n_steps=50)
            t0 = time.perf_counter()
            out_pt = pt.run(n_steps=n_pt)
            jax.block_until_ready(pt.state.theta)
            dt_pt = time.perf_counter() - t0
            sw = np.asarray(pt.state.swap_accepts) / np.maximum(
                np.asarray(pt.state.swap_attempts) * n_w, 1
            )
            extras["parallel_tempering"] = {
                "levels": 6,
                "walkers": n_w,
                "cold_chain_steps_per_sec": round(n_pt * n_w / dt_pt, 1),
                "all_level_chain_steps_per_sec": round(n_pt * n_w * 6 / dt_pt, 1),
                "swap_acceptance": [round(float(x), 3) for x in sw],
            }
            t = stage("parallel tempering", t)
        except Exception as exc:  # pragma: no cover
            extras["parallel_tempering"] = {"error": str(exc)[:200]}

    # ---- per-step component budget + spline-reweight events/s (256 chains)
    try:
        thetas = jnp.asarray(init)
        comp = {}
        from mach3_tpu.params.state import propose_step_batch

        key0 = jax.random.key(0)
        comp["propose_ms"] = round(
            1e3 * scan_time(
                jax, jnp,
                lambda m, th: propose_step_batch(m._flat(), th, key0),
                toy.model,
                thetas,
            ), 3,
        )
        s0 = toy.model.samples[0]
        dt_rw = scan_time(jax, jnp, lambda m, t: m.reweight_batch(t), s0, thetas)
        comp["reweight_hist_ms"] = round(1e3 * dt_rw, 3)
        extras["spline_reweight_events_per_sec"] = round(
            s0.n_events * n_chains / dt_rw, 0
        )
        if s0.osc is not None:
            comp["osc_grids_ms"] = round(
                1e3 * scan_time(jax, jnp, lambda m, t: jax.vmap(m.osc_prob_grids)(t), s0, thetas), 3
            )
        comp["total_nll_ms"] = round(
            1e3 * scan_time(jax, jnp, lambda m, t: m.total_nll_batch(t), toy.model, thetas), 3
        )
        extras["component_ms"] = comp
        t = stage("components", t)
    except Exception as exc:  # pragma: no cover
        extras["component_ms"] = {"error": str(exc)[:200]}

    # ---- 1024-chain throughput point
    if not small:
        try:
            big_init = jitter_init(np, toy.model, theta0, 1024, rng)
            f2 = MR2T2(toy.model, MCMCConfig(n_steps=100, chunk_size=50), big_init, seed=3)
            f2.run(n_steps=50)
            t0 = time.perf_counter()
            f2.run(n_steps=100)
            jax.block_until_ready(f2.state.theta)
            dt2 = time.perf_counter() - t0
            extras["chains_1024"] = {
                "chain_steps_per_sec": round(100 * 1024 / dt2, 1),
                "scaling_efficiency_vs_256": round(
                    (100 * 1024 / dt2) / chain_steps_per_sec, 3
                ),
            }
            t = stage("1024 chains", t)
        except Exception as exc:  # pragma: no cover
            extras["chains_1024"] = {"error": str(exc)[:200]}

    # ---- reference-scale fixture (VERDICT r1 item 1 numbers)
    if os.environ.get("MACH3_BENCH_LARGE", "1") != "0" and not small:
        try:
            from mach3_tpu.tutorial.large import build_large

            exp = build_large(use_pallas=True, low_memory=True)
            t = stage("build_large", t)
            c_large = 128  # near the per-chain/per-chip throughput sweet spot
            th_l = jnp.asarray(jitter_init(
                np, exp.model, np.asarray(exp.model.prefit_vector()), c_large, rng
            ))
            dt_nll = scan_time(jax, jnp, lambda m, t: m.total_nll_batch(t), exp.model, th_l, iters=10)
            ev_total = sum(s.n_events for s in exp.samples)
            rw = {}
            for s in exp.samples:
                d = scan_time(jax, jnp, lambda m, t: m.reweight_batch(t), s, th_l, iters=10)
                rw[s.name] = {
                    "ms": round(1e3 * d, 3),
                    "events_per_sec": round(s.n_events * c_large / d, 0),
                    "route": s.kernel_route.variant,
                }
            init_l = np.asarray(th_l)
            fl = MR2T2(exp.model, MCMCConfig(n_steps=60, chunk_size=30), init_l, seed=4)
            fl.run(n_steps=30)
            t0 = time.perf_counter()
            fl.run(n_steps=60)
            jax.block_until_ready(fl.state.theta)
            dt_l = time.perf_counter() - t0
            th_256 = jnp.asarray(
                np.tile(np.asarray(exp.model.prefit_vector()), (256, 1))
                + 1e-3 * rng.normal(size=(256, exp.n_params))
            )
            dt_nll256 = scan_time(
                jax, jnp, lambda m, t: m.total_nll_batch(t), exp.model, th_256, iters=10
            )
            extras["large_scale"] = {
                "n_params": exp.n_params,
                "n_events": ev_total,
                "n_bins": sum(s.n_bins for s in exp.samples),
                "chains": c_large,
                "chain_steps_per_sec": round(60 * c_large / dt_l, 1),
                "step_ms": round(1e3 * dt_l / 60, 2),
                "total_nll_ms": round(1e3 * dt_nll, 2),
                "nll_256_chains": {
                    "ms": round(1e3 * dt_nll256, 2),
                    "chain_nll_per_sec": round(256 / dt_nll256, 1),
                },
                "reweight": rw,
            }
            t = stage("large-scale", t)

            # ADAPTIVE (production) sampler at reference scale: ESS/hour
            if os.environ.get("MACH3_BENCH_ADAPTIVE", "1") != "0":
                cfg_al = MCMCConfig(
                    n_steps=400, chunk_size=50, adaptive=True,
                    adaption_mode="pooled", adaption_start_update=30,
                    adaption_start_throw=150, adaption_update_step=50,
                )
                fal = MR2T2(exp.model, cfg_al, init_l, seed=6)
                fal.run(n_steps=200)  # compile + adaptation warm-up
                t0 = time.perf_counter()
                out_al = fal.run(n_steps=400)
                jax.block_until_ready(fal.state.theta)
                dt_al = time.perf_counter() - t0
                mn, md = _pooled_ess(jax, jnp, np, out_al["theta"])
                extras["large_scale"]["adaptive"] = {
                    "chain_steps_per_sec": round(400 * c_large / dt_al, 1),
                    "acceptance": round(float(np.mean(out_al["accepted"])), 3),
                    "ess_per_hour": {
                        "min": round(mn / (dt_al / 3600.0), 1),
                        "median": round(md / (dt_al / 3600.0), 1),
                    },
                }
                t = stage("large-scale adaptive", t)
        except Exception as exc:  # pragma: no cover
            extras["large_scale"] = {"error": str(exc)[:300]}

    # ---- gradient samplers: ChEES-HMC on the toy + large-fixture grad budget
    if os.environ.get("MACH3_BENCH_HMC", "1") != "0" and not small:
        try:
            from mach3_tpu.fitters.hmc import HMC, HMCConfig

            c_hmc = 64
            init_h = jitter_init(np, toy.model, theta0, c_hmc, rng)
            hmc = HMC(
                toy.model,
                HMCConfig(
                    step_size=0.05, adapt_steps=150, adapt_trajectory=True,
                    max_leapfrog=64, chunk_size=50,
                ),
                init_h,
                seed=7,
            )
            hmc.run(n_steps=200)  # compile + warm-up + adaptation
            n_meas = 150
            t0 = time.perf_counter()
            out_h = hmc.run(n_steps=n_meas)
            jax.block_until_ready(hmc.state.theta)
            dt_h = time.perf_counter() - t0
            mn, md = _pooled_ess(jax, jnp, np, out_h["theta"])
            extras["chees_hmc"] = {
                "chains": c_hmc,
                "steps_per_sec": round(n_meas * c_hmc / dt_h, 1),
                "acceptance": round(float(hmc.acceptance_rate.mean()), 3),
                "traj_time": round(float(np.exp(np.asarray(hmc.state.log_traj))), 4),
                "ess_per_hour": {
                    "min": round(mn / (dt_h / 3600.0), 1),
                    "median": round(md / (dt_h / 3600.0), 1),
                },
            }
            t = stage("chees-hmc", t)
        except Exception as exc:  # pragma: no cover
            extras["chees_hmc"] = {"error": str(exc)[:200]}

        # Large-fixture gradient-path budget: XLA forward/backward vs fused
        # Pallas forward (VERDICT r2 #2: the gradient path must be measured
        # at reference scale, not assumed).
        if os.environ.get("MACH3_BENCH_LARGE", "1") != "0":
            try:
                from mach3_tpu.tutorial.large import build_large as _bl

                if "exp" not in dir():
                    exp = _bl(use_pallas=True, low_memory=True)
                c_g = 64
                th_g = jnp.asarray(jitter_init(
                    np, exp.model, np.asarray(exp.model.prefit_vector()), c_g, rng
                ))
                def _lp_xla(m, t_):
                    # The pre-VJP gradient path (pure-XLA spline product +
                    # scatter histogram) kept as the comparison baseline.
                    tabs = m._shared_osc_tables(t_)
                    total = jnp.zeros((t_.shape[0],))
                    for i, s in enumerate(m.samples):
                        total = total - s.log_likelihood_batch_xla(
                            t_, osc_grids_batch=tabs[i]
                        )
                    return total

                fwd = scan_time(
                    jax, jnp, lambda m, t: m.log_posterior_batch(t),
                    exp.model, th_g, iters=5,
                )
                grad = scan_time(
                    jax, jnp,
                    lambda m, t: jax.grad(lambda tt: jnp.sum(m.log_posterior_batch(tt)))(t),
                    exp.model, th_g, iters=5,
                )
                fused = scan_time(
                    jax, jnp, lambda m, t: m.total_nll_batch(t),
                    exp.model, th_g, iters=5,
                )
                extras["hmc_large_grad_budget"] = {
                    "chains": c_g,
                    "diff_forward_ms": round(1e3 * fwd, 2),
                    "diff_grad_ms": round(1e3 * grad, 2),
                    "fused_forward_ms": round(1e3 * fused, 2),
                    "diff_fwd_over_fused": round(fwd / fused, 2),
                    "grad_over_fused": round(grad / fused, 2),
                }
                # The pure-XLA-grad baseline costs ~15 min of (uncacheable
                # remote) compile for a number that is stable run to run;
                # measured r3: 263.12 ms vs 84.18 fused (3.13x speedup,
                # docs/ROOFLINE.md). Re-measure with MACH3_BENCH_XLA_GRAD=1.
                if os.environ.get("MACH3_BENCH_XLA_GRAD", "0") == "1":
                    try:
                        grad_x = scan_time(
                            jax, jnp,
                            lambda m, t: jax.grad(lambda tt: jnp.sum(_lp_xla(m, tt)))(t),
                            exp.model, th_g, iters=3,
                        )
                        extras["hmc_large_grad_budget"]["xla_grad_ms"] = round(
                            1e3 * grad_x, 2
                        )
                        extras["hmc_large_grad_budget"]["fused_grad_speedup"] = (
                            round(grad_x / grad, 2)
                        )
                    except Exception as exc:  # pragma: no cover
                        extras["hmc_large_grad_budget"]["xla_grad_error"] = (
                            str(exc)[:200]
                        )
                else:
                    extras["hmc_large_grad_budget"]["xla_grad_ms_r3_reference"] = 263.12
                t = stage("large grad budget", t)

                # ChEES-HMC SAMPLER at reference scale — the capability the
                # reference cannot have, at the scale that matters. Short
                # measurement window; ESS/hour is the comparable north-star.
                hl = HMC(
                    exp.model,
                    HMCConfig(
                        step_size=0.02, adapt_steps=60, adapt_trajectory=True,
                        max_leapfrog=16, chunk_size=20,
                    ),
                    np.asarray(th_g),
                    seed=8,
                )
                hl.run(n_steps=80)  # compile + warm-up + adaptation
                n_hl = 60
                t0 = time.perf_counter()
                out_hl = hl.run(n_steps=n_hl)
                jax.block_until_ready(hl.state.theta)
                dt_hl = time.perf_counter() - t0
                mn, md = _pooled_ess(jax, jnp, np, out_hl["theta"])
                extras["chees_hmc_large"] = {
                    "chains": c_g,
                    "steps_per_sec": round(n_hl * c_g / dt_hl, 1),
                    "acceptance": round(float(hl.acceptance_rate.mean()), 3),
                    "ess_per_hour": {
                        "min": round(mn / (dt_hl / 3600.0), 1),
                        "median": round(md / (dt_hl / 3600.0), 1),
                    },
                }
                t = stage("chees-hmc large", t)
            except Exception as exc:  # pragma: no cover
                key = (
                    "chees_hmc_large"
                    if "hmc_large_grad_budget" in extras
                    else "hmc_large_grad_budget"
                )
                extras[key] = {"error": str(exc)[:300]}

    print(
        json.dumps(
            {
                "metric": "mcmc_chain_steps_per_sec",
                "value": round(chain_steps_per_sec, 2),
                "unit": f"chain-steps/s ({n_chains} chains x {n_events} events, 1 chip)",
                "vs_baseline": round(chain_steps_per_sec / 10.0, 2),
                "vs_baseline_note": (
                    "anchor is the reference's aspirational '<0.1 s/step' "
                    "ND-reweight note (10 steps/s, 1 chain), not a measured "
                    "number — BASELINE.json is empty"
                ),
                **extras,
            }
        )
    )


if __name__ == "__main__":
    main()
