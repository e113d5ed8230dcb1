"""Headline benchmark: MCMC throughput on the tutorial-scale fit, plus the
BASELINE.md north-star metrics as extra fields.

Prints ONE JSON line whose required keys are {"metric", "value", "unit",
"vs_baseline"}; additional fields carry:

* spline_reweight_events_per_sec — per-sample fused reweight throughput
  (events x chains / wall time),
* ess_per_hour — min-over-params effective samples per hour on the toy fit
  (all chains pooled),
* component_ms — per-step component budget at 256 chains (propose /
  osc grids / reweight+hist / full LLH),
* chains_1024 — throughput point at 1024 chains,
* large_scale — the reference-scale fixture (101 params, 510k events,
  3 samples, 2,182 bins): steps/s at 64 chains + reweight events/s.

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

    n_events = 100_000
    n_chains = 256
    n_steps = 200
    extras: dict = {}

    t = time.perf_counter()
    toy = build_toy(n_events=n_events, seed=42, e_grid_size=200, use_pallas=True)
    t = stage("build_toy", t)
    theta0 = np.asarray(toy.model.prefit_vector())
    rng = np.random.default_rng(0)
    init = np.tile(theta0, (n_chains, 1)) + 1e-3 * rng.normal(size=(n_chains, len(theta0)))

    fitter = MR2T2(toy.model, MCMCConfig(n_steps=n_steps, chunk_size=50), init, seed=1)
    fitter.run(n_steps=50)  # compile + warm-up
    t = stage("warmup (compile + 50 steps)", t)
    t0 = time.perf_counter()
    out = fitter.run(n_steps=n_steps)
    jax.block_until_ready(fitter.state.theta)
    dt = time.perf_counter() - t0
    chain_steps_per_sec = n_steps * n_chains / dt
    t = stage(f"headline run ({chain_steps_per_sec:,.0f} chain-steps/s)", t)

    # ---- ESS/hour on the toy fit (pooled over chains, min over params)
    try:
        from mach3_tpu.diagnostics.autocorr import effective_sample_size

        draws = out["theta"]  # [S, C, P]
        # ESS runs on CPU: it is offline post-processing, and the FFT
        # autocorrelation does not lower through the remote TPU compile path.
        with jax.default_device(jax.local_devices(backend="cpu")[0]):
            ess_per_param = np.asarray(
                jax.jit(jax.vmap(effective_sample_size, in_axes=1, out_axes=0))(
                    jnp.asarray(draws)
                )
            )  # [C, P] per chain
        ess_total = ess_per_param.sum(axis=0)  # pooled over chains
        wall_hours = dt / 3600.0
        extras["ess_per_hour"] = {
            "min": round(float(ess_total.min() / wall_hours), 1),
            "median": round(float(np.median(ess_total) / wall_hours), 1),
            "steps_measured": n_steps,
        }
        t = stage("ess", t)
    except Exception as exc:  # pragma: no cover
        extras["ess_per_hour"] = {"error": str(exc)[:200]}

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
    try:
        big_init = np.tile(theta0, (1024, 1)) + 1e-3 * rng.normal(
            size=(1024, len(theta0))
        )
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
    if os.environ.get("MACH3_BENCH_LARGE", "1") != "0":
        try:
            from mach3_tpu.tutorial.large import build_large

            exp = build_large(use_pallas=True, low_memory=True)
            t = stage("build_large", t)
            c_large = 128  # near the per-chain/per-chip throughput sweet spot
            th_l = np.tile(np.asarray(exp.model.prefit_vector()), (c_large, 1))
            th_l = jnp.asarray(
                th_l + 1e-3 * rng.normal(size=th_l.shape)
            )
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
        except Exception as exc:  # pragma: no cover
            extras["large_scale"] = {"error": str(exc)[:300]}

    # ---- ChEES-HMC ESS/hour on the toy fit (gradient-based sampling the
    # reference cannot do; cross-chain trajectory adaptation)
    if os.environ.get("MACH3_BENCH_HMC", "1") != "0":
        try:
            from mach3_tpu.diagnostics.autocorr import effective_sample_size
            from mach3_tpu.fitters.hmc import HMC, HMCConfig

            c_hmc = 64
            init_h = np.tile(theta0, (c_hmc, 1)) + 1e-3 * rng.normal(
                size=(c_hmc, len(theta0))
            )
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
            with jax.default_device(jax.local_devices(backend="cpu")[0]):
                ess_h = np.asarray(
                    jax.jit(jax.vmap(effective_sample_size, in_axes=1, out_axes=0))(
                        jnp.asarray(out_h["theta"])
                    )
                )
            ess_tot = ess_h.sum(axis=0)
            extras["chees_hmc"] = {
                "chains": c_hmc,
                "steps_per_sec": round(n_meas * c_hmc / dt_h, 1),
                "acceptance": round(float(hmc.acceptance_rate.mean()), 3),
                "traj_time": round(float(np.exp(np.asarray(hmc.state.log_traj))), 4),
                "ess_per_hour": {
                    "min": round(float(ess_tot.min() / (dt_h / 3600.0)), 1),
                    "median": round(float(np.median(ess_tot) / (dt_h / 3600.0)), 1),
                },
            }
            t = stage("chees-hmc", t)
        except Exception as exc:  # pragma: no cover
            extras["chees_hmc"] = {"error": str(exc)[:200]}

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
