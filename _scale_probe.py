"""TPU probe: reference-scale fixture timings (run on the real chip).

Usage: python _scale_probe.py [--small] [--bf16] [--chains C]
Reports per-sample reweight+LLH times and full-step times as JSON lines.
"""
import argparse
import json
import os
import sys
import time

if os.environ.get("JAX_PLATFORMS") and "cpu" not in os.environ["JAX_PLATFORMS"]:
    os.environ["JAX_PLATFORMS"] = os.environ["JAX_PLATFORMS"] + ",cpu"
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/mach3_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import jax.numpy as jnp
import numpy as np

ap = argparse.ArgumentParser()
ap.add_argument("--small", action="store_true")
ap.add_argument("--bf16", action="store_true")
ap.add_argument("--chains", type=int, default=64)
ap.add_argument("--iters", type=int, default=20)
ap.add_argument("--mcmc", action="store_true", help="also run a 3-chunk MCMC")
args = ap.parse_args()

print("# default_backend:", jax.default_backend(), file=sys.stderr, flush=True)

from mach3_tpu.tutorial.large import build_large

t0 = time.perf_counter()
kw = dict(low_memory=args.bf16, use_pallas=True)
if args.small:
    kw.update(n_numu=20_000, n_nue=6_000, n_atmo=15_000, e_grid_size=60,
              atmo_e_grid_size=25, atmo_cosz_grid_size=10)
exp = build_large(**kw)
print(f"# build: {time.perf_counter()-t0:.1f}s", file=sys.stderr, flush=True)
for s in exp.samples:
    print(f"# {s.name}: E={s.n_events} B={s.n_bins} route={s.kernel_route.variant} "
          f"ct={s.kernel_route.chain_tile} et={s.kernel_route.event_tile} "
          f"pt={s.kernel_route.param_tile} ({s.kernel_route.reason})",
          file=sys.stderr, flush=True)

C = args.chains
model = exp.model
theta0 = np.asarray(model.prefit_vector())
thetas = jnp.asarray(
    np.tile(theta0, (C, 1))
    + 1e-3 * np.random.default_rng(0).normal(size=(C, len(theta0)))
)


def scan_time(name, fn, mdl, *arrs, iters=args.iters):
    """Time fn(mdl, *arrs) inside a scan. The model rides as a jit ARGUMENT
    (GB-scale tables as buffers, not HLO constants — the remote compile
    service 413s on constant-laden programs); the carry perturbs the first
    array arg so XLA cannot hoist the body out of the loop."""
    def run(m):
        def body(carry, _):
            a0 = arrs[0] + carry * 0
            out = fn(m, a0, *arrs[1:])
            leaf = jax.tree_util.tree_leaves(out)[0]
            return carry + jnp.sum(leaf).astype(jnp.float32) * 1e-30, None

        return jax.lax.scan(body, jnp.float32(0), None, length=iters)[0]

    g = jax.jit(run)
    tc = time.perf_counter()
    jax.block_until_ready(g(mdl))
    compile_s = time.perf_counter() - tc
    t0 = time.perf_counter()
    jax.block_until_ready(g(mdl))
    dt = time.perf_counter() - t0
    print(json.dumps({"component": name, "ms": round(1e3 * dt / iters, 3),
                      "compile_s": round(compile_s, 1)}), flush=True)


scan_time("total_nll (full step LLH)", lambda m, t: m.total_nll_batch(t), model, thetas)
for s in model.samples:
    scan_time(f"reweight[{s.name}]", lambda m, t: m.reweight_batch(t), s, thetas)
    if s.osc is not None:
        scan_time(
            f"osc_grids[{s.name}]",
            lambda m, t: jax.vmap(m.osc_prob_grids)(t),
            s,
            thetas,
        )

if args.mcmc:
    from mach3_tpu.fitters.mcmc import MR2T2, MCMCConfig

    init = np.tile(theta0, (C, 1)) + 1e-3 * np.random.default_rng(1).normal(
        size=(C, len(theta0))
    )
    fitter = MR2T2(model, MCMCConfig(n_steps=100, chunk_size=50), init, seed=2)
    t0 = time.perf_counter()
    fitter.run(n_steps=50)
    print(f"# mcmc warmup: {time.perf_counter()-t0:.1f}s", file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    fitter.run(n_steps=100)
    jax.block_until_ready(fitter.state.theta)
    dt = time.perf_counter() - t0
    print(json.dumps({"component": "mcmc_step", "ms": round(1e3 * dt / 100, 3),
                      "chain_steps_per_sec": round(100 * C / dt, 1)}), flush=True)
