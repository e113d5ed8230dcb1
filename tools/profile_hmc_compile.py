"""Root-cause probe for the reference-scale ChEES-HMC stall (r4 verdict #2).

The compiled unit that stalled >20 min in the r4 judge run was: scan(20
steps) x { dynamic-trip-count fori/while(<=16) of the fused analytic-VJP
gradient + ChEES adaptation } at 101 params / 455k events. Candidate causes:
(a) legitimate-but-huge remote Mosaic/XLA compile (each pallas_call inside a
new jit recompiles; the large model has ~6-10 kernel instantiations across
fwd+bwd), (b) the dynamic trip count specifically sending an XLA pass
pathological, (c) a tunnel wedge.

This probe times each program class separately, writes results to FILE
incrementally (never pipe through tail — CLAUDE.md), and orders phases
safe -> risky so a stall loses only the tail:

  A. fused diff-forward (logp_batch) compile+run
  B. scan(5) of grad — the grad-budget section's program
  C. HMC chunk, chunk=5, STATIC loop bound (max_leapfrog=8)
  D. HMC chunk, chunk=5, DYNAMIC loop bound (the r4 suspect)

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_hmc_compile.py
"""
from __future__ import annotations

import os
import signal
import sys
import time

OUT = os.environ.get("MACH3_PROBE_OUT", "/tmp/hmc_compile_probe.log")
PHASE_DEADLINE_S = int(os.environ.get("MACH3_PROBE_PHASE_S", 900))


def log(msg: str) -> None:
    line = f"[{time.strftime('%H:%M:%S')}] {msg}"
    print(line, flush=True)
    with open(OUT, "a") as f:
        f.write(line + "\n")


class PhaseTimeout(Exception):
    pass


def _alarm(signum, frame):
    raise PhaseTimeout()


def phase(name):
    def deco(fn):
        def run():
            signal.alarm(PHASE_DEADLINE_S)
            t0 = time.time()
            try:
                fn()
                log(f"{name}: OK total {time.time()-t0:.1f}s")
            except PhaseTimeout:
                log(f"{name}: DEADLINE EXCEEDED at {time.time()-t0:.1f}s "
                    f"(>{PHASE_DEADLINE_S}s)")
            except Exception as exc:
                log(f"{name}: FAILED {type(exc).__name__}: {str(exc)[:300]}")
            finally:
                signal.alarm(0)
        return run
    return deco


def main():
    signal.signal(signal.SIGALRM, _alarm)
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
    log(f"device {dev0}")

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
        lambda x: jax.device_put(x, dev0) if hasattr(x, "dtype") else x,
        exp.model,
    )
    jax.block_until_ready(jax.tree_util.tree_leaves(model)[0])
    log(f"device_put {time.time()-t0:.1f}s")

    rng = np.random.default_rng(0)
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import jitter_init

    c = 64
    th = jnp.asarray(
        jitter_init(np, exp.model, np.asarray(exp.model.prefit_vector()), c, rng)
    )
    th = jax.device_put(th, dev0)

    @phase("A fused diff-forward")
    def phase_a():
        f = jax.jit(lambda m, t: m.log_posterior_batch(t))
        t0 = time.time()
        out = f(model, th)
        jax.block_until_ready(out)
        log(f"  A compile+run {time.time()-t0:.1f}s")
        t0 = time.time()
        jax.block_until_ready(f(model, th))
        log(f"  A warm run {1e3*(time.time()-t0):.1f}ms; finite="
            f"{bool(jnp.all(jnp.isfinite(out)))}")

    @phase("B scan5(grad)")
    def phase_b():
        def run(m, t):
            def body(carry, _):
                g = jax.grad(lambda tt: jnp.sum(m.log_posterior_batch(tt)))(
                    t + carry * 0
                )
                return carry + jnp.sum(g).astype(jnp.float32) * 1e-30, None
            return jax.lax.scan(body, jnp.float32(0), None, length=5)[0]

        f = jax.jit(run)
        t0 = time.time()
        out = f(model, th)
        jax.block_until_ready(out)
        log(f"  B compile+run {time.time()-t0:.1f}s")
        t0 = time.time()
        jax.block_until_ready(f(model, th))
        log(f"  B warm 5 iters {1e3*(time.time()-t0):.1f}ms")

    def hmc_probe(tag, static_bound, maxlf=8, chunk=5):
        from mach3_tpu.fitters.hmc import HMC, HMCConfig

        hl = HMC(
            model,
            HMCConfig(
                step_size=0.02, adapt_steps=60, adapt_trajectory=True,
                max_leapfrog=maxlf, chunk_size=chunk,
                chees_static_bound=static_bound,
            ),
            np.asarray(th),
            seed=8,
        )
        log(f"  {tag} init done (logp0 compiled)")
        t0 = time.time()
        hl.run(n_steps=chunk)
        log(f"  {tag} first chunk (compile+run) {time.time()-t0:.1f}s")
        t0 = time.time()
        hl.run(n_steps=2 * chunk)
        dt = time.time() - t0
        log(f"  {tag} warm 2 chunks {dt:.2f}s -> {1e3*dt/(2*chunk):.1f} ms/step; "
            f"acc={float(hl.acceptance_rate.mean()):.3f}")

    @phase("C HMC chunk STATIC bound")
    def phase_c():
        hmc_probe("C", static_bound=True)

    @phase("D HMC chunk DYNAMIC bound")
    def phase_d():
        hmc_probe("D", static_bound=False)

    phase_a()
    phase_b()
    phase_c()
    phase_d()
    log("probe done")


if __name__ == "__main__":
    main()
