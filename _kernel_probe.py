import os, time, json
if os.environ.get("JAX_PLATFORMS") and "cpu" not in os.environ["JAX_PLATFORMS"]:
    os.environ["JAX_PLATFORMS"] = os.environ["JAX_PLATFORMS"] + ",cpu"
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/mach3_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import jax.numpy as jnp
import numpy as np
from mach3_tpu.splines import pallas_reweight as pr

C, E, P, K, B = 256, 57344, 4, 5, 49
rng = np.random.default_rng(0)
selector = jnp.asarray(rng.random((C, P, K*4)), jnp.float32)
coeffs = jnp.asarray(rng.random((P, K*4, E)), jnp.float32)
base_w = jnp.asarray(rng.random((C, E)), jnp.float32)
bins = jnp.asarray(rng.integers(0, B+1, (C, E)), jnp.int32)

def t(name, fn, iters=20):
    try:
        def body(c, _):
            mc, w2 = fn()
            return c + jnp.sum(mc[0]) * 0, None
        g = jax.jit(lambda: jax.lax.scan(body, jnp.float32(0), None, length=iters)[0])
        g(); jax.block_until_ready(g())
        t0 = time.perf_counter(); jax.block_until_ready(g()); dt = time.perf_counter()-t0
        print(json.dumps({"variant": name, "ms": round(1e3*dt/iters, 3)}), flush=True)
    except Exception as e:
        print(json.dumps({"variant": name, "error": str(e)[:120]}), flush=True)

for ct, et in [(32, 2048), (16, 2048), (64, 2048), (32, 4096), (64, 4096)]:
    t(f"maskreduce ct{ct} et{et}", lambda ct=ct, et=et: pr.fused_reweight_histogram(
        selector, coeffs, base_w, bins, n_bins=B, chain_tile=ct, event_tile=et, hist="maskreduce"))
