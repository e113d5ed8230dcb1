import os, time, json
if os.environ.get("JAX_PLATFORMS") and "cpu" not in os.environ["JAX_PLATFORMS"]:
    os.environ["JAX_PLATFORMS"] = os.environ["JAX_PLATFORMS"] + ",cpu"
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/mach3_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import jax.numpy as jnp
import numpy as np
from mach3_tpu.tutorial.toy import build_toy

C = 256
toy = build_toy(n_events=100_000, seed=42, e_grid_size=200, use_pallas=True)
model = toy.model
theta0 = np.asarray(model.prefit_vector())
thetas = jnp.asarray(np.tile(theta0, (C, 1)) + 1e-3*np.random.default_rng(0).normal(size=(C, len(theta0))))

def scan_time(name, fn, *args, iters=30):
    def body(carry, _):
        out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        return carry + jnp.sum(leaf).astype(jnp.float32) * 0, None
    g = jax.jit(lambda: jax.lax.scan(body, jnp.float32(0), None, length=iters)[0])
    g(); jax.block_until_ready(g())
    t0 = time.perf_counter(); jax.block_until_ready(g()); dt = time.perf_counter() - t0
    print(json.dumps({"component": name, "ms": round(1e3*dt/iters, 3)}), flush=True)

keys = jax.random.split(jax.random.key(0), C)
scan_time("propose", jax.vmap(model.propose), thetas, keys)
scan_time("prior_nll", jax.vmap(model.prior_nll), thetas)
scan_time("total_nll (full)", model.total_nll_batch, thetas)
for i, s in enumerate(model.samples):
    scan_time(f"osc_grids[{i}]", jax.vmap(s.osc_prob_grids), thetas)
    scan_time(f"reweight[{i}]", s.reweight_batch, thetas)
