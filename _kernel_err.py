import os
if os.environ.get("JAX_PLATFORMS") and "cpu" not in os.environ["JAX_PLATFORMS"]:
    os.environ["JAX_PLATFORMS"] = os.environ["JAX_PLATFORMS"] + ",cpu"
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/mach3_jax_cache")
import jax.numpy as jnp
import numpy as np
from mach3_tpu.splines import pallas_reweight as pr
C, E, P, K, B = 16, 57344, 4, 5, 49
rng = np.random.default_rng(0)
selector = jnp.asarray(rng.random((C, P, K*4)), jnp.float32)
coeffs = jnp.asarray(rng.random((P, K*4, E)), jnp.float32)
base_w = jnp.asarray(rng.random((C, E)), jnp.float32)
bins = jnp.asarray(rng.integers(0, B+1, (C, E)), jnp.int32)
for et, ct, r in [(4096, 8, 16), (2048, 8, 16), (2048, 16, 16), (1024, 16, 16)]:
    try:
        out = pr.fused_reweight_histogram(selector, coeffs, base_w, bins, n_bins=B,
                                          chain_tile=ct, event_tile=et, radix=r)
        jax.block_until_ready(out)
        print(f"OK et={et} ct={ct} r={r}", flush=True)
    except Exception as e:
        print(f"FAIL et={et} ct={ct} r={r}: {str(e)[:150]}", flush=True)
