"""Atmospheric grid cost at 256 chains on TPU."""
import os, time, json
if os.environ.get("JAX_PLATFORMS") and "cpu" not in os.environ["JAX_PLATFORMS"]:
    os.environ["JAX_PLATFORMS"] = os.environ["JAX_PLATFORMS"] + ",cpu"
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/mach3_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import jax.numpy as jnp
import numpy as np
from mach3_tpu.osc.prob import OscParams, probabilities_layered
from mach3_tpu.osc.prem import path_through_earth

NZ, NE, C = 40, 100, 64
cosz = np.linspace(-1, 0.2, NZ)
lengths, rho, ye = path_through_earth(cosz, production_height_km=15.0)
e_grid = np.geomspace(0.3, 100.0, NE)
print("# layers:", lengths.shape, flush=True)
base = np.array([0.307, 0.022, 0.561, -1.601, 7.42e-5, 2.51e-3])
thetas = jnp.asarray(np.tile(base, (C, 1)) + 1e-4*np.random.default_rng(0).normal(size=(C, 6)))

E_G = jnp.asarray(e_grid)
LEN = jnp.asarray(lengths)
RHO_EFF = rho*(ye/0.5)
RHO = jnp.asarray(RHO_EFF)
ru, rinv = np.unique(RHO_EFF.ravel(), return_inverse=True)
RHO_U = jnp.asarray(ru)
RHO_I = jnp.asarray(rinv.reshape(RHO_EFF.shape).astype(np.int32))

def grids(th):
    p = OscParams.from_array(th)
    return probabilities_layered(p, E_G, LEN, RHO, dtype=jnp.float32,
                                 rho_unique=RHO_U, rho_idx=RHO_I)

def t(name, fn, iters=5):
    def body(c, _):
        out = fn()
        return c + jnp.sum(out[0]).astype(jnp.float32)*0, None
    g = jax.jit(lambda: jax.lax.scan(body, jnp.float32(0), None, length=iters)[0])
    g(); jax.block_until_ready(g())
    t0 = time.perf_counter(); jax.block_until_ready(g()); dt = time.perf_counter()-t0
    print(json.dumps({"probe": name, "ms": round(1e3*dt/iters, 2)}), flush=True)

t(f"atmo grids {C} chains {NZ}z x {NE}E", lambda: jax.vmap(grids)(thetas))

# Diagnostic: what if eigen/phase precision were f32 end-to-end? (not physical
# for atmospheric phases; isolates the f64-emulation share of the cost)
from mach3_tpu.osc import prob as _prob
from mach3_tpu.osc.kernels import herm_eigensystem, evolution_from_eigensystem, c_matmul, c_abs2
from mach3_tpu.osc.pmns import hamiltonian_real, pmns_matrix_real

def grids32(th):
    p = OscParams.from_array(th)
    ur, ui = pmns_matrix_real(p.theta12, p.theta13, p.theta23, p.delta_cp, dtype=jnp.float32)
    nr, ne = RHO_U.shape[0], E_G.shape[0]
    hr, hi = hamiltonian_real(ur, ui, p.dm21_sq.astype(jnp.float32), p.dm31_sq.astype(jnp.float32),
                              jnp.broadcast_to(E_G.astype(jnp.float32), (nr, ne)),
                              rho=jnp.broadcast_to(RHO_U.astype(jnp.float32)[:, None], (nr, ne)))
    eig = herm_eigensystem(hr, hi)
    def step(carry, layer):
        ll, ridx = layer
        eg = {k: v[ridx] for k, v in eig.items()}
        op = evolution_from_eigensystem(eg, ll[:, None].astype(jnp.float32))
        return c_matmul(op, carry), None
    eye = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (NZ, ne, 3, 3))
    layers = (jnp.moveaxis(LEN.astype(jnp.float32), -1, 0), jnp.moveaxis(RHO_I, -1, 0))
    amp, _ = jax.lax.scan(step, (eye, jnp.zeros_like(eye)), layers)
    return c_abs2(amp)

t(f"atmo grids f32-everything", lambda: jax.vmap(grids32)(thetas))
