"""Calibrate the scan-time floor and the f64-emulation costs seen in
profile_large.py (everything 'tiny' measured ~2.5-4 ms)."""
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
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from bench import scan_time  # noqa: E402


def main() -> None:
    out = {}
    C, P, E, B = 128, 101, 200_000, 2182
    rng = np.random.default_rng(0)
    th = jnp.asarray(rng.normal(size=(C, P)))          # f64
    th32 = th.astype(jnp.float32)
    ev32 = jnp.asarray(rng.random((C, E)), jnp.float32)
    data = jnp.asarray(rng.random(B) * 100)
    mc64 = jnp.asarray(rng.random((C, B)) * 100 + 1)
    w264 = mc64 * 0.1
    mc32, w232 = mc64.astype(jnp.float32), w264.astype(jnp.float32)
    inv = jnp.asarray(np.eye(P) + 0.01)

    def t(name, fn, *arrs, iters=20):
        ms = 1e3 * scan_time(jax, jnp, fn, None, *arrs, iters=iters)
        out[name] = round(ms, 4)
        print(f"# {name}: {ms:.4f} ms", file=sys.stderr)

    # floor: near-noop
    t("noop_f32_CP", lambda m, x: x * 1.0000001, th32)
    t("noop_f64_CP", lambda m, x: x * 1.0000001, th)
    # elementwise [C, E] f32 pass
    t("ew_CE_f32", lambda m, x: x * 1.5 + 1.0, ev32)
    t("ew_CE_f32_x3", lambda m, x: (x * 1.5 + 1.0) * jnp.exp(-x) + x * x, ev32)
    # f64 quadratic form (prior analogue)
    t("quad_f64", lambda m, x: jnp.einsum("ci,ij,cj->c", x, inv, x), th)
    t("quad_f32", lambda m, x: jnp.einsum("ci,ij,cj->c", x, inv.astype(jnp.float32), x), th32)
    # Barlow-Beeston-like test stat f64 vs f32
    from mach3_tpu.samples.teststats import get_test_stat_fn, TestStatistic
    stat = get_test_stat_fn(TestStatistic.BARLOW_BEESTON)
    t("bb_f64", lambda m, x: jnp.sum(stat(data[None, :], x, w264), axis=1), mc64)
    t("bb_f32", lambda m, x: jnp.sum(
        stat(data[None, :].astype(jnp.float32), x, w232), axis=1), mc32)
    # gather [C, E] from a [NC*NE] table (osc gather analogue)
    tab = jnp.asarray(rng.random((12 * 160,)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, 12 * 160, E), jnp.int32)
    t("gather_CE", lambda m, x: jnp.take(x, idx, axis=0)[None, :] * ev32, tab)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
