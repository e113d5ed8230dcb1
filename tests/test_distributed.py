"""Distributed sharding on the virtual 8-device CPU mesh: step correctness
under chain + event sharding, multihost shard merging."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mach3_tpu.distributed import (
    chain_state_sharding,
    make_mesh,
    shard_fit_model,
)
from mach3_tpu.fitters import ChainState, MCMCConfig, MR2T2, make_step_fn
from mach3_tpu.tutorial.toy import build_toy


@pytest.fixture(scope="module")
def toy():
    return build_toy(n_events=512, seed=3, e_grid_size=32)


def test_mesh_construction():
    mesh = make_mesh(4, 2)
    assert mesh.shape == {"chains": 4, "events": 2}
    with pytest.raises(ValueError):
        make_mesh(3, 3)


def test_sharded_step_matches_unsharded(toy):
    """One MCMC step under (chains, events) sharding must equal the
    single-device result bit-for-bit (same RNG path)."""
    config = MCMCConfig()
    step_fn = make_step_fn(toy.model, config)
    n_chains = 8
    theta0 = jnp.tile(toy.model.prefit_vector()[None, :], (n_chains, 1))
    nll0 = jax.vmap(toy.model.total_nll)(theta0)
    state = ChainState(
        theta=theta0,
        nll=nll0,
        key=jax.random.key(7),
        step=jnp.asarray(0, jnp.int32),
        n_accepted=jnp.zeros((n_chains,), jnp.int32),
    )
    ref, _ = jax.jit(step_fn)(state)

    mesh = make_mesh(4, 2)
    model_sh = shard_fit_model(mesh, toy.model)
    step_sh = make_step_fn(model_sh, config)
    with mesh:
        state_sh = chain_state_sharding(mesh, state)
        out, _ = jax.jit(step_sh)(state_sh)
    assert np.allclose(np.asarray(ref.theta), np.asarray(out.theta), rtol=1e-12)
    assert np.allclose(np.asarray(ref.nll), np.asarray(out.nll), rtol=1e-9)


def test_sharded_chain_run_statistics(toy):
    """A short sharded adaptive run produces finite, moving chains."""
    mesh = make_mesh(8, 1)
    model_sh = shard_fit_model(mesh, toy.model)
    init = np.tile(np.asarray(toy.model.prefit_vector()), (16, 1))
    with mesh:
        fitter = MR2T2(
            model_sh,
            MCMCConfig(chunk_size=50, adaptive=True, adaption_start_update=5,
                       adaption_start_throw=20, adaption_update_step=10),
            init,
            seed=1,
        )
        fitter.state = chain_state_sharding(mesh, fitter.state)
        out = fitter.run(n_steps=100)
    assert np.all(np.isfinite(out["nll"]))
    assert out["accepted"].mean() > 0.0


def test_merge_host_shards(tmp_path):
    from mach3_tpu.diagnostics.chain_io import load_chain, save_chain
    from mach3_tpu.distributed.multihost import merge_host_shards
    from mach3_tpu.core.exceptions import MaCh3Error

    rng = np.random.default_rng(0)
    paths = []
    for host in range(3):
        p = str(tmp_path / f"shard{host}.npz")
        save_chain(
            p,
            {"theta": rng.normal(size=(40, 2, 3))},
            ["a", "b", "c"],
            "cfg",
            extra_meta={"host": host, "n_hosts": 3},
        )
        paths.append(p)
    out = str(tmp_path / "merged.npz")
    merge_host_shards(paths, out)
    draws, meta, _ = load_chain(out)
    assert draws["theta"].shape == (40, 6, 3)
    assert meta["merged_hosts"] == 3

    with pytest.raises(MaCh3Error, match="Incomplete"):
        merge_host_shards(paths[:2], str(tmp_path / "bad.npz"))
