"""REAL multi-process distributed test (VERDICT r1 item 6).

Spawns 2 ``jax.distributed`` CPU processes (coordinator + worker), each with
2 virtual devices (4 global). Both run the SAME jitted sharded MCMC over a
global 4-device chain mesh; each host extracts its addressable chain shard
and writes it with ``save_host_shard``; the parent merges the shards with
``merge_host_shards`` (version/config/host-coverage enforcement) and computes
cross-chain R-hat over the merged chains — the reference's offline
independent-jobs + CombineMaCh3Chains + RHat pipeline
(``Diagnostics/CombineMaCh3Chains.cpp``, ``Diagnostics/RHat.cpp:46-60``)
exercised as one first-class multi-host run.
"""
import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

_WORKER = textwrap.dedent(
    """
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=2"
    )
    import jax
    # The axon TPU plugin ignores JAX_PLATFORMS; only the config call sticks.
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import numpy as np

    proc_id = int(sys.argv[1])
    coord = sys.argv[2]
    out_pattern = sys.argv[3]

    from mach3_tpu.distributed import multihost

    multihost.initialise(
        coordinator_address=coord, num_processes=2, process_id=proc_id
    )
    assert jax.process_count() == 2
    assert jax.device_count() == 4

    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from mach3_tpu.fitters import ChainState, MCMCConfig, make_step_fn
    from mach3_tpu.tutorial.toy import build_toy

    toy = build_toy(n_events=400, seed=11, e_grid_size=24)
    model = toy.model
    n_chains, n_steps = 8, 40
    config = MCMCConfig()
    step_fn = make_step_fn(model, config)

    mesh = Mesh(np.array(jax.devices()), ("chains",))
    sh = NamedSharding(mesh, P("chains"))
    rep = NamedSharding(mesh, P())

    rng = np.random.default_rng(0)  # same on both processes
    theta_np = np.tile(np.asarray(model.prefit_vector()), (n_chains, 1))
    theta_np = theta_np + 1e-3 * rng.normal(size=theta_np.shape)

    def mk(arr, sharding):
        arr = np.asarray(arr)
        return jax.make_array_from_callback(
            arr.shape, sharding, lambda idx: arr[idx]
        )

    theta0 = mk(theta_np, sh)
    with mesh:
        nll0 = jax.jit(model.total_nll_batch, out_shardings=sh)(theta0)
    state = ChainState(
        theta=theta0,
        nll=nll0,
        key=mk(np.asarray(jax.random.key_data(jax.random.key(5))), rep),
        step=mk(np.asarray(0, np.int32), rep),
        n_accepted=mk(np.zeros((n_chains,), np.int32), sh),
    )
    # jax.random.key_data round-trip: rebuild the typed key inside jit
    def run(state):
        key = jax.random.wrap_key_data(state.key)
        state = state.replace(key=key)
        def body(s, _):
            s2, out = step_fn(s)
            return s2, out
        final, outs = jax.lax.scan(body, state, None, length=n_steps)
        return final, outs

    with mesh:
        final, outs = jax.jit(run)(state)
    jax.block_until_ready(final.theta)

    # Host-local chain shard: gather addressable shards in chain order.
    def local_block(garr):
        shards = sorted(garr.addressable_shards, key=lambda s: s.index[1].start or 0)
        return np.concatenate([np.asarray(s.data) for s in shards], axis=1)

    draws = {
        "theta": local_block(outs["theta"]),
        "nll": local_block(outs["nll"]),
    }
    sl = multihost.local_chain_slice(n_chains)
    assert draws["theta"].shape == (n_steps, n_chains // 2, model.n_params), (
        draws["theta"].shape
    )
    path = multihost.save_host_shard(
        out_pattern, draws, toy.names, config_yaml="toy: distributed-test"
    )
    print("WROTE", path, flush=True)
    """
)


def test_two_process_sharded_fit_and_merge(tmp_path):
    # free port for the coordinator
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    coord = f"localhost:{port}"

    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    pattern = str(tmp_path / "shard_{host}.npz")

    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["JAX_ENABLE_X64"] = "1"
    # The worker script lives in tmp_path; make the repo importable regardless
    # of whether mach3_tpu is installed.
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), coord, pattern],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, f"worker failed:\nstdout:{out}\nstderr:{err[-3000:]}"
        assert "WROTE" in out

    from mach3_tpu.distributed.multihost import merge_host_shards
    from mach3_tpu.diagnostics.chain_io import load_chain
    from mach3_tpu.diagnostics.rhat import rhat

    shards = [pattern.format(host=i) for i in range(2)]
    merged = str(tmp_path / "merged.npz")
    merge_host_shards(shards, merged)
    draws, meta, _ = load_chain(merged)
    assert draws["theta"].shape[1] == 8  # all chains back together
    assert meta["merged_hosts"] == 2
    # both shards agree on the deterministic global RNG path: chains differ
    d0, _, _ = load_chain(shards[0])
    d1, _, _ = load_chain(shards[1])
    assert not np.allclose(d0["theta"], d1["theta"])
    # cross-chain convergence statistic over the merged file
    import jax.numpy as jnp

    r = np.asarray(rhat(jnp.asarray(draws["theta"])))  # [S, C, P]
    assert np.all(np.isfinite(r)) and np.all(r > 0.8)

    # merge refuses incomplete coverage
    from mach3_tpu.core.exceptions import MaCh3Error

    with pytest.raises(MaCh3Error):
        merge_host_shards([shards[0]], str(tmp_path / "bad.npz"))
