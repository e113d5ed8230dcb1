"""Chain persistence: save/load round-trip, combine enforcement, resume
(reference: ``CombineMaCh3Chains.cpp``, ``StartFromPreviousFit``)."""
import numpy as np
import pytest

from mach3_tpu.core.exceptions import MaCh3Error
from mach3_tpu.diagnostics.chain_io import (
    combine_chains,
    load_chain,
    load_checkpoint,
    save_chain,
    save_checkpoint,
)


def _draws(seed=0, s=50):
    rng = np.random.default_rng(seed)
    return {
        "theta": rng.normal(size=(s, 4, 3)),
        "nll": rng.normal(size=(s, 4)),
    }


def test_round_trip(tmp_path):
    p = str(tmp_path / "chain.npz")
    d = _draws()
    save_chain(p, d, names=["a", "b", "c"], config_yaml="General: {NSteps: 10}")
    loaded, meta, state = load_chain(p)
    assert np.allclose(loaded["theta"], d["theta"])
    assert meta["names"] == ["a", "b", "c"]
    assert "NSteps" in meta["config"]
    assert state == {}


def test_combine_concatenates(tmp_path):
    p1, p2, out = (str(tmp_path / f) for f in ["c1.npz", "c2.npz", "out.npz"])
    save_chain(p1, _draws(1), ["a", "b", "c"], "cfg")
    save_chain(p2, _draws(2), ["a", "b", "c"], "cfg")
    combine_chains([p1, p2], out)
    merged, meta, _ = load_chain(out)
    assert merged["theta"].shape[0] == 100
    assert meta["combined_from"] == [p1, p2]


def test_combine_refuses_config_mismatch(tmp_path):
    p1, p2 = str(tmp_path / "c1.npz"), str(tmp_path / "c2.npz")
    save_chain(p1, _draws(1), ["a", "b", "c"], "cfg_A")
    save_chain(p2, _draws(2), ["a", "b", "c"], "cfg_B")
    with pytest.raises(MaCh3Error, match="Config mismatch"):
        combine_chains([p1, p2], str(tmp_path / "out.npz"))


def test_combine_refuses_name_mismatch(tmp_path):
    p1, p2 = str(tmp_path / "c1.npz"), str(tmp_path / "c2.npz")
    save_chain(p1, _draws(1), ["a", "b", "c"], "cfg")
    save_chain(p2, _draws(2), ["a", "b", "X"], "cfg")
    with pytest.raises(MaCh3Error, match="name mismatch"):
        combine_chains([p1, p2], str(tmp_path / "out.npz"))


def test_checkpoint_resume_exact(tmp_path):
    """A checkpointed fit resumed must produce the identical continuation."""
    from mach3_tpu.fitters import FitModel, MCMCConfig, MR2T2
    from mach3_tpu.params.parameterset import ParameterSet

    ps = ParameterSet.from_config(
        {
            "Systematics": [
                {
                    "Systematic": {
                        "Names": {"FancyName": "a"},
                        "ParameterValues": {"PreFitValue": 0.0},
                        "StepScale": {"MCMC": 1.0},
                        "Error": 1.0,
                        "ParameterBounds": [-10, 10],
                        "Type": "Norm",
                    }
                }
            ]
        }
    )
    model = FitModel.build([ps], [])
    init = np.zeros((4, 1))

    # Continuous run
    f_ref = MR2T2(model, MCMCConfig(chunk_size=50), init, seed=42)
    out_ref = f_ref.run(n_steps=100)

    # Interrupted + resumed run
    f_a = MR2T2(model, MCMCConfig(chunk_size=50), init, seed=42)
    f_a.run(n_steps=50)
    ckpt = str(tmp_path / "ckpt.npz")
    save_checkpoint(ckpt, f_a, ["a"])

    f_b = MR2T2(model, MCMCConfig(chunk_size=50), init, seed=0)  # different seed
    load_checkpoint(ckpt, f_b)
    out_b = f_b.run(n_steps=50)

    assert np.allclose(out_ref["theta"][50:], out_b["theta"])
    assert int(f_b.state.step) == 100


def test_checkpoint_resume_exact_adaptive(tmp_path):
    """The generic (tree-path) checkpoint restores adaptive moments exactly."""
    from mach3_tpu.fitters import FitModel, MCMCConfig, MR2T2
    from mach3_tpu.params.parameterset import ParameterSet

    ps = ParameterSet.from_config(
        {
            "Systematics": [
                {
                    "Systematic": {
                        "Names": {"FancyName": "a"},
                        "ParameterValues": {"PreFitValue": 0.0},
                        "StepScale": {"MCMC": 1.0},
                        "Error": 1.0,
                        "ParameterBounds": [-10, 10],
                        "Type": "Norm",
                    }
                }
            ]
        }
    )
    model = FitModel.build([ps], [])
    init = np.zeros((4, 1))
    cfg = MCMCConfig(
        chunk_size=25, adaptive=True, adaption_start_update=5,
        adaption_start_throw=20, adaption_update_step=10,
    )
    f_ref = MR2T2(model, cfg, init, seed=42)
    out_ref = f_ref.run(n_steps=100)

    f_a = MR2T2(model, cfg, init, seed=42)
    f_a.run(n_steps=50)
    ckpt = str(tmp_path / "ckpt.npz")
    save_checkpoint(ckpt, f_a, ["a"])
    f_b = MR2T2(model, cfg, init, seed=0)
    load_checkpoint(ckpt, f_b)
    out_b = f_b.run(n_steps=50)
    assert np.allclose(out_ref["theta"][50:], out_b["theta"])
    assert np.allclose(
        np.asarray(f_ref.state.adaptive.cov), np.asarray(f_b.state.adaptive.cov)
    )


def test_checkpoint_resume_hmc(tmp_path):
    """HMC (incl. ChEES trajectory state) checkpoints and resumes exactly —
    the generic state-pytree checkpoint covers every sampler."""
    from mach3_tpu.fitters import FitModel
    from mach3_tpu.fitters.hmc import HMC, HMCConfig
    from mach3_tpu.params.parameterset import ParameterSet

    ps = ParameterSet.from_config(
        {
            "Systematics": [
                {
                    "Systematic": {
                        "Names": {"FancyName": "a"},
                        "ParameterValues": {"PreFitValue": 0.0},
                        "StepScale": {"MCMC": 1.0},
                        "Error": 1.0,
                        "ParameterBounds": [-10, 10],
                        "Type": "Norm",
                    }
                }
            ]
        }
    )
    model = FitModel.build([ps], [])
    init = np.zeros((4, 1))
    cfg = HMCConfig(
        step_size=0.3, chunk_size=25, adapt_steps=40,
        adapt_trajectory=True, max_leapfrog=16,
    )
    f_ref = HMC(model, cfg, init, seed=42)
    out_ref = f_ref.run(n_steps=100)

    f_a = HMC(model, cfg, init, seed=42)
    f_a.run(n_steps=50)
    ckpt = str(tmp_path / "hmc_ckpt.npz")
    save_checkpoint(ckpt, f_a, ["a"])
    f_b = HMC(model, cfg, init, seed=0)
    load_checkpoint(ckpt, f_b)
    out_b = f_b.run(n_steps=50)
    assert np.allclose(out_ref["theta"][50:], out_b["theta"])
    assert np.allclose(
        float(np.asarray(f_ref.state.log_traj)), float(np.asarray(f_b.state.log_traj))
    )


def test_shard_writer_streams_bounded(tmp_path):
    """ChainShardWriter (r3 verdict #6): chunks land on disk one at a time,
    the manifest resolves to the full chain, and the writer's resident
    footprint is one chunk — not the whole run."""
    from mach3_tpu.diagnostics.chain_io import ChainShardWriter, iter_chain_shards

    p = str(tmp_path / "chain.npz")
    w = ChainShardWriter(p, names=["a", "b", "c"], config_yaml="x: 1")
    chunks = [_draws(seed=i, s=40) for i in range(5)]
    for c in chunks:
        w.append(c)
    w.finalize()
    assert len(w.parts) == 5 and w.n_steps == 200

    # Bounded memory: at most one chunk resident; the disk holds all five.
    one_chunk = sum(v.nbytes for v in chunks[0].values())
    assert w.max_resident_bytes <= one_chunk
    assert w.disk_bytes > 0

    draws, meta, _ = load_chain(p)  # manifest resolves transparently
    assert draws["theta"].shape == (200, 4, 3)
    full = np.concatenate([c["theta"] for c in chunks], axis=0)
    assert np.array_equal(draws["theta"], full)
    assert meta["n_steps"] == 200

    # Streaming read: one chunk at a time.
    seen = list(iter_chain_shards(p))
    assert len(seen) == 5
    assert np.array_equal(seen[2]["nll"], chunks[2]["nll"])

    # combine accepts sharded inputs (load_chain resolves them).
    p2 = str(tmp_path / "combined.npz")
    combine_chains([p, p], p2)
    d2, _, _ = load_chain(p2)
    assert d2["theta"].shape == (400, 4, 3)


def test_shard_writer_resume_continues_numbering(tmp_path):
    from mach3_tpu.diagnostics.chain_io import ChainShardWriter

    p = str(tmp_path / "chain.npz")
    w = ChainShardWriter(p, names=["a"])
    w.append({"theta": np.zeros((10, 2, 1))})
    w.finalize()
    w2 = ChainShardWriter(p, names=["a"])  # resumed run
    assert w2.parts == ["part-00000.npz"] and w2.n_steps == 10
    w2.append({"theta": np.ones((7, 2, 1))})
    w2.finalize()
    draws, meta, _ = load_chain(p)
    assert draws["theta"].shape == (17, 2, 1)
    assert meta["n_steps"] == 17


def test_run_collect_false_streams_to_callback():
    """fitter.run(collect=False) holds nothing: callback sees every chunk,
    the return is empty, the state still advances."""
    import jax.numpy as jnp

    from mach3_tpu.fitters.mcmc import MR2T2, MCMCConfig
    from mach3_tpu.fitters.model import FitModel
    from mach3_tpu.params.parameterset import ParameterSet

    ps = ParameterSet.from_config(
        {"Systematics": [{"Systematic": {
            "Names": {"FancyName": "a"},
            "ParameterValues": {"PreFitValue": 0.0},
            "StepScale": {"MCMC": 1.0}, "Error": 1.0,
            "ParameterBounds": [-50, 50], "Type": "Norm"}}]},
        name="g",
    )
    model = FitModel.build([ps], [])
    f = MR2T2(model, MCMCConfig(n_steps=100, chunk_size=25), np.zeros((4, 1)))
    got = []
    out = f.run(callback=lambda done, state, chunk: got.append(chunk), collect=False)
    assert out == {}
    assert len(got) == 4 and all(c["theta"].shape == (25, 4, 1) for c in got)
    assert int(f.state.step) == 100
