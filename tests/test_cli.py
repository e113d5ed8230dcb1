"""CLI end-to-end: mcmc -> process -> diag -> rhat -> llhscan -> predictive -> plot.

Exercises the console entry points in-process (argv injection) on a tiny toy,
mirroring the reference's executable workflow
(``MCMCTutorial`` -> ``ProcessMCMC`` -> ``DiagMCMC`` -> ``RHat`` -> plotting).
"""
import os

import numpy as np
import pytest

from mach3_tpu.cli import combine as cli_combine
from mach3_tpu.cli import diag as cli_diag
from mach3_tpu.cli import llhscan as cli_llhscan
from mach3_tpu.cli import mcmc as cli_mcmc
from mach3_tpu.cli import plot as cli_plot
from mach3_tpu.cli import predictive as cli_predictive
from mach3_tpu.cli import process as cli_process
from mach3_tpu.cli import rhat as cli_rhat


@pytest.fixture(scope="module")
def chain_file(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    out = str(d / "chain.npz")
    rc = cli_mcmc.main(
        [
            "General:MCMC:NSteps:300",
            "General:MCMC:NChains:8",
            "General:MCMC:AutoSave:100",
            "Toy:NEvents:1500",
            "-o",
            out,
        ]
    )
    assert rc == 0
    assert os.path.exists(out)
    assert os.path.exists(out + ".ckpt")
    return out


def test_process(chain_file, capsys):
    rc = cli_process.main([chain_file, "--output", chain_file + ".proc.npz"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "osc_sin2th23" in out
    with np.load(chain_file + ".proc.npz", allow_pickle=False) as f:
        assert f["summary"].shape[0] == 16
        assert f["covariance"].shape == (16, 16)


def test_diag(chain_file, capsys):
    rc = cli_diag.main([chain_file, "--output", chain_file + ".diag.npz"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "split-Rhat" in out
    with np.load(chain_file + ".diag.npz", allow_pickle=False) as f:
        assert "ess" in f.files and "autocorrelation" in f.files


def test_rhat_needs_two_chains(chain_file, capsys):
    rc = cli_rhat.main([chain_file])
    assert rc == 0  # the file itself has 8 chains
    assert "CONVERGED" in capsys.readouterr().out


def test_combine_same_file_rejected_then_forced(chain_file, tmp_path, capsys):
    out = str(tmp_path / "merged.npz")
    rc = cli_combine.main([chain_file, chain_file, "-o", out])
    assert rc == 0  # identical config/version -> allowed
    from mach3_tpu.diagnostics.chain_io import load_chain

    draws, _, _ = load_chain(out)
    assert draws["theta"].shape[0] == 600


def test_resume_from_checkpoint(chain_file, tmp_path):
    out2 = str(tmp_path / "chain2.npz")
    rc = cli_mcmc.main(
        [
            "General:MCMC:NSteps:50",
            "General:MCMC:NChains:8",
            "Toy:NEvents:1500",
            "--checkpoint",
            chain_file + ".ckpt",
            "-o",
            out2,
        ]
    )
    assert rc == 0


def test_llhscan(tmp_path, capsys):
    out = str(tmp_path / "scan.npz")
    rc = cli_llhscan.main(["Toy:NEvents:1000", "--points", "11", "-o", out])
    assert rc == 0
    assert "curvature ok" in capsys.readouterr().out
    with np.load(out, allow_pickle=False) as f:
        assert f["scan1d_total"].shape == (16, 11)


def test_predictive(chain_file, tmp_path, capsys):
    out = str(tmp_path / "pred.npz")
    rc = cli_predictive.main(
        [chain_file, "--toys", "40", "--n-events", "1500", "-o", out]
    )
    assert rc == 0
    assert "p-value" in capsys.readouterr().out
    with np.load(out, allow_pickle=False) as f:
        assert 0.0 <= float(f["p_value"]) <= 1.0


def test_plot(chain_file, tmp_path):
    outdir = str(tmp_path / "plots")
    rc = cli_plot.main(
        [chain_file, "-o", outdir, "--triangle", "osc_sin2th23", "osc_delta_cp"]
    )
    assert rc == 0
    for f in ["posteriors_1d.png", "violins.png", "correlation.png", "triangle.png"]:
        assert os.path.exists(os.path.join(outdir, f)), f


def test_plot_multichain_comparison(chain_file, tmp_path):
    """Multi-chain posterior-comparison overlay (ProcessMCMC multi-chain mode)."""
    outdir = str(tmp_path / "plots_cmp")
    rc = cli_plot.main([chain_file, chain_file, "-o", outdir])
    assert rc == 0
    assert os.path.exists(os.path.join(outdir, "posterior_comparison.png"))


def test_mcmc_parallel_tempering_saves_cold_chains_only(tmp_path):
    """PT through the CLI: the chain file must hold only the beta=1 walkers
    (hot levels are mixing machinery, not posterior draws)."""
    from mach3_tpu.diagnostics.chain_io import load_chain

    out = str(tmp_path / "pt_chain.npz")
    rc = cli_mcmc.main(
        [
            "General:FittingAlgorithm:PTMCMC",
            "General:MCMC:NSteps:60",
            "General:MCMC:NChains:4",
            "General:MCMC:AutoSave:30",
            "General:PT:NTemps:3",
            "Toy:NEvents:1000",
            "-o",
            out,
        ]
    )
    assert rc == 0
    draws, meta, _ = load_chain(out)
    assert draws["theta"].shape[1] == 4  # walkers, not 3*4 level-major chains


def test_autosave_kill_resume(tmp_path):
    """Mid-run autosave + crash resume (the reference's TTree AutoSave +
    StartFromPreviousFit, ``Fitters/MCMCBase.cpp:119-121,149-173``): SIGKILL a
    fit between autosaves, resume from the checkpoint, and the full chain must
    be BIT-IDENTICAL to an uninterrupted run with the same seed."""
    import subprocess
    import sys
    import time

    from mach3_tpu.diagnostics.chain_io import load_chain

    argv_base = [
        "General:MCMC:NChains:6",
        "General:MCMC:AutoSave:40",
        "Toy:NEvents:800",
        "--platform",
        "cpu",
        "--seed",
        "5",
    ]
    out_b = str(tmp_path / "b.npz")
    cmd = (
        [sys.executable, "-m", "mach3_tpu.cli.mcmc", "General:MCMC:NSteps:100000"]
        + argv_base
        + ["-o", out_b]
    )
    proc = subprocess.Popen(
        cmd, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL
    )
    t0 = time.time()
    try:
        while time.time() - t0 < 600:
            if os.path.exists(out_b + ".ckpt"):
                break
            assert proc.poll() is None, "fit exited before any autosave"
            time.sleep(0.2)
    finally:
        proc.kill()  # SIGKILL the exact PID we started
        proc.wait()
    assert os.path.exists(out_b + ".ckpt"), "no autosave within the window"
    draws_partial, _, _ = load_chain(out_b)
    s_done = draws_partial["theta"].shape[0]
    assert s_done >= 40 and s_done % 40 == 0

    total = s_done + 80
    argv = [f"General:MCMC:NSteps:{total}"] + argv_base
    # resume the killed fit to completion
    rc = cli_mcmc.main(argv + ["-o", out_b, "--checkpoint", out_b + ".ckpt"])
    assert rc == 0
    # uninterrupted reference run, same seed
    out_a = str(tmp_path / "a.npz")
    rc = cli_mcmc.main(argv + ["-o", out_a])
    assert rc == 0

    a, _, _ = load_chain(out_a)
    b, _, _ = load_chain(out_b)
    assert b["theta"].shape == a["theta"].shape == (total, 6, 16)
    np.testing.assert_array_equal(a["theta"], b["theta"])
    np.testing.assert_array_equal(a["nll"], b["nll"])


def test_cli_mcmc_streaming_mode(tmp_path):
    """--stream on: per-chunk shards, manifest chain file that downstream
    tools read transparently, bounded resident footprint (r3 verdict #6 —
    the reference's TTree streaming role, FitterBase.cpp:153-205)."""
    from mach3_tpu.diagnostics.chain_io import load_chain

    out = str(tmp_path / "stream.npz")
    rc = cli_mcmc.main(
        [
            "General:MCMC:NSteps:200",
            "General:MCMC:NChains:4",
            "General:MCMC:AutoSave:50",
            "Toy:NEvents:800",
            "--stream", "on",
            "-o", out,
        ]
    )
    assert rc == 0
    shard_dir = out + ".d"
    assert os.path.isdir(shard_dir)
    parts = sorted(p for p in os.listdir(shard_dir) if p.startswith("part-"))
    assert len(parts) == 4  # 200 steps / chunk 50
    draws, meta, _ = load_chain(out)
    assert draws["theta"].shape[0] == 200
    assert meta["n_steps"] == 200
    # Downstream CLI reads the sharded chain like any other.
    rc = cli_process.main([out, "--output", out + ".proc.npz"])
    assert rc == 0


def test_cli_mcmc_streaming_auto_threshold(tmp_path):
    """--stream auto engages streaming when the estimated chain exceeds
    General.MCMC.StreamThresholdMB."""
    out = str(tmp_path / "auto.npz")
    rc = cli_mcmc.main(
        [
            "General:MCMC:NSteps:120",
            "General:MCMC:NChains:4",
            "General:MCMC:AutoSave:60",
            "General:MCMC:StreamThresholdMB:0.01",
            "Toy:NEvents:800",
            "-o", out,
        ]
    )
    assert rc == 0
    assert os.path.isdir(out + ".d")  # auto mode chose streaming
