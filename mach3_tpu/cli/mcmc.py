"""mach3-mcmc — run an MCMC fit from YAML configs.

CLI equivalent of the reference's experiment executables
(``README.md:244-263`` pattern: ``MCMCTutorial config.yaml [overrides]``).
Accepts the same override styles as ``MaCh3ManagerFactory``:
``General:MCMC:NSteps:50000`` and ``--override extra.yaml``.

Currently wires the in-repo tutorial toy experiment (an experiment-plugin
registry is the extension point for real experiments).
"""
from __future__ import annotations

import argparse
import sys

import numpy as np


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("configs", nargs="*", help="YAML config files and Key:Sub:Value overrides")
    parser.add_argument("--output", "-o", default="chain.npz")
    parser.add_argument("--checkpoint", default=None, help="Resume from this checkpoint file")
    parser.add_argument(
        "--experiment",
        default="toy",
        help="Experiment to fit: 'toy' (built-in), or any config passed in "
        "`configs` containing an Experiment: tree (config-driven experiments)",
    )
    parser.add_argument(
        "--profile",
        default=None,
        metavar="DIR",
        help="Capture a jax.profiler trace of one chunk into DIR (xprof-compatible)",
    )
    parser.add_argument(
        "--stream",
        choices=["auto", "on", "off"],
        default="auto",
        help="Stream chunks to per-chunk npz shards instead of holding the "
        "whole chain in RAM (the reference's TTree AutoSave role). 'auto' "
        "streams when the estimated chain exceeds "
        "General.MCMC.StreamThresholdMB (default 512).",
    )
    from .common import add_common_args, setup_platform

    add_common_args(parser)
    args = parser.parse_args(argv)
    setup_platform(args)

    import os

    from ..core.logging import get_logger
    from ..diagnostics.chain_io import (
        load_chain,
        load_checkpoint,
        save_chain,
        save_checkpoint,
    )
    from ..fitters.factory import make_fitter, manager_from_args
    from ..tutorial.toy import build_toy

    log = get_logger("cli.mcmc")
    cfg = manager_from_args(args.configs)

    if cfg.has("Experiment"):
        from ..samples.experiment import build_experiment

        exp = build_experiment(cfg)
        model, param_sets = exp.model, exp.param_sets
        names = [n for ps in param_sets for n in ps.names]
    elif args.experiment == "toy":
        toy = build_toy(
            n_events=int(cfg.get("Toy.NEvents", 20000)),
            seed=int(cfg.get("Toy.Seed", 1234)),
        )
        model, param_sets, names = toy.model, [toy.xsec, toy.osc], toy.names
    else:
        log.error(
            "Unknown experiment '%s' ('toy' is built-in; config-driven "
            "experiments need an Experiment: tree in the YAML)",
            args.experiment,
        )
        return 2
    fitter = make_fitter(cfg, model, seed=args.seed)
    n_steps = int(cfg.get("General.MCMC.NSteps", 1000))

    # Streaming decision: estimated full-chain bytes vs threshold. At the
    # north-star scale (100k steps x 1000 chains x 101 params f64 ~ 80 GB)
    # the hold-in-RAM design cannot produce the chain at all (r3 verdict
    # #6); streaming holds only one chunk.
    n_chains = int(np.asarray(fitter.state.theta).shape[0])
    est_bytes = n_steps * n_chains * (model.n_params + 3) * 8
    thresh_mb = float(cfg.get("General.MCMC.StreamThresholdMB", 512))
    streaming = args.stream == "on" or (
        args.stream == "auto" and est_bytes > thresh_mb * 1024 * 1024
    )
    if streaming:
        log.info(
            "Streaming chain storage (%s: est. %.2f GB, threshold %.0f MB) "
            "— per-chunk shards in %s.d",
            "forced" if args.stream == "on" else "auto",
            est_bytes / 1e9, thresh_mb, args.output,
        )

    prefix_draws = None
    if args.checkpoint:
        load_checkpoint(args.checkpoint, fitter)
        # Resume semantics match the reference (StartFromPreviousFit +
        # stepStart, Fitters/MCMCBase.cpp:149-173): run only the REMAINING
        # steps, and carry forward the draws already in the output file so
        # the final chain is the full history. A streaming resume carries
        # them forward on DISK: the shard writer continues the part
        # numbering of the existing shard directory.
        done_steps = int(np.asarray(fitter.state.step))
        n_steps = max(0, n_steps - done_steps)
        log.info("Resumed at step %d; %d steps remaining", done_steps, n_steps)
        if os.path.exists(args.output) and not streaming:
            prev_draws, prev_meta, _ = load_chain(args.output)
            if prev_meta.get("names") == names:
                # Crash consistency: a SIGKILL can land after a chunk's chain
                # write but before its checkpoint write, leaving the chain
                # one chunk AHEAD of the resumed state. Truncate to the
                # checkpoint's step so the resumed history has no overlap.
                prefix_draws = {k: v[:done_steps] for k, v in prev_draws.items()}

    prefit = np.concatenate([np.asarray(ps.prefit) for ps in param_sets])
    prefit_err = np.concatenate([np.asarray(ps.errors) for ps in param_sets])
    extra_meta: dict = {"prefit": prefit.tolist(), "prefit_err": prefit_err.tolist()}

    def write_out(draws: dict, state) -> None:
        """Atomic chain + checkpoint write (the reference's TTree AutoSave,
        ``Fitters/MCMCBase.cpp:119-121``). ``state``: the snapshot matching
        ``draws`` — required (no default) because the double-buffered run
        loop keeps ``fitter.state`` one chunk ahead of the drained draws; a
        caller that omitted it would silently checkpoint a state ahead of
        the saved chain and break resume consistency."""
        if hasattr(fitter, "cold_chain"):
            draws = fitter.cold_chain(draws)
        if prefix_draws is not None:
            draws = {
                k: np.concatenate([prefix_draws[k], v], axis=0)
                if k in prefix_draws
                else v
                for k, v in draws.items()
            }
        save_chain(
            args.output, draws, names, config_yaml=cfg.to_yaml(),
            extra_meta=extra_meta,
        )
        save_checkpoint(
            args.output + ".ckpt", fitter, names, cfg.to_yaml(),
            state_pytree=state,
        )

    auto_save = int(cfg.get("General.MCMC.AutoSave", 500)) > 0
    collected: list[dict] = []
    writer = None
    if streaming:
        from ..diagnostics.chain_io import ChainShardWriter, save_checkpoint

        writer = ChainShardWriter(
            args.output, names, config_yaml=cfg.to_yaml(), extra_meta=extra_meta
        )
        if args.checkpoint and writer.parts:
            # Crash consistency (see the non-streaming truncation above).
            writer.truncate(int(np.asarray(fitter.state.step)))
        if (
            not writer.parts
            and os.path.exists(args.output)
            and args.checkpoint
        ):
            # Resume of a chain written in hold-in-RAM mode: seed the shard
            # directory with the previous draws so the history is kept.
            prev_draws, prev_meta, _ = load_chain(args.output)
            if prev_meta.get("names") == names and prev_draws:
                writer.append(prev_draws)

    def progress(done, state, chunk):
        try:
            acc = float(np.asarray(state.n_accepted).mean()) / max(int(state.step), 1)
            rhat = fitter.online_rhat(chunk)
            log.info(
                "step %d/%d  acc %.3f  nll %.2f  max-Rhat(chunk) %.3f  %.1f ms/step",
                done,
                n_steps,
                acc,
                float(chunk["nll"][-1].mean()),
                float(np.nanmax(rhat)),
                1e3 * float(chunk.get("step_time", [0.0])[0]),
            )
        except AttributeError:  # fitters whose state lacks MR2T2's telemetry
            log.info("step %d/%d", done, n_steps)
        if streaming:
            if hasattr(fitter, "cold_chain"):
                chunk = fitter.cold_chain(chunk)
            writer.append(chunk)
            if auto_save:
                writer.finalize()  # manifest tracks every appended shard
                save_checkpoint(
                    args.output + ".ckpt", fitter, names, cfg.to_yaml(),
                    state_pytree=state,
                )
            return
        collected.append(chunk)
        if auto_save and done < n_steps:  # the final write happens below
            write_out(
                {
                    k: np.concatenate([c[k] for c in collected], axis=0)
                    for k in collected[0]
                },
                state=state,
            )

    if args.profile:
        import jax

        fitter.run(n_steps=min(50, n_steps))  # compile outside the trace
        with jax.profiler.trace(args.profile):
            fitter.run(n_steps=min(50, n_steps))
        log.info("profiler trace written to %s", args.profile)

    if n_steps <= 0:  # resume of an already-complete fit: nothing to run
        log.info("Chain already complete; nothing to do")
        return 0
    out = fitter.run(n_steps=n_steps, callback=progress, collect=not streaming)
    if streaming:
        from ..diagnostics.chain_io import save_checkpoint

        if hasattr(fitter, "cold_chain") and getattr(fitter.config, "beta_zero", False):
            log.warning(
                "log-evidence needs the full multi-level chain; streaming "
                "mode stores the cold level only — rerun with --stream off "
                "or compute evidence online in chunks"
            )
        writer.finalize()
        save_checkpoint(
            args.output + ".ckpt", fitter, names, cfg.to_yaml(),
            state_pytree=fitter.state,
        )
        log.info(
            "Wrote %s (+.ckpt): %d shards, %.2f MB on disk, max %.2f MB "
            "resident", args.output, len(writer.parts),
            writer.disk_bytes / 1e6, writer.max_resident_bytes / 1e6,
        )
        return 0
    if hasattr(fitter, "cold_chain") and getattr(fitter.config, "beta_zero", False):
        # Parallel tempering: a beta_zero ladder yields the marginal
        # likelihood for free (diagnostics/evidence.py) — record it before
        # write_out drops the hot levels from the chain file.
        logz = fitter.log_evidence(out)
        extra_meta["log_evidence"] = logz
        log.info("log evidence (stepping-stone, normalised prior): %.4f", logz)
    write_out(out, state=fitter.state)
    log.info("Wrote %s (+.ckpt)", args.output)
    return 0


if __name__ == "__main__":
    sys.exit(main())
