"""Shared CLI plumbing: platform selection, config loading, logging."""
from __future__ import annotations

import argparse


def add_common_args(parser: argparse.ArgumentParser) -> None:
    parser.add_argument(
        "--platform",
        default=None,
        help="JAX platform override (cpu / tpu / axon). Default: jax's choice.",
    )
    parser.add_argument(
        "--seed", type=int, default=0, help="Base RNG seed for reproducibility."
    )


def setup_platform(args: argparse.Namespace) -> None:
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
