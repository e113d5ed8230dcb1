"""mach3-process — posterior processing of a chain file.

CLI equivalent of ``Diagnostics/ProcessMCMC.cpp``: 1D summaries (arithmetic /
Gaussian / HPD), credible intervals, posterior covariance/correlation, text +
npz outputs (plots via mach3_tpu.plotting).
"""
from __future__ import annotations

import argparse
import sys

import numpy as np


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("chain", help="Chain .npz file")
    parser.add_argument("--burn-in", type=float, default=0.2)
    parser.add_argument("--thin", type=int, default=1)
    parser.add_argument("--output", "-o", default=None, help="npz output of summaries")
    parser.add_argument("--credible", type=float, nargs="*", default=[0.6827, 0.9545])
    from .common import add_common_args, setup_platform

    add_common_args(parser)
    args = parser.parse_args(argv)
    setup_platform(args)

    from ..diagnostics.chain_io import load_chain
    from ..diagnostics.processor import ChainProcessor

    draws, meta, _ = load_chain(args.chain)
    proc = ChainProcessor(
        draws["theta"], names=meta["names"], burn_in=args.burn_in, thin=args.thin
    )
    print(f"{'parameter':<28} {'mean':>10} {'std':>9} {'HPD mode':>10} {'-err':>8} {'+err':>8}")
    rows = []
    for i in range(proc.n_params):
        s = proc.summary(i)
        print(
            f"{s.name:<28} {s.arithmetic_mean:>10.5g} {s.arithmetic_std:>9.3g} "
            f"{s.hpd_mode:>10.5g} {s.hpd_err_low:>8.3g} {s.hpd_err_high:>8.3g}"
        )
        rows.append(
            [s.arithmetic_mean, s.arithmetic_std, s.gaussian_mean, s.gaussian_std,
             s.hpd_mode, s.hpd_err_low, s.hpd_err_high, s.median]
        )
    intervals = {
        f"ci_{int(m*1e4)}": np.array(
            [proc.credible_interval(i, mass=m) for i in range(proc.n_params)]
        )
        for m in args.credible
    }
    if args.output:
        np.savez(
            args.output,
            summary=np.asarray(rows),
            names=np.asarray(proc.names),
            covariance=proc.covariance(),
            correlation=proc.correlation(),
            **intervals,
        )
        print(f"wrote {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
