"""Precision policy for the TPU-native MaCh3 rebuild.

The reference mixes single-precision event/spline weights with double-precision
likelihood accumulation (``Manager/Core.h:27-41``, ``Splines/SplineMonolith.h:56``:
``M3::float_t`` is float in low-memory builds while LLH sums are ``double``).

On TPU, f64 is software-emulated and slow, but the only places that need it are
*small* reductions whose results feed the Metropolis accept/reject decision:

* the per-bin test-statistic sum (~1e3-1e4 elements),
* the Gaussian prior quadratic form (~1e2-1e3 parameters).

Policy: the hot per-event / per-spline arrays are ``float32`` (explicitly typed);
the tiny accumulations are promoted to ``float64``. We therefore enable JAX x64
globally at import and are explicit about f32 in every large array.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# Hot-path dtype for event weights, spline coefficients, oscillation grids.
FTYPE = jnp.float32
# Accumulation dtype for likelihood sums and the proposal/prior linear algebra.
ATYPE = jnp.float64
# Index dtype for gathers (int32 keeps gather indices cheap on TPU).
ITYPE = jnp.int32

#: Sentinel log-likelihood for out-of-bounds proposals
#: (reference ``Manager/Core.h:80`` ``_LARGE_LOGL_ = 1234567890``).
LARGE_LOGL = 1234567890.0

#: Lower bound on MC bin content used by every test statistic
#: (reference ``Manager/Core.h:83`` ``_LOW_MC_BOUND_ = 1e-5``).
LOW_MC_BOUND = 1e-5


def enable_x64() -> None:
    """Enable float64 support (idempotent). Hot arrays stay f32 by explicit dtype."""
    jax.config.update("jax_enable_x64", True)


enable_x64()
