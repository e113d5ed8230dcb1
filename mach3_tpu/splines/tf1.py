"""TF1 (functional polynomial) systematic responses.

TPU-native equivalent of the reference's ``TF1_red``
(``Splines/SplineStructs.h:148-214``: a reduced linear response
``w = intercept + slope * v`` per (event, parameter), evaluated inside the
spline monolith by a dedicated CUDA kernel ``EvalOnGPU_TF1``,
``Splines/gpuSplineUtils.cu:386-408``).

Here the ragged (event, param) TF1 list becomes two dense ``[Pt, E]`` arrays
(slope 0 / intercept 1 for unmatched events) so the whole evaluation is one
broadcast FMA and a product over the (small) TF1-parameter axis — no gathers,
fully fused by XLA into the surrounding weight product.
"""
from __future__ import annotations

import dataclasses
from typing import Sequence

import jax.numpy as jnp
import numpy as np
from flax import struct

from ..core.logging import get_logger
from ..core.precision import FTYPE, ITYPE

_log = get_logger("splines")


@dataclasses.dataclass
class TF1ParamSpec:
    """Host-side description of one TF1 systematic before flattening.

    ``event_ids[i]`` gets response ``intercept[i] + slope[i] * v`` where ``v``
    is the proposed value of parameter ``param_index``. Events absent from
    ``event_ids`` have unit response.
    """

    name: str
    param_index: int  # index into the proposed-parameter vector
    event_ids: np.ndarray  # [S_p]
    slope: np.ndarray  # [S_p]  (the reference's Par[0])
    intercept: np.ndarray  # [S_p]  (the reference's Par[1])


@struct.dataclass
class TF1Table:
    """Dense per-parameter linear-response table ``[Pt, E]``."""

    slope: jnp.ndarray  # [Pt, E] f32, 0 for unmatched events
    intercept: jnp.ndarray  # [Pt, E] f32, 1 for unmatched events
    param_index: jnp.ndarray  # [Pt] i32 into the proposal vector

    @property
    def n_tf1_params(self) -> int:
        return self.slope.shape[0]

    @property
    def n_events(self) -> int:
        return self.slope.shape[1]

    def eval(self, params: jnp.ndarray) -> jnp.ndarray:
        """Per-event product of TF1 responses: params [NP] -> [E].

        Responses are floored at 0 — a negative event weight is unphysical
        (the reference's total-weight kernel multiplies raw responses; its
        negative-weight events are rejected downstream at histogramming)."""
        v = params[self.param_index].astype(FTYPE)  # [Pt] (static indices)
        resp = self.intercept + self.slope * v[:, None]  # [Pt, E]
        return jnp.prod(jnp.maximum(resp, 0.0), axis=0)


def build_tf1_table(specs: Sequence[TF1ParamSpec], n_events: int) -> TF1Table:
    pt = len(specs)
    slope = np.zeros((pt, n_events), np.float32)
    intercept = np.ones((pt, n_events), np.float32)
    for p, spec in enumerate(specs):
        ev = np.asarray(spec.event_ids, np.int64)
        slope[p, ev] = np.asarray(spec.slope, np.float32)
        intercept[p, ev] = np.asarray(spec.intercept, np.float32)
    n_matched = sum(len(s.event_ids) for s in specs)
    _log.info(
        "TF1 table: %d params x %d events (%d matched responses, %.1f MB)",
        pt, n_events, n_matched, (slope.nbytes + intercept.nbytes) / 1e6,
    )
    return TF1Table(
        slope=jnp.asarray(slope, FTYPE),
        intercept=jnp.asarray(intercept, FTYPE),
        param_index=jnp.asarray([s.param_index for s in specs], ITYPE),
    )
