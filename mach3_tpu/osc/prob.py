"""3-flavour oscillation probabilities: vacuum, constant-density, layered matter.

Replaces the reference's NuOscillator bridge (``Samples/OscillationHandler.cpp``,
engines per ``README.md:119-135``: NuFastLinear for beam, CUDAProb3 for
atmospherics, Prob3++, ...). Instead of external C++/CUDA engines, probabilities
are computed directly as batched, differentiable jnp:

* Closed-form Cardano eigenvalues of the 3x3 Hermitian Hamiltonian plus
  Frobenius-covariant projectors — pure elementwise VPU math in REAL arithmetic
  (the TPU backend has no complex128; see ``osc/kernels.py``), no iterative
  ``eigh``, fully vmappable over (chain, energy[, zenith]) axes and
  differentiable for HMC/NUTS.
* Evolution operator ``exp(-i H L) = Σ_a exp(-i λ_a L) P_a``.
* Layered matter (atmospheric/PREM): ordered product of per-layer evolution
  operators via ``lax.scan`` over a static layer axis.

Flavour index order is (e, mu, tau); probabilities are returned as
``P[..., alpha, beta] = P(nu_alpha -> nu_beta)``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from ..core.precision import ATYPE
from .kernels import (
    c_abs2,
    c_matmul,
    evolution_from_eigensystem,
    herm_eigensystem,
    herm_evolution,
)
from .pmns import hamiltonian_per_km, hamiltonian_real, mass_matrix, pmns_matrix, pmns_matrix_real


@struct.dataclass
class OscParams:
    """The six standard 3-flavour parameters (radians, eV²).

    Matches the reference's oscillation-parameter block handed to NuOscillator
    (``Samples/SampleHandlerFD.cpp:1047-1122``); names follow PDG.
    """

    theta12: jnp.ndarray
    theta13: jnp.ndarray
    theta23: jnp.ndarray
    delta_cp: jnp.ndarray
    dm21_sq: jnp.ndarray
    dm31_sq: jnp.ndarray

    @classmethod
    def from_array(cls, arr: jnp.ndarray) -> "OscParams":
        """From a length-6 slice of the proposal vector in the conventional
        MaCh3 order (sin²θ12, sin²θ13, sin²θ23, δCP, Δm²21, Δm²31)."""
        return cls(
            theta12=jnp.arcsin(jnp.sqrt(arr[0])),
            theta13=jnp.arcsin(jnp.sqrt(arr[1])),
            theta23=jnp.arcsin(jnp.sqrt(arr[2])),
            delta_cp=arr[3],
            dm21_sq=arr[4],
            dm31_sq=arr[5],
        )


def evolution_operator(h: jnp.ndarray, length) -> jnp.ndarray:
    """Complex-input wrapper around the real-pair evolution kernel (used by
    tests to cross-check against ``jnp.linalg.eigh``; CPU-only convenience)."""
    out_r, out_i = herm_evolution(jnp.real(h), jnp.imag(h), length)
    return out_r + 1j * out_i


def probabilities_const_density(
    params: OscParams,
    energy: jnp.ndarray,
    length,
    rho=0.0,
    ye: float = 0.5,
    antineutrino: bool = False,
    dtype=ATYPE,
    phase_dtype=ATYPE,
) -> jnp.ndarray:
    """P[..., alpha, beta] over an energy batch for one baseline and constant
    density (the beam case; NuFastLinear equivalent). rho=0 gives vacuum.

    phase_dtype: dtype of the eigenvalue/phase scalars. f64 (default) is always
    safe; f32 is exact to ~1e-7 rad at beam baselines (λL ~ a few rad) and
    avoids TPU f64-emulation cost — do NOT use f32 for atmospheric-scale
    λL ~ 1e3 rad, where f32 phases visibly err."""
    # Build the Hamiltonian in full precision; the 3x3 matrix work runs in
    # ``dtype`` while eigenvalues + phases use ``phase_dtype``.
    ur, ui = pmns_matrix_real(
        params.theta12, params.theta13, params.theta23, params.delta_cp, dtype=ATYPE
    )
    hr64, hi64 = hamiltonian_real(
        ur,
        ui,
        params.dm21_sq,
        params.dm31_sq,
        jnp.asarray(energy, ATYPE),
        rho=rho,
        ye=ye,
        antineutrino=antineutrino,
    )
    amp = herm_evolution(
        hr64.astype(dtype),
        hi64.astype(dtype),
        jnp.asarray(length, dtype),
        phase_dtype=phase_dtype,
        h_phase=(hr64, hi64),
    )
    # amp[..., beta, alpha] = <beta| U |alpha>  ->  P[..., alpha, beta]
    p = c_abs2(amp)
    return jnp.swapaxes(p, -1, -2)


def _evolve_layers(eig: dict, ll_b: jnp.ndarray, ri_b: jnp.ndarray, ne: int, dtype):
    """Ordered product of per-layer evolution operators.

    ll_b/ri_b: [..., NL] broadcast layer lengths / unique-density indices.
    Returns the (real, imag) amplitude pair of shape [..., NE, 3, 3].
    """
    n_layers = ll_b.shape[-1]
    batch_shape = ll_b.shape[:-1] + (ne,)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=dtype), batch_shape + (3, 3))
    amp = (eye, jnp.zeros_like(eye))

    def step(carry, layer):
        ll, ridx = layer  # [...], [...] i32
        eg = {k: v[ridx] for k, v in eig.items()}  # gather -> [..., NE, ...]
        op = evolution_from_eigensystem(eg, ll[..., None].astype(ATYPE))
        return c_matmul(op, carry), None

    if n_layers <= 16:
        # Static unroll: the whole layer chain is elementwise (+ tiny gathers),
        # so XLA fuses consecutive layers into few passes instead of
        # materialising the [*, NE, 3, 3] amplitude carry in HBM every scan
        # step — the scan form was HBM-bound (~3 GB/step at 64 chains x
        # 20 zenith x 50 E for the coarse 11-segment PREM path).
        for k in range(n_layers):
            amp, _ = step(amp, (ll_b[..., k], ri_b[..., k]))
    else:
        layers = (jnp.moveaxis(ll_b, -1, 0), jnp.moveaxis(ri_b, -1, 0))
        amp, _ = jax.lax.scan(step, amp, layers)
    return amp


def probabilities_layered(
    params: OscParams,
    energy: jnp.ndarray,  # [NE]
    layer_lengths: jnp.ndarray,  # [..., NL] km (0-padded)
    layer_rho: jnp.ndarray,  # [..., NL] g/cm^3
    ye: float = 0.5,
    antineutrino: bool = False,
    dtype=ATYPE,
    rho_unique: jnp.ndarray | None = None,  # [NR] unique densities
    rho_idx: jnp.ndarray | None = None,  # [..., NL] i32 into rho_unique
    z_groups: tuple | None = None,  # static ((z indices, n_layers), ...)
) -> jnp.ndarray:
    """P[..., NE, alpha, beta] through a layered medium (atmospheric/PREM case;
    CUDAProb3 equivalent). Leading axes of layer_lengths/rho (e.g. zenith bins)
    broadcast against the energy axis.

    Layers are traversed in the given order; zero-length padding contributes
    the identity. The scan is over the (static) layer axis.

    The Hamiltonian and its (f64) eigensystem depend only on (energy,
    density): they are computed ONCE per unique density — PREM has ~10 shells,
    so this is ~NZ*NL/NR ≈ 30x fewer Cardano eigensolves than one per
    (zenith, layer) segment — and gathered per layer. Pass
    ``rho_unique``/``rho_idx`` precomputed (static config data); when omitted
    they are derived here, which requires ``layer_rho`` to be concrete (a
    closed-over constant, not a traced argument).

    z_groups: optional STATIC partition of the second-to-last axis (the zenith
    bins) as ``((zenith indices, n_layers), ...)``: each group's matmul chain
    is unrolled only to its own segment count, so the ~half of an up/down
    zenith grid that is down-going (one vacuum/air segment) stops paying the
    full NL-layer chain of padded identity products. Probabilities are
    reassembled in the original zenith order — the output is bit-identical in
    structure to the ungrouped call. ``build_atmo_osc_config`` precomputes
    this from the path geometry.
    """
    import numpy as np

    if rho_unique is None:
        # Must read the RAW argument before any jnp op touches it: under a
        # trace, jnp.asarray of a constant already returns a tracer.
        try:
            raw = np.asarray(layer_rho)
        except Exception as exc:  # traced layer densities
            raise ValueError(
                "probabilities_layered: layer_rho is traced; pass the static "
                "rho_unique/rho_idx (AtmoOscConfig precomputes them)"
            ) from exc
        uniq, inverse = np.unique(raw.ravel(), return_inverse=True)
        rho_unique = jnp.asarray(uniq, ATYPE)
        rho_idx = jnp.asarray(inverse.reshape(raw.shape).astype(np.int32))
    n_rho = rho_unique.shape[0]

    ur, ui = pmns_matrix_real(
        params.theta12, params.theta13, params.theta23, params.delta_cp, dtype=ATYPE
    )
    energy = jnp.asarray(energy, ATYPE)
    layer_lengths = jnp.asarray(layer_lengths, ATYPE)
    layer_rho = jnp.asarray(layer_rho, ATYPE)
    lead = jnp.broadcast_shapes(layer_lengths.shape[:-1], layer_rho.shape[:-1])
    n_layers = layer_lengths.shape[-1]
    ne = energy.shape[0]

    # Eigensystems per unique (density, energy) pair: [NR, NE, ...]
    hr64, hi64 = hamiltonian_real(
        ur,
        ui,
        params.dm21_sq,
        params.dm31_sq,
        jnp.broadcast_to(energy, (n_rho, ne)),
        rho=jnp.broadcast_to(rho_unique[:, None], (n_rho, ne)),
        ye=ye,
        antineutrino=antineutrino,
    )
    eig = herm_eigensystem(
        hr64.astype(dtype), hi64.astype(dtype), phase_dtype=ATYPE,
        h_phase=(hr64, hi64),
    )

    ll_b = jnp.broadcast_to(layer_lengths, lead + (n_layers,))
    ri_b = jnp.broadcast_to(rho_idx, lead + (n_layers,))
    if z_groups is None:
        amp = _evolve_layers(eig, ll_b, ri_b, ne, dtype)
    else:
        parts_r, parts_i, order = [], [], []
        for idxs, nl in z_groups:
            ia = jnp.asarray(idxs, jnp.int32)
            a = _evolve_layers(
                eig,
                jnp.take(ll_b, ia, axis=-2)[..., :nl],
                jnp.take(ri_b, ia, axis=-2)[..., :nl],
                ne,
                dtype,
            )
            parts_r.append(a[0])
            parts_i.append(a[1])
            order.extend(idxs)
        inv = jnp.asarray(np.argsort(np.asarray(order)), jnp.int32)
        amp = (
            jnp.take(jnp.concatenate(parts_r, axis=-4), inv, axis=-4),
            jnp.take(jnp.concatenate(parts_i, axis=-4), inv, axis=-4),
        )
    return jnp.swapaxes(c_abs2(amp), -1, -2)
