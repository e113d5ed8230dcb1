"""PMNS matrix and oscillation Hamiltonian construction.

TPU-native replacement for the external NuOscillator engines the reference
bridges to (``Samples/OscillationHandler.cpp``; engines CUDAProb3, NuFastLinear,
Prob3++, ... per ``README.md:119-135``). Everything is differentiable jnp,
batched over energy (and zenith) grids.

Conventions: PDG parameterisation; Δm² in eV², E in GeV, L in km, ρ in g/cm³.

We evolve with ``exp(-i H L)`` where ``H = (2·OSC_PHASE / E) · M²`` and

    M² = U · diag(0, Δm21², Δm31²) · U†  ±  diag(A, 0, 0)        [eV²]
    A  = MATTER_A · Ye · ρ · E                                   [eV²]

so eigenvalue differences give the familiar ``sin²(1.267 Δm² L / E)``.
Antineutrinos: U → U*, A → −A.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core.precision import ATYPE

#: Kinematic phase factor: Δm²[eV²]·L[km]/(4E[GeV]) in natural units,
#: = 1/(4·ħc) with ħc = 197.3269804 MeV·fm (CODATA 2018). The widely-copied
#: 1.26693281 traces to an older ħc; the 1e-7 relative difference is a
#: ~1e-5 rad phase error on full-Earth baselines.
OSC_PHASE = 1.266932679419849

#: A = 2·√2·G_F·N_e·E in eV² per (Ye · ρ[g/cm³] · E[GeV]), at full precision
#: from G_F/(ħc)³ = 1.1663787e-5 GeV⁻², ħc = 197.3269804 MeV·fm,
#: N_A = 6.02214076e23 (the Prob3++-lineage 1.52649e-4 is this, rounded;
#: the rounding alone is a ~3e-6 probability error on full-Earth paths).
MATTER_A = 1.5264932435736812e-4


def pmns_matrix(theta12, theta13, theta23, delta_cp) -> jnp.ndarray:
    """Complex 3x3 PMNS matrix U (PDG convention), complex128."""
    s12, c12 = jnp.sin(jnp.asarray(theta12, ATYPE)), jnp.cos(jnp.asarray(theta12, ATYPE))
    s13, c13 = jnp.sin(jnp.asarray(theta13, ATYPE)), jnp.cos(jnp.asarray(theta13, ATYPE))
    s23, c23 = jnp.sin(jnp.asarray(theta23, ATYPE)), jnp.cos(jnp.asarray(theta23, ATYPE))
    eid = jnp.exp(1j * jnp.asarray(delta_cp, ATYPE))
    emid = jnp.exp(-1j * jnp.asarray(delta_cp, ATYPE))
    return jnp.array(
        [
            [c12 * c13, s12 * c13, s13 * emid],
            [-s12 * c23 - c12 * s23 * s13 * eid, c12 * c23 - s12 * s23 * s13 * eid, s23 * c13],
            [s12 * s23 - c12 * c23 * s13 * eid, -c12 * s23 - s12 * c23 * s13 * eid, c23 * c13],
        ]
    )


def mass_matrix(
    u: jnp.ndarray,
    dm21_sq,
    dm31_sq,
    energy: jnp.ndarray,
    rho: jnp.ndarray | float = 0.0,
    ye: float = 0.5,
    antineutrino: bool = False,
) -> jnp.ndarray:
    """Flavour-basis M²(E) [eV²]: [..., 3, 3] complex, batched over energy/rho.

    energy: any shape [...]; rho broadcasts against it.
    """
    energy = jnp.asarray(energy, ATYPE)
    rho = jnp.broadcast_to(jnp.asarray(rho, ATYPE), energy.shape)
    if antineutrino:
        u = jnp.conj(u)
    m2 = jnp.stack(
        [
            jnp.zeros(()),
            jnp.asarray(dm21_sq, ATYPE),
            jnp.asarray(dm31_sq, ATYPE),
        ]
    ).astype(u.dtype)
    vac = jnp.einsum("ij,j,kj->ik", u, m2, jnp.conj(u))  # [3, 3]
    sign = -1.0 if antineutrino else 1.0
    a = sign * MATTER_A * ye * rho * energy  # [...] eV²
    out = jnp.broadcast_to(vac, energy.shape + (3, 3)).astype(u.dtype)
    return out.at[..., 0, 0].add(a.astype(u.dtype))


def hamiltonian_per_km(m_sq: jnp.ndarray, energy: jnp.ndarray) -> jnp.ndarray:
    """H [per km] from M² [eV²]: exp(-i H L[km]) is the evolution operator."""
    energy = jnp.asarray(energy, ATYPE)
    scale = (2.0 * OSC_PHASE) / energy
    return m_sq * scale[..., None, None].astype(m_sq.dtype)


# --------------------------------------------------------------------------
# Real-arithmetic (re, im) pair variants — the production TPU path.
# The TPU backend supports no complex128; these express the same math on real
# arrays only (see ``osc/kernels.py``).
# --------------------------------------------------------------------------
def pmns_matrix_real(theta12, theta13, theta23, delta_cp, dtype=ATYPE):
    """PMNS matrix as an (re, im) pair of real [3, 3] arrays."""
    t12 = jnp.asarray(theta12, dtype)
    t13 = jnp.asarray(theta13, dtype)
    t23 = jnp.asarray(theta23, dtype)
    dcp = jnp.asarray(delta_cp, dtype)
    s12, c12 = jnp.sin(t12), jnp.cos(t12)
    s13, c13 = jnp.sin(t13), jnp.cos(t13)
    s23, c23 = jnp.sin(t23), jnp.cos(t23)
    cd, sd = jnp.cos(dcp), jnp.sin(dcp)
    zero = jnp.zeros_like(cd)
    ur = jnp.stack(
        [
            jnp.stack([c12 * c13, s12 * c13, s13 * cd]),
            jnp.stack(
                [-s12 * c23 - c12 * s23 * s13 * cd, c12 * c23 - s12 * s23 * s13 * cd, s23 * c13]
            ),
            jnp.stack(
                [s12 * s23 - c12 * c23 * s13 * cd, -c12 * s23 - s12 * c23 * s13 * cd, c23 * c13]
            ),
        ]
    )
    ui = jnp.stack(
        [
            jnp.stack([zero, zero, -s13 * sd]),
            jnp.stack([-c12 * s23 * s13 * sd, -s12 * s23 * s13 * sd, zero]),
            jnp.stack([-c12 * c23 * s13 * sd, -s12 * c23 * s13 * sd, zero]),
        ]
    )
    return ur, ui


def hamiltonian_real(
    ur: jnp.ndarray,
    ui: jnp.ndarray,
    dm21_sq,
    dm31_sq,
    energy: jnp.ndarray,
    rho: jnp.ndarray | float = 0.0,
    ye: float = 0.5,
    antineutrino: bool = False,
):
    """(hr, hi) per-km Hamiltonian batch [..., 3, 3], real pair form.

    Combines ``mass_matrix`` + ``hamiltonian_per_km``: vacuum term
    U diag(0, Δ21, Δ31) U† (with U -> U* for antineutrinos), matter potential
    ±A in the ee entry, all scaled by 2·OSC_PHASE/E.
    """
    dtype = ur.dtype
    energy = jnp.asarray(energy, dtype)
    rho = jnp.broadcast_to(jnp.asarray(rho, dtype), energy.shape)
    if antineutrino:
        ui = -ui
    m2 = jnp.stack(
        [jnp.zeros((), dtype), jnp.asarray(dm21_sq, dtype), jnp.asarray(dm31_sq, dtype)]
    )
    # vac = U diag(m2) U^dagger ; with D real: re = Ur D Ur^T + Ui D Ui^T,
    # im = Ui D Ur^T - Ur D Ui^T.
    urd = ur * m2[None, :]
    uid = ui * m2[None, :]
    vac_r = urd @ ur.T + uid @ ui.T
    vac_i = uid @ ur.T - urd @ ui.T

    sign = -1.0 if antineutrino else 1.0
    a = sign * MATTER_A * ye * rho * energy  # [...] eV²
    hr = jnp.broadcast_to(vac_r, energy.shape + (3, 3))
    hr = hr.at[..., 0, 0].add(a)
    hi = jnp.broadcast_to(vac_i, energy.shape + (3, 3))
    scale = ((2.0 * OSC_PHASE) / energy)[..., None, None]
    return hr * scale, hi * scale
