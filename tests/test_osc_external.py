"""External validation of the oscillation engine (VERDICT r1 item 5).

The production engine (``mach3_tpu/osc``) replaces NuOscillator
(``/root/reference/README.md:119-135``) with a real-arithmetic Cardano
eigensystem. Every check in ``test_osc.py`` reuses pieces of that engine;
a matter-term sign or unit error could pass them all.

Here probabilities are pinned against a fully INDEPENDENT implementation
written in this file: complex128 numpy, PMNS matrix from the PDG
parameterisation, flavour-basis Hamiltonian evolved with
``scipy.linalg.expm`` (not an eigendecomposition), with every physical
constant derived from CODATA/PDG fundamental values inside the test:

* hbar*c = 197.3269804 MeV fm          (CODATA 2018)
* G_F / (hbar c)^3 = 1.1663787e-5 GeV^-2  (PDG)
* N_A = 6.02214076e23 mol^-1           (exact, SI 2019)

from which the vacuum phase factor Dm2[eV^2] L[km] / (4 E[GeV]) -> 1.26693...
and the matter potential A_CC = 2 sqrt2 G_F n_e E -> 1.52649e-4 eV^2 per
(g/cm^3 * Ye * GeV) are DERIVED, not copied from the production constants.

Benchmark points cover beam (T2K 295 km / rho 2.6, DUNE 1285 km / rho 2.85,
NOvA 810 km / rho 2.8) and atmospheric PREM up-going paths, nu and nubar,
normal and inverted ordering, both f64 and the production f32/mixed path.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.linalg

from mach3_tpu.osc.prob import (
    OscParams,
    probabilities_const_density,
    probabilities_layered,
)

# ----------------------------------------------------------------- constants
HBARC_MEV_FM = 197.3269804  # CODATA
GF = 1.1663787e-5  # GeV^-2 (PDG), in units of (hbar c)^3
N_A = 6.02214076e23  # mol^-1

# Vacuum phase: Dm2[eV^2] L[km] / (4 E[GeV]) in radians.
#   Dm2 L / (4E) = (Dm2 eV^2)(L km) / (4 E GeV) * 1e-18 GeV^2/eV^2
#                  * (1e18 fm/km) / (hbar c GeV fm)
# hbar c = 197.3269804 MeV fm = 0.1973269804 GeV fm
PHASE_FACTOR = 1e-18 * 1e18 / (4.0 * 0.1973269804)  # = 1.26693...

# Matter potential: V = sqrt2 GF n_e. In eV^2 units: a_CC = 2 sqrt2 GF n_e E.
#   n_e = Ye * rho[g/cm^3] * N_A / cm^3 ;  1 cm = 1e13 fm
#   V[GeV] = sqrt2 * GF[GeV^-2] * n_e[cm^-3] * (hbar c[GeV fm])^3 * 1e-39 fm^3/cm^3
#   a_CC[eV^2] = 2 E[GeV] * V[GeV] * 1e18
_V_PER_NE = np.sqrt(2.0) * GF * (0.1973269804**3) * 1e-39  # GeV per (1/cm^3)
MATTER_A_DERIVED = 2.0 * _V_PER_NE * N_A * 1e18  # eV^2 per (g/cm^3 * Ye * GeV)


def _pmns(s12sq, s13sq, s23sq, dcp):
    """PDG PMNS matrix, complex128."""
    s12, s13, s23 = np.sqrt([s12sq, s13sq, s23sq])
    c12, c13, c23 = np.sqrt([1 - s12sq, 1 - s13sq, 1 - s23sq])
    e = np.exp(-1j * dcp)
    return np.array(
        [
            [c12 * c13, s12 * c13, s13 * e],
            [-s12 * c23 - c12 * s23 * s13 / e, c12 * c23 - s12 * s23 * s13 / e, s23 * c13],
            [s12 * s23 - c12 * c23 * s13 / e, -c12 * s23 - s12 * c23 * s13 / e, c23 * c13],
        ],
        np.complex128,
    )


def reference_probability(
    pars, e_gev, segments, antineutrino=False, ye=0.5
):
    """P[alpha, beta] by expm evolution through (length_km, rho) segments.

    Completely independent of mach3_tpu.osc: complex128, scipy expm,
    constants derived above.
    """
    s12sq, s13sq, s23sq, dcp, dm21, dm31 = pars
    u = _pmns(s12sq, s13sq, s23sq, dcp)
    if antineutrino:
        u = u.conj()
    m = u @ np.diag([0.0, dm21, dm31]).astype(np.complex128) @ u.conj().T
    amp = np.eye(3, dtype=np.complex128)
    sign = -1.0 if antineutrino else 1.0
    for length_km, rho in segments:
        a_cc = sign * MATTER_A_DERIVED * ye * rho * e_gev
        h = m + np.diag([a_cc, 0.0, 0.0])
        # phase = H L / (2E) with the eV^2-km-GeV conversion folded in:
        # exp(-i H L/(2E)) = expm(-i * 2*PHASE_FACTOR/E * H * L / ... ) --
        # per segment: Dm2 L/(4E)*2 = Dm2 L/(2E) hence factor 2*PHASE_FACTOR.
        amp = scipy.linalg.expm(-1j * (2.0 * PHASE_FACTOR / e_gev) * h * length_km) @ amp
    # amp[beta, alpha] = <beta|U|alpha>
    p = np.abs(amp) ** 2
    return p.T  # [alpha, beta]


NUFIT_NO = [0.307, 0.0220, 0.561, -1.601, 7.42e-5, 2.51e-3]  # NuFIT-like NO
NUFIT_IO = [0.307, 0.0220, 0.563, -1.601, 7.42e-5, -2.43e-3]  # inverted

BEAMS = [
    ("T2K", 295.0, 2.6, [0.4, 0.6, 0.8, 1.2]),
    ("NOvA", 810.0, 2.8, [1.0, 1.6, 2.0, 3.0]),
    ("DUNE", 1285.0, 2.848, [0.8, 1.5, 2.5, 4.0]),
]


def test_derived_constants_match_production():
    """The production constants must equal the values derived here from
    CODATA/PDG fundamentals to 5 significant figures."""
    from mach3_tpu.osc.pmns import MATTER_A, OSC_PHASE

    assert abs(OSC_PHASE - PHASE_FACTOR) / PHASE_FACTOR < 1e-5
    assert abs(MATTER_A - MATTER_A_DERIVED) / MATTER_A_DERIVED < 1e-4


@pytest.mark.parametrize("pars", [NUFIT_NO, NUFIT_IO], ids=["NO", "IO"])
@pytest.mark.parametrize("anti", [False, True], ids=["nu", "nubar"])
def test_beam_matter_probabilities_f64(pars, anti):
    """All 9 channels at 3 beam configurations x 4 energies, f64 engine."""
    op = OscParams.from_array(jnp.asarray(pars))
    for name, length, rho, energies in BEAMS:
        e = jnp.asarray(energies)
        p = np.asarray(
            probabilities_const_density(
                op, e, length=length, rho=rho, antineutrino=anti,
                dtype=jnp.float64, phase_dtype=jnp.float64,
            )
        )
        for i, eg in enumerate(energies):
            ref = reference_probability(
                pars, eg, [(length, rho)], antineutrino=anti
            )
            np.testing.assert_allclose(
                p[i], ref, atol=1e-6,
                err_msg=f"{name} E={eg} anti={anti}",
            )


def test_beam_production_f32_path():
    """The production mixed-precision path (f32 matrices, f32 beam phases)
    stays within 1e-4 of the independent reference."""
    op = OscParams.from_array(jnp.asarray(NUFIT_NO))
    for name, length, rho, energies in BEAMS:
        e = jnp.asarray(energies)
        p = np.asarray(
            probabilities_const_density(
                op, e, length=length, rho=rho,
                dtype=jnp.float32, phase_dtype=jnp.float32,
            )
        )
        for i, eg in enumerate(energies):
            ref = reference_probability(NUFIT_NO, eg, [(length, rho)])
            np.testing.assert_allclose(
                p[i], ref, atol=1e-4, err_msg=f"{name} E={eg}"
            )


def test_msw_resonance_enhancement():
    """Matter enhances P(numu->nue) for neutrinos (NO) relative to vacuum at
    DUNE energies, and suppresses it for antineutrinos — the MSW sign that
    self-referential tests cannot pin."""
    pars = NUFIT_NO
    e = 2.5
    p_vac = reference_probability(pars, e, [(1285.0, 0.0)])
    p_mat = reference_probability(pars, e, [(1285.0, 2.848)])
    assert p_mat[1, 0] > p_vac[1, 0] * 1.1
    pb_vac = reference_probability(pars, e, [(1285.0, 0.0)], antineutrino=True)
    pb_mat = reference_probability(pars, e, [(1285.0, 2.848)], antineutrino=True)
    assert pb_mat[1, 0] < pb_vac[1, 0]
    # and the production engine agrees on both
    op = OscParams.from_array(jnp.asarray(pars))
    prod_mat = np.asarray(
        probabilities_const_density(
            op, jnp.asarray([e]), length=1285.0, rho=2.848,
            dtype=jnp.float64, phase_dtype=jnp.float64,
        )
    )[0]
    np.testing.assert_allclose(prod_mat[1, 0], p_mat[1, 0], atol=1e-6)


@pytest.mark.parametrize("anti", [False, True], ids=["nu", "nubar"])
def test_layered_prem_path(anti):
    """Up-going atmospheric path through a 5-layer PREM-like earth: the
    layered engine against sequential expm evolution, f64."""
    pars = NUFIT_NO
    # crude PREM: mantle in, outer core, inner core, outer core, mantle out
    segments = [
        (2700.0, 4.4), (2200.0, 11.0), (2400.0, 12.9), (2200.0, 11.0), (2700.0, 4.4),
    ]
    lengths = jnp.asarray([[s[0] for s in segments]])
    rhos = jnp.asarray([[s[1] for s in segments]])
    op = OscParams.from_array(jnp.asarray(pars))
    energies = [1.0, 3.0, 7.0, 20.0]
    p = np.asarray(
        probabilities_layered(
            op, jnp.asarray(energies), lengths, rhos,
            antineutrino=anti, dtype=jnp.float64,
        )
    )[0]
    for i, eg in enumerate(energies):
        ref = reference_probability(pars, eg, segments, antineutrino=anti)
        np.testing.assert_allclose(
            p[i], ref, atol=1e-6, err_msg=f"E={eg} anti={anti}"
        )


def test_layered_production_f32_path():
    """The production atmospheric path (f32 matrices, f64 phases via
    h_phase) against the independent reference at 1e-4."""
    pars = NUFIT_NO
    segments = [(3000.0, 3.9), (2900.0, 10.5), (2900.0, 10.5), (3000.0, 3.9)]
    lengths = jnp.asarray([[s[0] for s in segments]])
    rhos = jnp.asarray([[s[1] for s in segments]])
    op = OscParams.from_array(jnp.asarray(pars))
    energies = [2.0, 6.0, 15.0]
    p = np.asarray(
        probabilities_layered(
            op, jnp.asarray(energies), lengths, rhos, dtype=jnp.float32
        )
    )[0]
    for i, eg in enumerate(energies):
        ref = reference_probability(pars, eg, segments)
        np.testing.assert_allclose(p[i], ref, atol=1e-4, err_msg=f"E={eg}")


def test_t2k_appearance_magnitude():
    """Order-of-magnitude literature anchor: T2K nue appearance at the flux
    peak (0.6 GeV) is ~6-7% for delta_CP near -pi/2, NO (e.g. PDG Review of
    Particle Physics, neutrino mixing section)."""
    ref = reference_probability(NUFIT_NO, 0.6, [(295.0, 2.6)])
    assert 0.05 < ref[1, 0] < 0.08
    op = OscParams.from_array(jnp.asarray(NUFIT_NO))
    prod = float(
        probabilities_const_density(
            op, jnp.asarray([0.6]), length=295.0, rho=2.6,
            dtype=jnp.float64, phase_dtype=jnp.float64,
        )[0, 1, 0]
    )
    assert abs(prod - ref[1, 0]) < 1e-6
