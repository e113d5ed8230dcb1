"""Oscillation-probability validation: closed-form limits, unitarity, CP/T
relations, eigh cross-check, layered-matter consistency.

Replaces NuOscillator validation (the reference outsources this physics,
``README.md:119-135``); here we own it, so the tests are the contract.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from mach3_tpu.osc.pmns import MATTER_A, OSC_PHASE, pmns_matrix, mass_matrix, hamiltonian_per_km
from mach3_tpu.osc.prob import (
    OscParams,
    evolution_operator,
    probabilities_const_density,
    probabilities_layered,
)

# PDG-ish best-fit parameters (normal ordering)
PARAMS = OscParams(
    theta12=jnp.asarray(np.arcsin(np.sqrt(0.307))),
    theta13=jnp.asarray(np.arcsin(np.sqrt(0.0220))),
    theta23=jnp.asarray(np.arcsin(np.sqrt(0.561))),
    delta_cp=jnp.asarray(-1.601),
    dm21_sq=jnp.asarray(7.42e-5),
    dm31_sq=jnp.asarray(2.51e-3),
)


def test_pmns_unitarity():
    u = np.asarray(pmns_matrix(PARAMS.theta12, PARAMS.theta13, PARAMS.theta23, PARAMS.delta_cp))
    assert np.allclose(u @ u.conj().T, np.eye(3), atol=1e-14)


def test_vacuum_unitarity_rows_and_columns():
    e = jnp.linspace(0.1, 5.0, 40)
    p = np.asarray(probabilities_const_density(PARAMS, e, length=295.0))
    assert np.allclose(p.sum(axis=-1), 1.0, atol=1e-10)
    assert np.allclose(p.sum(axis=-2), 1.0, atol=1e-10)
    assert np.all(p >= -1e-12) and np.all(p <= 1 + 1e-12)


def test_two_flavour_limit():
    """With theta12 = theta13 = 0 and dm21 = 0, P(mu->tau) reduces to
    sin^2(2 theta23) sin^2(1.267 dm31 L / E)."""
    params = OscParams(
        theta12=jnp.asarray(0.0),
        theta13=jnp.asarray(0.0),
        theta23=jnp.asarray(0.7),
        delta_cp=jnp.asarray(0.0),
        dm21_sq=jnp.asarray(0.0),
        dm31_sq=jnp.asarray(2.5e-3),
    )
    e = jnp.linspace(0.3, 3.0, 50)
    L = 500.0
    p = np.asarray(probabilities_const_density(params, e, length=L))
    expected = np.sin(2 * 0.7) ** 2 * np.sin(OSC_PHASE * 2.5e-3 * L / np.asarray(e)) ** 2
    assert np.allclose(p[:, 1, 2], expected, atol=1e-10)
    assert np.allclose(p[:, 0, 0], 1.0, atol=1e-12)  # nu_e decoupled


def test_against_eigh_reference_in_matter():
    """Cardano + covariants must agree with jnp.linalg.eigh evolution."""
    e = jnp.linspace(0.2, 8.0, 30)
    rho, L = 2.8, 810.0
    u = pmns_matrix(PARAMS.theta12, PARAMS.theta13, PARAMS.theta23, PARAMS.delta_cp)
    m2 = mass_matrix(u, PARAMS.dm21_sq, PARAMS.dm31_sq, e, rho=rho)
    h = hamiltonian_per_km(m2, e)

    ours = np.asarray(evolution_operator(h, L))

    lam, v = jnp.linalg.eigh(h)
    phase = jnp.exp(-1j * lam * L)
    ref = np.asarray(jnp.einsum("eij,ej,ekj->eik", v, phase, jnp.conj(v)))
    assert np.allclose(ours, ref, atol=1e-9)


def test_antineutrino_cp_relation_in_vacuum():
    """In vacuum P(nubar_a -> nubar_b; delta) == P(nu_a -> nu_b; -delta)."""
    e = jnp.linspace(0.3, 3.0, 20)
    p_bar = np.asarray(
        probabilities_const_density(PARAMS, e, length=295.0, antineutrino=True)
    )
    flipped = OscParams(
        theta12=PARAMS.theta12,
        theta13=PARAMS.theta13,
        theta23=PARAMS.theta23,
        delta_cp=-PARAMS.delta_cp,
        dm21_sq=PARAMS.dm21_sq,
        dm31_sq=PARAMS.dm31_sq,
    )
    p_nu = np.asarray(probabilities_const_density(flipped, e, length=295.0))
    assert np.allclose(p_bar, p_nu, atol=1e-10)


def test_time_reversal_in_vacuum():
    """P(a->b) == P(b->a) with delta -> -delta (T conjugation)."""
    e = jnp.linspace(0.3, 3.0, 20)
    p = np.asarray(probabilities_const_density(PARAMS, e, length=295.0))
    flipped = OscParams(
        theta12=PARAMS.theta12,
        theta13=PARAMS.theta13,
        theta23=PARAMS.theta23,
        delta_cp=-PARAMS.delta_cp,
        dm21_sq=PARAMS.dm21_sq,
        dm31_sq=PARAMS.dm31_sq,
    )
    p_rev = np.asarray(probabilities_const_density(flipped, e, length=295.0))
    assert np.allclose(p, np.swapaxes(p_rev, -1, -2), atol=1e-10)


def test_matter_enhances_nue_appearance_NO():
    """Normal ordering: matter enhances P(mu->e) for neutrinos near the
    atmospheric resonance relative to vacuum."""
    e = jnp.asarray([0.6])  # T2K-ish peak
    L = 295.0
    p_vac = float(probabilities_const_density(PARAMS, e, length=L)[0, 1, 0])
    p_mat = float(probabilities_const_density(PARAMS, e, length=L, rho=2.6)[0, 1, 0])
    assert p_mat > p_vac


def test_t2k_numu_survival_dip_location():
    """The numu survival minimum sits near E = 1.267*dm31*L/(pi/2)."""
    e = jnp.linspace(0.3, 1.2, 400)
    p = np.asarray(probabilities_const_density(PARAMS, e, length=295.0))[:, 1, 1]
    e_dip = float(e[np.argmin(p)])
    expected = OSC_PHASE * 2.51e-3 * 295.0 / (np.pi / 2)
    assert e_dip == pytest.approx(expected, rel=0.03)
    assert p.min() < 0.05  # nearly full disappearance at maximal mixing


def test_layered_single_layer_equals_const():
    e = jnp.linspace(0.5, 5.0, 16)
    L, rho = 810.0, 2.8
    p_const = np.asarray(probabilities_const_density(PARAMS, e, length=L, rho=rho))
    p_lay = np.asarray(
        probabilities_layered(
            PARAMS,
            e,
            layer_lengths=jnp.asarray([L]),
            layer_rho=jnp.asarray([rho]),
        )
    )
    assert np.allclose(p_lay, p_const, atol=1e-10)


def test_layered_zero_padding_is_identity():
    e = jnp.linspace(0.5, 5.0, 8)
    p1 = np.asarray(
        probabilities_layered(
            PARAMS, e, layer_lengths=jnp.asarray([500.0]), layer_rho=jnp.asarray([3.0])
        )
    )
    p2 = np.asarray(
        probabilities_layered(
            PARAMS,
            e,
            layer_lengths=jnp.asarray([500.0, 0.0, 0.0]),
            layer_rho=jnp.asarray([3.0, 10.0, 5.0]),
        )
    )
    assert np.allclose(p1, p2, atol=1e-10)


def test_layered_splitting_a_layer_is_invariant():
    """Constant density split into two half-layers must give the same result."""
    e = jnp.linspace(0.5, 5.0, 8)
    p1 = np.asarray(
        probabilities_layered(
            PARAMS, e, layer_lengths=jnp.asarray([1000.0]), layer_rho=jnp.asarray([4.0])
        )
    )
    p2 = np.asarray(
        probabilities_layered(
            PARAMS,
            e,
            layer_lengths=jnp.asarray([500.0, 500.0]),
            layer_rho=jnp.asarray([4.0, 4.0]),
        )
    )
    assert np.allclose(p1, p2, atol=1e-10)


def test_f32_grid_matches_f64_within_mc_precision():
    """The production f32 path (TPU policy, see ``OscConfig.dtype``) must agree
    with f64 to well below MC statistics for beam and atmospheric scales."""
    e = jnp.linspace(0.05, 10.0, 300)
    for L, rho in [(295.0, 2.6), (1300.0, 2.85), (12000.0, 5.0)]:
        p64 = np.asarray(
            probabilities_const_density(PARAMS, e, length=L, rho=rho, dtype=jnp.float64)
        )
        p32 = np.asarray(
            probabilities_const_density(PARAMS, e, length=L, rho=rho, dtype=jnp.float32)
        )
        assert np.abs(p64 - p32).max() < 5e-5, (L, rho)


def test_from_array_sin2_parameterisation():
    arr = jnp.asarray([0.307, 0.0220, 0.561, -1.601, 7.42e-5, 2.51e-3])
    p = OscParams.from_array(arr)
    assert float(jnp.sin(p.theta12) ** 2) == pytest.approx(0.307)
    assert float(jnp.sin(p.theta13) ** 2) == pytest.approx(0.0220)


def test_f32_phases_match_f64_at_beam_baseline():
    """f32 eigenvalue/phase path vs f64: beam-scale λL errs < 1e-5 in
    probability — far below MC statistics (used by the toy/bench)."""
    from mach3_tpu.osc.prob import OscParams, probabilities_const_density

    p = OscParams.from_array(
        jnp.asarray([0.307, 0.022, 0.561, -1.601, 7.42e-5, 2.51e-3])
    )
    e = jnp.asarray(np.geomspace(0.1, 10.0, 300))
    for anti in (False, True):
        p64 = probabilities_const_density(
            p, e, length=295.0, rho=2.6, antineutrino=anti,
            dtype=jnp.float64, phase_dtype=jnp.float64,
        )
        p32 = probabilities_const_density(
            p, e, length=295.0, rho=2.6, antineutrino=anti,
            dtype=jnp.float32, phase_dtype=jnp.float32,
        )
        assert float(jnp.max(jnp.abs(p64 - p32.astype(jnp.float64)))) < 1e-5


def test_newton_refined_eigvals_match_eigvalsh():
    """f32-seeded + f64-Newton-polished eigenvalues agree with LAPACK to
    ~1e-13 of the matrix scale on random Hermitian batches, including
    near-degenerate pairs (where the guard keeps the seeds)."""
    import numpy as np
    from mach3_tpu.osc.kernels import herm_eigvals, newton_refined_eigvals

    rng = np.random.default_rng(42)
    a = rng.normal(size=(500, 3, 3)) + 1j * rng.normal(size=(500, 3, 3))
    h = (a + np.conj(np.swapaxes(a, -1, -2))) / 2
    # fold in near-degenerate cases: pairs separated by 1e-9
    for i in range(20):
        q, _ = np.linalg.qr(rng.normal(size=(3, 3)) + 1j * rng.normal(size=(3, 3)))
        lam = np.diag([1.0, 1.0 + 1e-9, 2.0])
        h[i] = q @ lam @ np.conj(q.T)
    hr64 = jnp.asarray(np.real(h))
    hi64 = jnp.asarray(np.imag(h))
    seeds = herm_eigvals(hr64.astype(jnp.float32), hi64.astype(jnp.float32))
    lam = np.asarray(newton_refined_eigvals(seeds, hr64, hi64, jnp.float64))
    expected = np.linalg.eigvalsh(h)
    scale = np.abs(expected).max(axis=-1, keepdims=True)
    err = np.abs(lam - expected) / scale
    # random (well-separated) part: full f64 accuracy
    assert err[20:].max() < 1e-12, err[20:].max()
    # near-degenerate pairs: bounded by the sqrt(eps64) deflated-quadratic
    # conditioning floor (same as the f64 Cardano arccos conditioning)
    assert err[:20].max() < 1e-7, err[:20].max()


def test_mixed_precision_eigensystem_uses_refinement():
    """The production mixed-precision path (f32 matrices, f64 phases) produces
    f64-accurate eigenvalues — the layered/beam phase precision contract."""
    import numpy as np
    from mach3_tpu.osc.kernels import herm_eigensystem

    rng = np.random.default_rng(3)
    a = rng.normal(size=(64, 3, 3)) + 1j * rng.normal(size=(64, 3, 3))
    h = (a + np.conj(np.swapaxes(a, -1, -2))) / 2
    hr64, hi64 = jnp.asarray(np.real(h)), jnp.asarray(np.imag(h))
    eig = herm_eigensystem(
        hr64.astype(jnp.float32), hi64.astype(jnp.float32),
        phase_dtype=jnp.float64, h_phase=(hr64, hi64),
    )
    expected = np.linalg.eigvalsh(h)
    scale = np.abs(expected).max()
    assert np.abs(np.asarray(eig["lam_p"]) - expected).max() / scale < 1e-12
