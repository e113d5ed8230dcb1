"""PREM earth model and atmospheric neutrino path geometry.

Completes the CUDAProb3-equivalent atmospheric path (``README.md:119-123``:
NuOscillator's GPU atmospheric engine): for each zenith angle the neutrino
chord is decomposed into segments through concentric density shells, producing
the (layer_lengths, layer_rho) inputs of
:func:`mach3_tpu.osc.prob.probabilities_layered`.

The shell table is the standard coarse PREM average (crust / mantle shells /
outer core / inner core); a custom table can be supplied. All geometry is
computed host-side in numpy once per zenith binning — only the per-step
3-flavour evolution runs on device.
"""
from __future__ import annotations

import numpy as np

EARTH_RADIUS_KM = 6371.0
#: Default production height of atmospheric neutrinos (km above surface).
PRODUCTION_HEIGHT_KM = 15.0

#: Coarse PREM shells: (outer radius [km], density [g/cm^3], electron fraction).
#: Standard 4-zone averaging of Dziewonski & Anderson 1981.
PREM_COARSE = (
    (1221.5, 13.0, 0.4656),  # inner core
    (3480.0, 11.3, 0.4656),  # outer core
    (5701.0, 5.0, 0.4957),  # lower mantle
    (6346.6, 3.9, 0.4957),  # upper mantle / transition
    (6371.0, 2.6, 0.4957),  # crust
)


def path_through_earth(
    cos_zenith: np.ndarray,
    shells: tuple = PREM_COARSE,
    production_height_km: float = PRODUCTION_HEIGHT_KM,
    detector_depth_km: float = 0.0,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Chord decomposition for each zenith angle.

    cos_zenith: [NZ] (cosZ = 1 down-going from above, -1 up-going through the
    core). Returns (lengths [NZ, NL], rho [NZ, NL], ye [NZ, NL]) zero-padded;
    segments ordered from production to detector.
    """
    cos_zenith = np.atleast_1d(np.asarray(cos_zenith, np.float64))
    r_det = EARTH_RADIUS_KM - detector_depth_km
    r_prod = EARTH_RADIUS_KM + production_height_km

    radii = np.array([s[0] for s in shells])
    rhos = np.array([s[1] for s in shells])
    yes = np.array([s[2] for s in shells])

    max_segments = 2 * len(shells) + 1
    nz = len(cos_zenith)
    lengths = np.zeros((nz, max_segments))
    rho_out = np.zeros((nz, max_segments))
    ye_out = np.full((nz, max_segments), 0.5)

    for i, cz in enumerate(cos_zenith):
        # Path length from production point to detector (law of cosines in
        # the Earth-centred frame; cz is the zenith angle at the detector).
        # total L = sqrt(r_prod^2 - r_det^2 (1 - cz^2)) - r_det * cz  ... for
        # the straight line hitting the detector with direction cosine cz.
        s_total = np.sqrt(r_prod**2 - r_det**2 * (1.0 - cz**2)) - r_det * cz
        # Atmosphere segment (density ~ 0): from production until entering the
        # Earth's surface (only relevant for down-going or horizon paths).
        segs: list[tuple[float, float, float]] = []
        if cz >= 0:
            # Down-going: the entire path to the detector is above r_det
            # except the final underground part (zero for surface detector) —
            # treat as vacuum/air with rho 0 plus crust if detector is deep.
            segs.append((s_total, 0.0, 0.5))
        else:
            # Up-going: impact parameter of the chord
            b = r_det * np.sqrt(1.0 - cz**2)
            # Air segment before entering the Earth
            s_air = s_total - (
                np.sqrt(EARTH_RADIUS_KM**2 - b**2) - r_det * cz
            )
            if s_air > 0:
                segs.append((s_air, 0.0, 0.5))
            # Chord through shells: traverse from entry to detector.
            # The chord's minimum radius is b; it crosses every shell with
            # radius > b. Entry-side crossings (descending), then ascending to
            # the detector radius.
            crossing = radii[radii > b]
            # path positions measured from Earth entry along the chord
            # for shell radius r: half-chord within r is sqrt(r^2 - b^2)
            half = {r: np.sqrt(r**2 - b**2) for r in crossing}
            surf_half = np.sqrt(EARTH_RADIUS_KM**2 - b**2)
            det_pos = surf_half + np.sqrt(max(r_det**2 - b**2, 0.0))
            # Build boundary positions: descending through shells then ascending
            bounds = []
            shells_desc = sorted(crossing)[::-1]  # outermost first
            for r in shells_desc[1:]:  # inner boundaries on the way down
                bounds.append(surf_half - half[r])
            for r in sorted(crossing)[1:]:  # on the way up (mirror)
                bounds.append(surf_half + half[r])
            bounds = sorted(set(b_ for b_ in bounds if 0.0 < b_ < det_pos))
            positions = [0.0] + bounds + [det_pos]
            for p0, p1 in zip(positions[:-1], positions[1:]):
                mid = 0.5 * (p0 + p1)
                # radius at chord position mid
                x = mid - surf_half
                r_mid = np.sqrt(b**2 + x**2)
                shell_idx = np.searchsorted(radii, r_mid)
                shell_idx = min(shell_idx, len(radii) - 1)
                segs.append((p1 - p0, rhos[shell_idx], yes[shell_idx]))
        for j, (l, rho, ye) in enumerate(segs[:max_segments]):
            lengths[i, j] = l
            rho_out[i, j] = rho
            ye_out[i, j] = ye
    return lengths, rho_out, ye_out


def atmospheric_probabilities(
    params,
    energies: np.ndarray,
    cos_zeniths: np.ndarray,
    antineutrino: bool = False,
    shells: tuple = PREM_COARSE,
):
    """P[NZ, NE, 3, 3] over an (E, cosZ) grid — the CUDAProb3-style table the
    sample layer gathers per event. Electron fraction uses the path-averaged
    per-segment values (core vs mantle Ye differ)."""
    import jax.numpy as jnp

    from .prob import probabilities_layered

    lengths, rho, ye = path_through_earth(cos_zeniths, shells)
    # probabilities_layered takes a single ye; fold the per-segment Ye into an
    # effective density rho_eff = rho * (ye / 0.5) so the ee potential matches.
    rho_eff = rho * (ye / 0.5)
    return probabilities_layered(
        params,
        jnp.asarray(energies),
        jnp.asarray(lengths),
        jnp.asarray(rho_eff),
        ye=0.5,
        antineutrino=antineutrino,
    )
