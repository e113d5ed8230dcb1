"""Real-arithmetic complex-pair algebra for 3x3 oscillation matrices.

The TPU backend supports neither complex128 nor (efficiently) complex math in
hot loops; all oscillation computations are therefore expressed on (re, im)
array pairs with plain VPU ops. Shapes are [..., 3, 3] batched over grids.
"""
from __future__ import annotations

import jax.numpy as jnp

Pair = tuple[jnp.ndarray, jnp.ndarray]


def _mm3(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Batched 3x3 matmul as UNROLLED elementwise ops. A batched einsum over
    [..., 3, 3] lowers each tiny matmul onto a padded 128x128 MXU pass —
    measured to dominate the layered-oscillation scan; unrolling keeps it on
    the VPU (27 fused multiply-adds per batch element)."""
    rows = []
    for i in range(3):
        cols = []
        for k in range(3):
            cols.append(
                x[..., i, 0] * y[..., 0, k]
                + x[..., i, 1] * y[..., 1, k]
                + x[..., i, 2] * y[..., 2, k]
            )
        rows.append(jnp.stack(cols, axis=-1))
    return jnp.stack(rows, axis=-2)


def c_matmul(a: Pair, b: Pair) -> Pair:
    """(ar + i ai) @ (br + i bi) on [..., 3, 3] batches."""
    ar, ai = a
    br, bi = b
    re = _mm3(ar, br) - _mm3(ai, bi)
    im = _mm3(ar, bi) + _mm3(ai, br)
    return re, im


def c_scale(a: Pair, sr: jnp.ndarray, si: jnp.ndarray | None = None) -> Pair:
    """Multiply by a (broadcastable) scalar sr + i si."""
    ar, ai = a
    if si is None:
        return ar * sr, ai * sr
    return ar * sr - ai * si, ar * si + ai * sr


def c_add(a: Pair, b: Pair) -> Pair:
    return a[0] + b[0], a[1] + b[1]


def c_abs2(a: Pair) -> jnp.ndarray:
    return a[0] * a[0] + a[1] * a[1]


def herm_det(hr: jnp.ndarray, hi: jnp.ndarray) -> jnp.ndarray:
    """Real-valued determinant of a Hermitian 3x3 batch [..., 3, 3].

    Generic 3x3 determinant expanded on (re, im); for Hermitian input the
    imaginary part vanishes analytically, so only the real part is formed.
    """

    def cof_re(i1, j1, i2, j2):
        return (
            hr[..., i1, j1] * hr[..., i2, j2]
            - hi[..., i1, j1] * hi[..., i2, j2]
        )

    def cof_im(i1, j1, i2, j2):
        return (
            hr[..., i1, j1] * hi[..., i2, j2]
            + hi[..., i1, j1] * hr[..., i2, j2]
        )

    # det = sum over first row of a * cofactor; real part only.
    det = jnp.zeros_like(hr[..., 0, 0])
    for j, (c1, c2), sign in (
        (0, ((1, 1), (2, 2)), 1.0),
        (0, ((1, 2), (2, 1)), -1.0),
        (1, ((1, 0), (2, 2)), -1.0),
        (1, ((1, 2), (2, 0)), 1.0),
        (2, ((1, 0), (2, 1)), 1.0),
        (2, ((1, 1), (2, 0)), -1.0),
    ):
        m_re = cof_re(*c1, *c2)
        m_im = cof_im(*c1, *c2)
        det = det + sign * (hr[..., 0, j] * m_re - hi[..., 0, j] * m_im)
    return det


def herm_eigvals(hr: jnp.ndarray, hi: jnp.ndarray) -> jnp.ndarray:
    """Closed-form eigenvalues of a Hermitian 3x3 batch -> [..., 3].

    Trigonometric Cardano (cf. Kopp, physics/0610206) on real invariants:
    q = tr/3, p = sqrt(tr((H-q)^2)/6), phi from det(H-q)/(2 p^3).
    """
    q = (hr[..., 0, 0] + hr[..., 1, 1] + hr[..., 2, 2]) / 3.0
    dr = hr - q[..., None, None] * jnp.eye(3, dtype=hr.dtype)
    # tr(H'^2) = sum |H'_ij|^2 for Hermitian H'
    p2 = (jnp.sum(dr * dr, axis=(-2, -1)) + jnp.sum(hi * hi, axis=(-2, -1))) / 6.0
    # floor inside f32 RANGE: TPU f64 is a double-float pair of f32s, so a
    # a tiny-exponent literal is 0.0 there and sqrt'(0)=inf NaNs gradient samplers
    p = jnp.sqrt(jnp.maximum(p2, 1e-30))
    det = herm_det(dr, hi)
    r = det / (2.0 * p * p * p)
    # AD-safe arccos: at |r| >= 1 (degenerate eigenvalues) the composition
    # arccos'(clip(r)) * clip'(r) is (-inf) * 0 = NaN under jax.grad — which
    # poisons every gradient sampler (HMC/MALA/ChEES ride grad of this).
    # Where-select instead: interior points get the exact arccos and its
    # derivative; boundary points get the exact limit value (0 or pi) with a
    # zero one-sided derivative (correct for the symmetric functions built
    # downstream). The band only triggers where r's own rounding error
    # already exceeds the |r|-to-1 gap.
    tiny = 4e-7 if hr.dtype == jnp.float32 else 1e-13
    r_c = jnp.clip(r, -1.0, 1.0)
    interior = jnp.abs(r_c) < 1.0 - tiny
    phi = jnp.where(
        interior,
        jnp.arccos(jnp.where(interior, r_c, 0.0)),
        jnp.where(r_c > 0.0, 0.0, jnp.pi),
    )
    k = jnp.arange(3, dtype=hr.dtype)
    ang = (phi[..., None] + 2.0 * jnp.pi * k) / 3.0
    return q[..., None] + 2.0 * p[..., None] * jnp.cos(ang)


def herm_char_poly(hr: jnp.ndarray, hi: jnp.ndarray):
    """Characteristic-polynomial coefficients of a Hermitian 3x3 batch:
    p(λ) = λ³ − tr·λ² + c1·λ − det with real (tr, c1, det). Polynomial ops
    only — safe to evaluate in f64 on TPU (f64 mult/add is cheap even
    emulated; it is the f64 transcendentals that are ~20x)."""
    tr = hr[..., 0, 0] + hr[..., 1, 1] + hr[..., 2, 2]
    c1 = jnp.zeros_like(tr)
    for i, j in ((0, 1), (0, 2), (1, 2)):
        c1 = c1 + (
            hr[..., i, i] * hr[..., j, j]
            - hr[..., i, j] * hr[..., i, j]
            - hi[..., i, j] * hi[..., i, j]
        )
    return tr, c1, herm_det(hr, hi)


def newton_refined_eigvals(
    seeds: jnp.ndarray, hr_p: jnp.ndarray, hi_p: jnp.ndarray, dtype
) -> jnp.ndarray:
    """Polish low-precision eigenvalue seeds to ``dtype`` accuracy with two
    Newton iterations on the f64 characteristic polynomial.

    The trigonometric Cardano solve (`herm_eigvals`) needs sqrt/arccos/cos —
    software-emulated and dominant in f64 on TPU. Seeding with the f32 solve
    and refining with pure polynomial f64 arithmetic reaches ~1e-14 relative
    accuracy for separated roots (Newton doubles correct digits; f32 seeds
    start at ~1e-7). Newton is only LINEAR at a near-double root, so the
    closest pair is instead recovered by deflating the characteristic cubic
    by the opposite (well-separated, quadratically-converged) root and
    solving the remaining quadratic — polynomial ops plus ONE f64 sqrt,
    accurate to the same sqrt(eps)·scale conditioning floor as the f64
    Cardano solve. Total f64 transcendental count per point: 1 sqrt (vs
    1 sqrt + 1 arccos + 3 cos)."""
    tr, c1, det = herm_char_poly(hr_p.astype(dtype), hi_p.astype(dtype))
    trn, c1n, detn = tr[..., None], c1[..., None], det[..., None]
    # eigenvalue-spread scale² (units λ²): tr(H'²)/6 = tr²/9 − c1/3, floored
    # to avoid 0/0 for the zero matrix
    s2 = jnp.maximum(trn * trn / 9.0 - c1n / 3.0, 1e-30)  # f32-range floor (TPU f64 emulation)
    lam = jnp.sort(seeds.astype(dtype), axis=-1)
    for _ in range(2):
        pval = ((lam - trn) * lam + c1n) * lam - detn
        pder = (3.0 * lam - 2.0 * trn) * lam + c1n
        ok = jnp.abs(pder) > 1e-10 * s2
        delta = jnp.where(ok, pval / jnp.where(ok, pder, 1.0), 0.0)
        lam = lam - jnp.clip(delta, -jnp.sqrt(s2), jnp.sqrt(s2))
    # Deflate by the root farthest from the other two; the closest pair is
    # λ± = s/2 ± sqrt((s/2)² − q) with s = tr − lone, q = c1 − lone·s.
    pair_low = lam[..., 1] - lam[..., 0] < lam[..., 2] - lam[..., 1]
    lone = jnp.where(pair_low, lam[..., 2], lam[..., 0])
    s = tr - lone
    q = c1 - lone * s
    half = 0.5 * s
    # AD-safe sqrt: at disc <= 0 (exactly degenerate pair) sqrt'(0) = inf
    # would NaN the gradient; select a zero derivative there instead (the
    # scale-relative floor keeps the guard off any resolvable separation).
    disc = half * half - q
    pos = disc > 1e-30 * s2[..., 0]
    r = jnp.where(pos, jnp.sqrt(jnp.where(pos, disc, 1.0)), 0.0)
    out = jnp.stack(
        [
            jnp.where(pair_low, half - r, lone),
            jnp.where(pair_low, half + r, half - r),
            jnp.where(pair_low, lone, half + r),
        ],
        axis=-1,
    )
    return jnp.sort(out, axis=-1)


_TWO_PI = 6.283185307179586476925286766559


def _reduced_sincos(x: jnp.ndarray, trig_dtype) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(sin x, cos x) with range reduction in x's (high-precision) dtype and
    the transcendentals in ``trig_dtype``.

    On TPU, f64 sin/cos are software-emulated and dominate the layered
    (atmospheric) path where λL ~ 1e3 rad. Reducing mod 2π in f64 (mult +
    round + sub — cheap even emulated) and evaluating the trig in f32 keeps
    the phase exact to ~1e-7 rad at any magnitude.
    """
    red = x - _TWO_PI * jnp.round(x * (1.0 / _TWO_PI))
    red = red.astype(trig_dtype)
    return jnp.sin(red), jnp.cos(red)


def _sinc(x: jnp.ndarray, sin_x: jnp.ndarray) -> jnp.ndarray:
    """sin(x)/x from a precomputed sin, with the x -> 0 series limit."""
    small = jnp.abs(x) < 1e-4
    safe = jnp.where(small, 1.0, x)
    return jnp.where(small, 1.0 - x * x / 6.0, sin_x / safe)


def _phase_dd(
    a: jnp.ndarray, b: jnp.ndarray, length: jnp.ndarray, trig_dtype
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """First divided difference of f(λ) = exp(-i λ L):

    (e^{-iaL} - e^{-ibL}) / (a - b) = -i L e^{-i(a+b)L/2} sinc((a-b)L/2)

    — exact and stable as a -> b (degenerate eigenvalues).
    Returns the (re, im) pair in ``trig_dtype`` precision trig.
    """
    m = 0.5 * (a + b) * length
    d = 0.5 * (a - b) * length
    sin_m, cos_m = _reduced_sincos(m, trig_dtype)
    sin_d, _ = _reduced_sincos(d, trig_dtype)
    s = length.astype(trig_dtype) * _sinc(d.astype(trig_dtype), sin_d)
    return -s * sin_m, -s * cos_m


def herm_eigensystem(
    hr: jnp.ndarray,
    hi: jnp.ndarray,
    phase_dtype=None,
    h_phase: Pair | None = None,
) -> dict:
    """Length-independent pieces of exp(-i H L): sorted eigenvalues (in
    ``phase_dtype``) plus the Newton matrix factors (H − λ1), (H − λ1)(H − λ2)
    in the matrix dtype. Split out so layered media can compute this once per
    unique (energy, density) pair and reuse it for every (zenith, layer)
    segment with that density (the eigensolve dominates the layered cost)."""
    phase_dtype = phase_dtype or hr.dtype
    hr_p, hi_p = h_phase if h_phase is not None else (hr, hi)
    if jnp.dtype(phase_dtype) != jnp.dtype(hr.dtype):
        # Mixed-precision production path (f32 matrices, f64 phases): the f64
        # Cardano solve is dominated by software-emulated sqrt/arccos/cos.
        # Seed with the fast f32 solve and Newton-polish on the f64
        # characteristic polynomial — polynomial f64 ops only.
        seeds = herm_eigvals(hr, hi)
        lam_p = newton_refined_eigvals(seeds, hr_p, hi_p, phase_dtype)
    else:
        lam_p = jnp.sort(
            herm_eigvals(hr_p.astype(phase_dtype), hi_p.astype(phase_dtype)),
            axis=-1,
        )  # ascending [..., 3]
    lam = lam_p.astype(hr.dtype)
    eye = jnp.eye(3, dtype=hr.dtype)
    m1_r = hr - lam[..., 0, None, None] * eye  # H - λ1 (imag part is hi)
    m2_r = hr - lam[..., 1, None, None] * eye
    q_r, q_i = c_matmul((m1_r, hi), (m2_r, hi))  # (H-λ1)(H-λ2)
    return dict(lam_p=lam_p, m1_r=m1_r, hi=hi, q_r=q_r, q_i=q_i)


def evolution_from_eigensystem(eig: dict, length: jnp.ndarray) -> Pair:
    """exp(-i H L) from :func:`herm_eigensystem` pieces, Newton
    divided-difference form (stable under eigenvalue degeneracy, which the
    Frobenius-covariant form is not — e.g. Δm²21 -> 0 or θ13 = 0 corners):

        f(H) = f(λ1) I + f[λ1,λ2] (H − λ1) + f[λ1,λ2,λ3] (H − λ1)(H − λ2)

    with f(λ) = exp(-i λ L). First differences use the sinc identity (exact in
    the degenerate limit); the second difference is guarded — it only becomes
    ill-conditioned under *triple* degeneracy, where its matrix factor
    (H − λ1)(H − λ2) vanishes anyway. Phases form in the eigenvalue dtype and
    the trig runs range-reduced in the matrix dtype (see _reduced_sincos).
    """
    lam_p, m1_r, hi = eig["lam_p"], eig["m1_r"], eig["hi"]
    q_r, q_i = eig["q_r"], eig["q_i"]
    trig_dtype = m1_r.dtype
    length_p = jnp.asarray(length, lam_p.dtype)
    l1, l2, l3 = lam_p[..., 0], lam_p[..., 1], lam_p[..., 2]

    p1 = l1 * length_p
    sin_p1, cos_p1 = _reduced_sincos(p1, trig_dtype)
    f1_r, f1_i = cos_p1, -sin_p1
    f12_r, f12_i = _phase_dd(l1, l2, length_p, trig_dtype)
    f23_r, f23_i = _phase_dd(l2, l3, length_p, trig_dtype)
    d13 = (l1 - l3).astype(trig_dtype)
    inv13 = jnp.where(jnp.abs(d13) < 1e-30, 0.0, 1.0 / jnp.where(d13 == 0, 1.0, d13))
    f123_r = (f12_r - f23_r) * inv13  # broadcasts over the length batch
    f123_i = (f12_i - f23_i) * inv13

    eye = jnp.eye(3, dtype=trig_dtype)
    out_r = (
        f1_r[..., None, None] * eye
        + f12_r[..., None, None] * m1_r
        - f12_i[..., None, None] * hi
        + f123_r[..., None, None] * q_r
        - f123_i[..., None, None] * q_i
    )
    out_i = (
        f1_i[..., None, None] * eye
        + f12_r[..., None, None] * hi
        + f12_i[..., None, None] * m1_r
        + f123_r[..., None, None] * q_i
        + f123_i[..., None, None] * q_r
    )
    return out_r, out_i


def herm_evolution(
    hr: jnp.ndarray,
    hi: jnp.ndarray,
    length: jnp.ndarray,
    phase_dtype=None,
    h_phase: Pair | None = None,
) -> Pair:
    """exp(-i H L) for a Hermitian 3x3 batch, all-real ops (eigensystem +
    evolution in one call; see the split functions above).

    phase_dtype: dtype for the eigenvalue computation and phase products. For
    f32 inputs with large phases (atmospheric: λL ~ 1e3 rad) pass float64 —
    the trig itself runs range-reduced in the matrix dtype either way.
    h_phase: optional full-precision (hr, hi) pair for the eigenvalue path —
    required for phase accuracy when hr itself was already rounded to f32.
    """
    eig = herm_eigensystem(hr, hi, phase_dtype=phase_dtype, h_phase=h_phase)
    return evolution_from_eigensystem(eig, length)
