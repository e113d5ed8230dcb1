"""Parallel tempering (replica exchange) MCMC over the chain batch axis.

The reference's only answer to multimodal posteriors is simulated annealing
inside a single chain (``Fitters/MR2T2.cpp:103-115``) plus starting many
independent processes. Oscillation posteriors are genuinely multimodal —
octant of θ23, mass ordering — and single-temperature chains mix between
modes exponentially slowly.

Here the chain batch axis makes replica exchange natural and nearly free:
``n_temps`` temperature levels × ``n_walkers`` walkers run as one
``[T * W, P]`` batch through the SAME vectorised likelihood as MR2T2 (the
tempered levels ride the batch axis, so the reweight/Pallas kernels see just
a bigger chain batch), and the swap phase is an elementwise shuffle along the
level axis — zero extra likelihood evaluations.

Tempering is LIKELIHOOD-ONLY: level t targets ``prior(θ) · like(θ)^{β_t}``
with ``β_0 = 1`` (the posterior) and ``β_t = max_temp^{-t/(T-1)}``. Keeping
the full prior at every level confines hot chains to the physical region.
Swaps between adjacent levels use the standard replica-exchange ratio
``log α = (β_t − β_{t+1}) (E_t − E_{t+1})`` with ``E = −log like`` (the
sample -logL), alternating even/odd pairs each swap step so every boundary
is attempted every other swap.

Posterior draws are the β=1 level: ``out["theta"][:, :n_walkers]``
(level-major layout), or use :meth:`ParallelTempering.cold_chain`.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..core.logging import get_logger
from ..core.precision import ATYPE, LARGE_LOGL
from .mcmc import make_chunk_runner
from .model import FitModel

_log = get_logger("pt")


@struct.dataclass
class PTState:
    theta: jnp.ndarray  # [T*W, P] level-major: chain c = t * W + w
    prior_nll: jnp.ndarray  # [T*W]
    sample_nll: jnp.ndarray  # [T*W] raw (untempered) E = -log like
    key: jax.Array
    step: jnp.ndarray  # i32
    n_accepted: jnp.ndarray  # [T*W] i32
    swap_attempts: jnp.ndarray  # [T-1] i32
    swap_accepts: jnp.ndarray  # [T-1] i32
    # Robbins-Monro per-level log throw scale [T]: the sqrt(T) heuristic is
    # only right when the tempered target flattens uniformly; the untempered
    # prior does not, so each level tunes its own scale to target acceptance.
    log_scale: jnp.ndarray


@dataclasses.dataclass(frozen=True)
class PTConfig:
    """Static knobs for parallel tempering."""

    n_steps: int = 1000
    chunk_size: int = 100
    n_temps: int = 8
    #: Hottest temperature; ladder is geometric T_t = max_temp^{t/(T-1)}.
    max_temp: float = 64.0
    #: Attempt swaps every this many MH steps (alternating pair parity).
    swap_every: int = 1
    #: Scale level-t throws by T_t^0.5 so hot chains take usefully larger
    #: steps (their tempered target is flatter by roughly that factor).
    scale_throws: bool = True
    #: Robbins-Monro per-level global-scale adaptation toward the optimal
    #: acceptance (same stochastic approximation as MR2T2's adaptive mode):
    #: corrects the sqrt(T) heuristic where the untempered prior dominates.
    robbins_monro: bool = True
    target_accept: float = 0.234
    #: Make the hottest level the PRIOR itself (β = 0). Required for marginal
    #: likelihood estimation (``diagnostics/evidence.py``): the stepping-stone
    #: / thermodynamic-integration ladder must span the full β ∈ [0, 1] range.
    #: The remaining n_temps-1 levels keep the geometric spacing.
    beta_zero: bool = False


def temperature_ladder(n_temps: int, max_temp: float) -> np.ndarray:
    """Geometric ladder [T]: 1 = T_0 < ... < T_{n-1} = max_temp."""
    if n_temps < 2:
        return np.ones(max(n_temps, 1))
    return max_temp ** (np.arange(n_temps) / (n_temps - 1))


def pt_betas(config: PTConfig) -> np.ndarray:
    """Inverse-temperature ladder [n_temps], descending from β₀ = 1.

    Geometric in temperature; with ``beta_zero`` the last level is β = 0 (the
    bounded prior itself) and the geometric part spans the first
    ``n_temps - 1`` levels."""
    if config.beta_zero:
        if config.n_temps < 3:
            raise ValueError("beta_zero needs n_temps >= 3")
        core = 1.0 / temperature_ladder(config.n_temps - 1, config.max_temp)
        return np.concatenate([core, [0.0]])
    return 1.0 / temperature_ladder(config.n_temps, config.max_temp)


def make_pt_step_fn_args(config: PTConfig, n_walkers: int):
    """Pure transition ``step(model, state)`` (model as a traced argument —
    same rationale as ``make_step_fn_args``)."""
    n_t = config.n_temps
    betas_np = pt_betas(config)
    betas = jnp.asarray(betas_np, ATYPE)  # [T]
    beta_c = jnp.repeat(betas, n_walkers)  # [T*W]
    # Throw scale heuristic ~ sqrt(T); the β=0 level has no likelihood scale
    # at all, so seed it like the hottest tempered level (Robbins-Monro takes
    # over from there).
    scales_np = np.sqrt(1.0 / np.maximum(betas_np, 1.0 / config.max_temp))
    base_scale = jnp.asarray(
        scales_np if config.scale_throws else np.ones(n_t), ATYPE
    )  # [T]

    def nll_parts(model: FitModel, thetas: jnp.ndarray):
        """(prior [C], E [C]) with the OOB sentinel folded into E."""
        prior = jax.vmap(model.prior_nll)(thetas)
        _, _, sample_parts = model.total_nll_batch_parts(thetas, want_parts=False)
        e = jnp.sum(sample_parts, axis=1)
        oob = prior >= LARGE_LOGL
        n_s = max(len(model.samples), 1)
        return prior, jnp.where(oob, n_s * jnp.asarray(LARGE_LOGL, ATYPE), e)

    def step_fn(model: FitModel, state: PTState):
        from ..params.state import propose_step_batch

        key, k_prop, k_acc, k_swap = jax.random.split(state.key, 4)
        c = state.theta.shape[0]

        # ---- tempered Metropolis step (one batched likelihood evaluation)
        throw_scale = jnp.repeat(base_scale * jnp.exp(state.log_scale), n_walkers)
        proposed = propose_step_batch(
            model._flat(), state.theta, k_prop, scale=throw_scale
        )
        prior_p, e_p = nll_parts(model, proposed)
        d = (prior_p - state.prior_nll) + beta_c * (e_p - state.sample_nll)
        acc_prob = jnp.minimum(1.0, jnp.exp(jnp.minimum(-d, 0.0)))
        u = jax.random.uniform(k_acc, (c,), dtype=ATYPE)
        accept = (e_p < LARGE_LOGL) & (u < acc_prob)
        theta = jnp.where(accept[:, None], proposed, state.theta)
        prior_nll = jnp.where(accept, prior_p, state.prior_nll)
        sample_nll = jnp.where(accept, e_p, state.sample_nll)

        # ---- replica-exchange phase (no likelihood evaluations)
        step = state.step + 1

        # Robbins-Monro per-level scale toward the target acceptance (same
        # stochastic-approximation schedule as the adaptive MR2T2 scale).
        log_scale = state.log_scale
        if config.robbins_monro:
            acc_level = jnp.mean(acc_prob.reshape(n_t, n_walkers), axis=1)
            gamma = 2.0 / jnp.maximum(step.astype(ATYPE), 1.0) ** 0.66
            log_scale = jnp.clip(
                log_scale + gamma * (acc_level - config.target_accept), -8.0, 4.0
            )
        swap_attempts = state.swap_attempts
        swap_accepts = state.swap_accepts
        if n_t > 1:
            do_swap = (step % config.swap_every) == 0
            parity = (step // config.swap_every) % 2
            th = theta.reshape(n_t, n_walkers, -1)
            pr = prior_nll.reshape(n_t, n_walkers)
            en = sample_nll.reshape(n_t, n_walkers)
            # log ratio for swapping levels (t, t+1): (β_t − β_{t+1})(E_t − E_{t+1})
            log_r = (betas[:-1, None] - betas[1:, None]) * (en[:-1] - en[1:])
            u_s = jax.random.uniform(k_swap, log_r.shape, dtype=ATYPE)
            pair_active = (jnp.arange(n_t - 1, dtype=jnp.int32) % 2) == parity
            acc_s = (jnp.log(u_s) < log_r) & pair_active[:, None] & do_swap
            # Non-overlapping pairs (parity): row t takes t+1 where acc_s[t],
            # row t+1 takes t where acc_s[t].
            pad = jnp.zeros((1, n_walkers), bool)
            take_next = jnp.concatenate([acc_s, pad])  # [T, W]
            take_prev = jnp.concatenate([pad, acc_s])

            def exchange(a):
                m = take_next.reshape(take_next.shape + (1,) * (a.ndim - 2))
                p = take_prev.reshape(m.shape)
                return jnp.where(
                    m, jnp.roll(a, -1, 0), jnp.where(p, jnp.roll(a, 1, 0), a)
                )

            theta = exchange(th).reshape(c, -1)
            prior_nll = exchange(pr).reshape(c)
            sample_nll = exchange(en).reshape(c)
            swap_attempts = swap_attempts + (pair_active & do_swap).astype(jnp.int32)
            swap_accepts = swap_accepts + jnp.sum(acc_s, axis=1).astype(jnp.int32)

        new_state = PTState(
            theta=theta,
            prior_nll=prior_nll,
            sample_nll=sample_nll,
            key=key,
            step=step,
            n_accepted=state.n_accepted + accept.astype(jnp.int32),
            swap_attempts=swap_attempts,
            swap_accepts=swap_accepts,
            log_scale=log_scale,
        )
        outputs = {
            "theta": theta,
            "nll": prior_nll + sample_nll,  # untempered -logL of every level
            # Untempered sample -logL per level: the raw material for the
            # stepping-stone / thermodynamic-integration evidence estimators.
            "sample_nll": sample_nll,
            "acc_prob": acc_prob,
            "accepted": accept,
        }
        return new_state, outputs

    return step_fn


class ParallelTempering:
    """Chunked replica-exchange driver; same surface as :class:`MR2T2`.

    init_theta: [n_walkers, P] — replicated across the temperature ladder
    (pass ``pretiled=True`` with a [n_temps * n_walkers, P] level-major seed
    to start every level explicitly, e.g. when resuming).
    """

    def __init__(
        self,
        model: FitModel,
        config: PTConfig,
        init_theta: np.ndarray,
        seed: int = 0,
        pretiled: bool = False,
    ):
        self.model = model
        self.config = config
        init_theta = np.asarray(init_theta)
        n_t = config.n_temps
        if init_theta.ndim != 2:
            raise ValueError("init_theta must be [walkers, P]")
        if pretiled:
            if init_theta.shape[0] % n_t != 0:
                raise ValueError(
                    f"pretiled init needs a multiple of n_temps={n_t} rows"
                )
            self.n_walkers = init_theta.shape[0] // n_t
            tiled = init_theta
        else:
            self.n_walkers = init_theta.shape[0]
            tiled = np.tile(init_theta, (n_t, 1))
        step_fn = make_pt_step_fn_args(config, self.n_walkers)

        def run_chunk(mdl, state, n_steps):
            def body(s, _):
                return step_fn(mdl, s)

            return jax.lax.scan(body, state, None, length=n_steps)

        self._run_chunk = make_chunk_runner(run_chunk, model)

        theta0 = jnp.asarray(tiled, ATYPE)
        prior0 = jax.jit(lambda m, t: jax.vmap(m.prior_nll)(t))(model, theta0)
        total0 = jax.jit(lambda m, t: m.total_nll_batch(t))(model, theta0)
        n_oob = int(np.sum(np.asarray(total0) >= LARGE_LOGL))
        if n_oob:
            _log.warning(
                "%d/%d initial walkers are OUT OF BOUNDS (LARGE_LOGL "
                "sentinel) — they will likely stay stuck; clip the initial "
                "throws into the parameter bounds",
                n_oob, theta0.shape[0],
            )
        self.state = PTState(
            theta=theta0,
            prior_nll=prior0,
            sample_nll=total0 - prior0,
            key=jax.random.key(seed),
            step=jnp.asarray(0, jnp.int32),
            n_accepted=jnp.zeros((theta0.shape[0],), jnp.int32),
            swap_attempts=jnp.zeros((max(n_t - 1, 1),), jnp.int32),
            swap_accepts=jnp.zeros((max(n_t - 1, 1),), jnp.int32),
            log_scale=jnp.zeros((n_t,), ATYPE),
        )
        _log.info(
            "parallel tempering: %d levels x %d walkers, T_max=%g, swap every %d",
            n_t, self.n_walkers, config.max_temp, config.swap_every,
        )

    def run(
        self, n_steps: int | None = None, callback=None, collect: bool = True
    ) -> dict[str, np.ndarray]:
        """Run; returns theta [S, T*W, P] (level-major), nll, acc_prob,
        accepted, step_time — same keys as MR2T2 so chain IO / diagnostics
        apply unchanged. collect=False streams chunks to the callback only
        (see MR2T2.run)."""
        import time

        n_steps = n_steps or self.config.n_steps
        if n_steps <= 0:
            return {}
        chunks: list[dict[str, np.ndarray]] = []
        done = 0
        pending = None  # double-buffered fetch; see MR2T2.run

        def drain(pend):
            done_p, state_p, out_p, t0_p, n_p = pend
            host = {k: np.asarray(v) for k, v in out_p.items()}
            host["step_time"] = np.full(n_p, (time.perf_counter() - t0_p) / n_p)
            if collect:
                chunks.append(host)
            if callback is not None:
                callback(done_p, state_p, host)

        while done < n_steps:
            n = min(self.config.chunk_size, n_steps - done)
            t0 = time.perf_counter()
            self.state, out = self._run_chunk(self.model, self.state, n)
            done += n
            if pending is not None:
                drain(pending)
            pending = (done, self.state, out, t0, n)
        drain(pending)
        if not collect:
            return {}
        return {k: np.concatenate([c[k] for c in chunks], axis=0) for k in chunks[0]}

    def log_evidence(
        self,
        out: dict[str, np.ndarray],
        burn_frac: float = 0.3,
        method: str = "stepping_stone",
        normalise_prior: bool = True,
    ) -> float:
        """Marginal likelihood from this run's per-level draws (see
        ``diagnostics/evidence.py``). Requires ``PTConfig(beta_zero=True)`` so
        the ladder spans β ∈ [0, 1].

        The raw estimate is log Z(1) − log Z(0) with
        Z(β) = ∫ exp(-prior_nll) like(θ)^β dθ, i.e. the evidence against the
        NORMALISED (bound-truncated) prior — that is what a Bayes factor
        between fits sharing the prior wants, and it is the default. With
        ``normalise_prior=False`` the Gaussian prior mass
        (``log_prior_mass``) is added back, giving Z against the raw
        exp(-prior_nll) measure.
        """
        from ..diagnostics.evidence import (
            log_prior_mass,
            stepping_stone_log_evidence,
            thermodynamic_log_evidence,
        )

        betas = pt_betas(self.config)
        if betas.min() > 0:
            raise ValueError(
                "log_evidence needs PTConfig(beta_zero=True): the ladder "
                f"stops at beta={betas.min():.3g}, not 0"
            )
        e = out["sample_nll"]  # [S, T*W]
        s0 = int(e.shape[0] * burn_frac)
        e = e[s0:].reshape(e.shape[0] - s0, self.config.n_temps, self.n_walkers)
        fn = (
            stepping_stone_log_evidence
            if method == "stepping_stone"
            else thermodynamic_log_evidence
        )
        logz = float(fn(e, betas))
        if not normalise_prior:
            logz += log_prior_mass(self.model)
        return logz

    def cold_chain(self, out: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        """The β=1 (posterior) slice of a run's outputs."""
        w = self.n_walkers
        return {k: v[:, :w] if v.ndim >= 2 else v for k, v in out.items()}

    def online_rhat(self, recent: dict[str, np.ndarray]) -> np.ndarray:
        """Split R-hat over the COLD (β=1) walkers of a chunk's draws — the
        hot levels target different distributions and must not enter the
        convergence statistic."""
        from ..diagnostics.rhat import split_rhat

        return np.asarray(split_rhat(recent["theta"][:, : self.n_walkers]))

    @property
    def swap_acceptance(self) -> np.ndarray:
        """Per-boundary swap acceptance rate [T-1] — the ladder diagnostic
        (healthy replica exchange sits around 0.2-0.4 per boundary)."""
        att = np.maximum(np.asarray(self.state.swap_attempts) * self.n_walkers, 1)
        return np.asarray(self.state.swap_accepts) / att

    @property
    def acceptance_rate(self) -> np.ndarray:
        return np.asarray(self.state.n_accepted) / max(int(self.state.step), 1)
