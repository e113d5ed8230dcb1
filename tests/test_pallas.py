"""Fused Pallas reweight kernel vs the reference jnp path (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mach3_tpu.samples.binning import histogram
from mach3_tpu.splines.eval import eval_dense
from mach3_tpu.splines.monolith import SplineParamSpec, build_dense_table
from mach3_tpu.splines import pallas_reweight as pr


def _interpret_call(monkeypatch):
    """Force pallas_call into interpreter mode for CPU testing."""
    import functools

    from jax.experimental import pallas as pl

    orig = pl.pallas_call

    def patched(*args, **kwargs):
        kwargs.setdefault("interpret", True)
        return orig(*args, **kwargs)

    return patched


@pytest.fixture()
def interp(monkeypatch):
    from jax.experimental import pallas as pl

    monkeypatch.setattr(pl, "pallas_call", _interpret_call(monkeypatch))
    # clear the jit cache of the kernel wrapper so the patched call is traced
    pr.fused_reweight_histogram.clear_cache()
    yield
    pr.fused_reweight_histogram.clear_cache()


def _setup(n_events=300, n_chains=5, n_bins=13, seed=0):
    rng = np.random.default_rng(seed)
    specs = []
    for p, idx in enumerate([1, 3]):
        y = 1.0 + 0.1 * rng.normal(size=(n_events, 5)).cumsum(axis=1)
        specs.append(
            SplineParamSpec(
                name=f"p{p}",
                param_index=idx,
                x_knots=np.array([-2.0, -1.0, 0.0, 1.0, 2.0]),
                event_ids=np.arange(n_events),
                y_knots=y,
            )
        )
    table = build_dense_table(specs, n_events)
    base_w = jnp.asarray(rng.random((n_chains, n_events)), jnp.float32)
    bins = jnp.asarray(rng.integers(0, n_bins + 1, (n_chains, n_events)), jnp.int32)
    params = jnp.asarray(
        np.tile(np.zeros(5), (n_chains, 1)) + 0.3 * rng.normal(size=(n_chains, 5))
    )
    return table, base_w, bins, params, n_bins


def test_fused_kernel_matches_reference(interp):
    table, base_w, bins, params, n_bins = _setup()
    selector = pr.spline_selector(table, params)
    mc, w2 = pr.fused_reweight_histogram(
        selector, table.coeffs,
        base_w, bins, n_bins=n_bins, chain_tile=4, event_tile=128,
    )

    # Reference: per-chain eval_dense x base, then histogram
    def ref_one(p, bw, bb):
        w = eval_dense(table, p) * bw
        return histogram(w, bb, n_bins)

    mc_ref, w2_ref = jax.vmap(ref_one)(params, base_w, bins)
    assert np.allclose(np.asarray(mc), np.asarray(mc_ref), rtol=2e-5, atol=1e-5)
    assert np.allclose(np.asarray(w2), np.asarray(w2_ref), rtol=2e-5, atol=1e-5)


def test_fused_kernel_padding_correct(interp):
    """Non-tile-multiple C and E must give identical results (padding drops out)."""
    table, base_w, bins, params, n_bins = _setup(n_events=250, n_chains=3)
    selector = pr.spline_selector(table, params)
    coeffs = table.coeffs
    mc_a, _ = pr.fused_reweight_histogram(
        selector, coeffs, base_w, bins, n_bins=n_bins, chain_tile=4, event_tile=128
    )
    mc_b, _ = pr.fused_reweight_histogram(
        selector, coeffs, base_w, bins, n_bins=n_bins, chain_tile=2, event_tile=64
    )
    assert np.allclose(np.asarray(mc_a), np.asarray(mc_b), rtol=2e-5)


def test_out_of_range_bins_dropped(interp):
    table, base_w, bins, params, n_bins = _setup()
    # all bins out of range -> empty histograms
    bins_oob = jnp.full_like(bins, n_bins)
    selector = pr.spline_selector(table, params)
    coeffs = table.coeffs
    mc, w2 = pr.fused_reweight_histogram(
        selector, coeffs, base_w, bins_oob, n_bins=n_bins, chain_tile=4, event_tile=128
    )
    assert np.all(np.asarray(mc) == 0)
    assert np.all(np.asarray(w2) == 0)


def test_fused_maskreduce_and_blockdiag_agree(interp):
    """Both per-chain-bins histogram algorithms equal the XLA path."""
    table, base_w, bins, params, n_bins = _setup()
    coeffs = table.coeffs
    sel = pr.spline_selector(table, params)
    resp = jax.vmap(lambda p: eval_dense(table, p))(params)
    w = base_w * resp
    mc_r = jax.vmap(lambda wi, bi: histogram(wi, bi, n_bins)[0])(w, bins)
    for hist in ("maskreduce", "blockdiag"):
        mc_k, w2_k = pr.fused_reweight_histogram(
            sel, coeffs, base_w, bins, n_bins=n_bins,
            chain_tile=4, event_tile=128, hist=hist,
        )
        np.testing.assert_allclose(
            np.asarray(mc_k), np.asarray(mc_r), rtol=2e-5, atol=1e-5,
            err_msg=hist,
        )
    pr.fused_reweight_histogram.clear_cache()


def test_fused_shared_bins_matches_xla(interp):
    """Shared-bins kernel (chain-invariant bins, single-matmul histogram)
    equals the per-chain radix kernel and the XLA path."""
    table, base_w, _, params, n_bins = _setup()
    rng = np.random.default_rng(42)
    bins1d = jnp.asarray(rng.integers(0, n_bins + 1, base_w.shape[1]), jnp.int32)

    mc_k, w2_k = pr.fused_reweight_histogram_shared(
        pr.spline_selector(table, params),
        table.coeffs,
        base_w,
        bins1d,
        n_bins=n_bins,
        chain_tile=4,
        event_tile=128,
    )
    # XLA reference
    resp = jax.vmap(lambda p: eval_dense(table, p))(params)
    w = base_w * resp
    bins_b = jnp.tile(bins1d[None, :], (base_w.shape[0], 1))
    mc_r = jax.vmap(lambda wi, bi: histogram(wi, bi, n_bins)[0])(w, bins_b)
    w2_r = jax.vmap(lambda wi, bi: histogram(wi, bi, n_bins)[1])(w, bins_b)
    np.testing.assert_allclose(np.asarray(mc_k), np.asarray(mc_r), rtol=2e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(w2_k), np.asarray(w2_r), rtol=2e-5, atol=1e-5)
    pr.fused_reweight_histogram_shared.clear_cache()


def test_shared_blocked_matches_unrolled(interp):
    """Param-blocked shared-bins kernel (reference-scale P, streamed
    coefficient blocks + VMEM product scratch) equals the unrolled kernel and
    the XLA path — including with P not a multiple of the param tile."""
    rng = np.random.default_rng(21)
    n_events, n_chains, n_bins, n_params = 300, 5, 40, 19  # 19 % 8 != 0
    specs = []
    for p in range(n_params):
        y = 1.0 + 0.05 * rng.normal(size=(n_events, 5)).cumsum(axis=1)
        specs.append(
            SplineParamSpec(
                name=f"p{p}",
                param_index=p,
                x_knots=np.array([-2.0, -1.0, 0.0, 1.0, 2.0]),
                event_ids=np.arange(n_events),
                y_knots=y,
            )
        )
    table = build_dense_table(specs, n_events)
    base_w = jnp.asarray(rng.random((n_chains, n_events)), jnp.float32)
    bins1d = jnp.asarray(rng.integers(0, n_bins + 1, n_events), jnp.int32)
    params = jnp.asarray(0.3 * rng.normal(size=(n_chains, n_params)))

    sel = pr.spline_selector(table, params)
    coeffs = table.coeffs
    mc_u, w2_u = pr.fused_reweight_histogram_shared(
        sel, coeffs, base_w, bins1d, n_bins=n_bins, chain_tile=4, event_tile=128
    )
    mc_b, w2_b = pr.fused_reweight_histogram_shared(
        sel, coeffs, base_w, bins1d, n_bins=n_bins, chain_tile=4,
        event_tile=128, param_tile=8,
    )
    np.testing.assert_allclose(np.asarray(mc_b), np.asarray(mc_u), rtol=2e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(w2_b), np.asarray(w2_u), rtol=2e-5, atol=1e-5)
    # XLA reference
    resp = jax.vmap(lambda p: eval_dense(table, p))(params)
    w = base_w * resp
    bins_b = jnp.tile(bins1d[None, :], (n_chains, 1))
    mc_r = jax.vmap(lambda wi, bi: histogram(wi, bi, n_bins)[0])(w, bins_b)
    np.testing.assert_allclose(np.asarray(mc_b), np.asarray(mc_r), rtol=2e-5, atol=1e-5)
    pr.fused_reweight_histogram_shared.clear_cache()


def test_shared_in_kernel_norm_matches_xla(interp):
    """Shared-bins kernels (unrolled AND param-blocked) with the in-kernel
    log-matmul norm product equal the XLA norm x kernel-without-norm path,
    including negative parameter values (sign via parity count)."""
    table, base_w, _, params, n_bins = _setup()
    rng = np.random.default_rng(17)
    n_chains, n_events = base_w.shape
    bins1d = jnp.asarray(rng.integers(0, n_bins + 1, n_events), jnp.int32)
    npp1 = params.shape[1] + 1
    # random match counts: each event matched to 0-2 norm params
    s = np.zeros((npp1, n_events), np.float32)
    for e in range(n_events):
        for idx in rng.choice(npp1 - 1, size=rng.integers(0, 3), replace=False):
            s[idx, e] += 1.0
    norm_s = jnp.asarray(s)
    vals = params.at[:, 2].set(-0.7)  # negative norm value: sign must survive
    norm_ext = jnp.concatenate(
        [vals.astype(jnp.float32), jnp.ones((n_chains, 1), jnp.float32)], axis=1
    )
    sel = pr.spline_selector(table, params)
    coeffs = table.coeffs

    # XLA reference: norm product outside, kernel without norm
    norm_w = jnp.exp(
        jnp.log(jnp.maximum(jnp.abs(norm_ext), 1e-30)) @ norm_s
    ) * jnp.where(((norm_ext < 0).astype(jnp.float32) @ norm_s) % 2 >= 1, -1.0, 1.0)
    mc_r, w2_r = pr.fused_reweight_histogram_shared(
        sel, coeffs, base_w * norm_w, bins1d, n_bins=n_bins,
        chain_tile=4, event_tile=128,
    )
    for pt in (None, 1):
        mc_k, w2_k = pr.fused_reweight_histogram_shared(
            sel, coeffs, base_w, bins1d, n_bins=n_bins,
            chain_tile=4, event_tile=128, param_tile=pt,
            norm_ext=norm_ext, norm_s=norm_s,
        )
        np.testing.assert_allclose(
            np.asarray(mc_k), np.asarray(mc_r), rtol=5e-5, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(w2_k), np.asarray(w2_r), rtol=5e-5, atol=1e-5
        )
    pr.fused_reweight_histogram_shared.clear_cache()


def test_shifted_blocked_matches_unrolled(interp):
    """Param-blocked SHIFTED kernel (streamed coefficients + in-kernel
    shifted binning + in-kernel norm product) equals the unrolled shifted
    kernel and the XLA path at P not a multiple of the tile."""
    rng = np.random.default_rng(31)
    n_events, n_chains, n_params = 260, 3, 21
    specs = []
    for p in range(n_params):
        y = 1.0 + 0.04 * rng.normal(size=(n_events, 5)).cumsum(axis=1)
        specs.append(
            SplineParamSpec(
                name=f"p{p}", param_index=p,
                x_knots=np.array([-2.0, -1.0, 0.0, 1.0, 2.0]),
                event_ids=np.arange(n_events), y_knots=y,
            )
        )
    table = build_dense_table(specs, n_events)
    base_w = jnp.asarray(rng.random((n_chains, n_events)), jnp.float32)
    params = jnp.asarray(0.2 * rng.normal(size=(n_chains, n_params)))
    x_nom = jnp.asarray(rng.uniform(0.1, 1.9, n_events), jnp.float32)
    static_base = jnp.zeros((n_events,), jnp.int32)
    edges = tuple(np.linspace(0.0, 2.0, 9))
    shift_vals = jnp.asarray(0.05 * rng.normal(size=n_chains), jnp.float32)

    def shift_fn(v, x):
        return x * (1.0 + v)

    sel = pr.spline_selector(table, params)
    coeffs = table.coeffs
    kwargs = dict(
        n_bins=8, shift_fn=shift_fn, edges=edges, stride_j=1, n_axis_j=8,
        chain_tile=2, event_tile=128,
    )
    mc_u, w2_u = pr.fused_reweight_histogram_shifted(
        sel, coeffs, base_w, shift_vals, x_nom, static_base, **kwargs
    )
    mc_b, w2_b = pr.fused_reweight_histogram_shifted(
        sel, coeffs, base_w, shift_vals, x_nom, static_base,
        param_tile=8, **kwargs,
    )
    np.testing.assert_allclose(np.asarray(mc_b), np.asarray(mc_u), rtol=2e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(w2_b), np.asarray(w2_u), rtol=2e-5, atol=1e-5)
    # XLA reference
    resp = jax.vmap(lambda p: eval_dense(table, p))(params)
    w = base_w * resp
    shifted_x = jax.vmap(lambda v: shift_fn(v, x_nom))(shift_vals)  # [C, E]
    bins = np.digitize(np.asarray(shifted_x), np.asarray(edges)) - 1
    bins = np.where((bins >= 0) & (bins < 8), bins, 8)
    mc_r = jax.vmap(lambda wi, bi: histogram(wi, jnp.asarray(bi), 8)[0])(
        w, jnp.asarray(bins, jnp.int32)
    )
    np.testing.assert_allclose(np.asarray(mc_b), np.asarray(mc_r), rtol=2e-5, atol=1e-5)
    pr.fused_reweight_histogram_shifted.clear_cache()


def test_static_bins_paths_agree():
    """A shift-free sample gets a precomputed static_bins map from
    build_sample_model and reweights identically to the dynamic path; the
    toy (which has an e-scale shift) must NOT get one."""
    from mach3_tpu.samples.events import EventData, build_sample_model
    from mach3_tpu.tutorial.toy import build_toy

    toy = build_toy(n_events=400, seed=6)
    assert toy.samples[0].static_bins is None  # e-scale shift -> dynamic bins

    rng = np.random.default_rng(4)
    n = 500
    ev = EventData(
        kinematics={"x": rng.normal(1.0, 0.4, n)},
        mode=np.zeros(n, np.int32),
        target=np.full(n, 12, np.int32),
        pdg=np.full(n, 14, np.int32),
        preosc_pdg=np.full(n, 14, np.int32),
        mc_weight=np.full(n, 0.5),
    )
    s = build_sample_model(
        "s", ev, var_order=["x"], binning_edges=[np.linspace(0, 2, 9)],
        binning_vars=["x"], n_total_params=3,
        norm_idx=np.zeros((n, 1), np.int64),
    )
    assert s.static_bins is not None
    theta = jnp.asarray([1.1, 0.9, 1.0])
    mc_s, w2_s = s.reweight(theta)
    s_dyn = s.replace(static_bins=None)
    mc_d, w2_d = s_dyn.reweight(theta)
    np.testing.assert_allclose(np.asarray(mc_s), np.asarray(mc_d), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(w2_s), np.asarray(w2_d), rtol=1e-6)


def test_kernel_shift_binning_matches_xla(interp):
    """In-kernel shifted binning (baked edges + per-chain searchsorted) equals
    the XLA find_bins path on the toy (which has the e-scale shift)."""
    from mach3_tpu.tutorial.toy import build_toy

    toy = build_toy(n_events=600, seed=12, use_pallas=True)
    s = toy.samples[0]
    assert s.kernel_shift is not None and s.shift_static_base is not None
    rng = np.random.default_rng(0)
    thetas = jnp.asarray(
        np.tile(np.asarray(toy.model.prefit_vector()), (4, 1))
        + 0.05 * rng.normal(size=(4, toy.model.n_params))
    )
    mc_k, w2_k = s.reweight_batch(thetas)
    s_xla = s.replace(use_pallas=False)
    mc_r, w2_r = s_xla.reweight_batch(thetas)
    np.testing.assert_allclose(np.asarray(mc_k), np.asarray(mc_r), rtol=2e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(w2_k), np.asarray(w2_r), rtol=2e-4, atol=1e-4)


def test_in_kernel_norm_with_negative_values(interp):
    """The in-kernel log-matmul norm product handles negative and zero norm
    parameter values (sign via match-count parity) identically to the XLA
    one-hot-product path."""
    from mach3_tpu.tutorial.toy import build_toy

    toy = build_toy(n_events=500, seed=13, use_pallas=True)
    s = toy.samples[0]
    assert s.norm_s is not None and s.kernel_shift is not None
    theta = np.asarray(toy.model.prefit_vector())
    thetas = np.tile(theta, (3, 1))
    # Chain 1: make one matched norm parameter negative; chain 2: zero.
    thetas[1, 0] = -0.7
    thetas[2, 0] = 0.0
    thetas = jnp.asarray(thetas)
    mc_k, _ = s.reweight_batch(thetas)
    mc_r, _ = s.replace(use_pallas=False).reweight_batch(thetas)
    np.testing.assert_allclose(np.asarray(mc_k), np.asarray(mc_r), rtol=2e-4, atol=1e-3)


def test_sorted_planned_kernel_matches_wide(interp):
    """Bin-sorted narrow-histogram + activity-planned blocks (r4): the
    sorted kernel with per-tile bin windows and per-tile active coefficient
    blocks must reproduce the wide param-blocked kernel exactly. Events are
    clustered by activity signature then bin; one parameter group per
    event subset mirrors mode-filtered systematics."""
    from mach3_tpu.splines.monolith import dense_table_activity

    rng = np.random.default_rng(3)
    E, P, NB, ET, PT, C = 3000, 9, 300, 512, 3, 5
    groups = rng.integers(0, 3, E)
    specs = []
    for p in range(P):
        ev = np.nonzero(groups == (p % 3))[0]
        y = 1.0 + 0.1 * rng.normal(size=(len(ev), 5)).cumsum(axis=1)
        specs.append(SplineParamSpec(
            name=f"p{p}", param_index=p,
            x_knots=np.array([-2.0, -1.0, 0.0, 1.0, 2.0]),
            event_ids=ev, y_knots=y,
        ))
    table = build_dense_table(specs, E)
    act = dense_table_activity(table)
    pperm = pr.param_block_order(act)
    act = act[pperm]
    jp = jnp.asarray(pperm)
    table = table.replace(
        coeffs=jnp.take(table.coeffs, jp, axis=0),
        knots_x=jnp.take(table.knots_x, jp, axis=0),
        n_knots=jnp.take(table.n_knots, jp, axis=0),
        param_index=jnp.take(table.param_index, jp, axis=0),
    )
    bins_np = (groups * 90 + rng.integers(0, 95, E)).astype(np.int32)
    bins_np[rng.random(E) < 0.01] = NB  # out-of-range events stay dropped
    sig = pr.event_block_signature(act, PT)
    eperm = np.lexsort((bins_np, sig))
    act = act[:, eperm]
    bins_np = bins_np[eperm]
    table = table.replace(coeffs=jnp.take(table.coeffs, jnp.asarray(eperm), axis=2))
    params = jnp.asarray(0.4 * rng.normal(size=(C, P + 1)))
    sel = pr.spline_selector(table, params)
    co = table.coeffs
    bw = jnp.asarray(rng.random((C, E)), jnp.float32)
    starts, nbl = pr.hist_tile_plan(bins_np, NB, ET)
    bplan, bnact = pr.param_block_plan(act, ET, PT)
    assert bplan.shape[1] < -(-P // PT)  # the plan actually skips blocks
    assert nbl < -(-(NB + 1) // 128) * 128  # the window actually narrows

    ref = pr.fused_reweight_histogram_shared(
        sel, co, bw, jnp.asarray(bins_np), n_bins=NB,
        chain_tile=4, event_tile=ET, param_tile=PT,
    )
    pr.fused_reweight_histogram_shared.clear_cache()
    out = pr.fused_reweight_histogram_shared(
        sel, co, bw, jnp.asarray(bins_np), n_bins=NB,
        chain_tile=4, event_tile=ET, param_tile=PT,
        tile_starts=jnp.asarray(starts), nbl=int(nbl),
        block_plan=jnp.asarray(bplan), block_nact=jnp.asarray(bnact),
    )
    np.testing.assert_allclose(np.asarray(ref[0]), np.asarray(out[0]),
                               rtol=2e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ref[1]), np.asarray(out[1]),
                               rtol=2e-5, atol=1e-5)


def test_sorted_kernel_chain_blocking(interp):
    """Large chain counts must TILE the chain axis of the sorted kernel
    (grid chain blocks), not silently fall back to the wide kernel — the
    r4 1024-chain regression (scaling 0.707x vs 256) was exactly that
    fallback. A shrunken vmem_budget forces multiple chain blocks here."""
    rng = np.random.default_rng(5)
    E, P, NB, ET, PT, C = 2048, 6, 300, 512, 3, 300
    specs = []
    for p in range(P):
        ev = np.arange(E) if p % 2 == 0 else np.arange(E // 2)
        y = 1.0 + 0.05 * rng.normal(size=(len(ev), 5)).cumsum(axis=1)
        specs.append(SplineParamSpec(
            name=f"p{p}", param_index=p,
            x_knots=np.array([-2.0, -1.0, 0.0, 1.0, 2.0]),
            event_ids=ev, y_knots=y,
        ))
    table = build_dense_table(specs, E)
    bins_np = np.sort(rng.integers(0, NB, E)).astype(np.int32)
    params = jnp.asarray(0.3 * rng.normal(size=(C, P + 1)))
    sel = pr.spline_selector(table, params)
    bw = jnp.asarray(rng.random((C, E)), jnp.float32)
    starts, nbl = pr.hist_tile_plan(bins_np, NB, ET)

    ref = pr.fused_reweight_histogram_shared(
        sel, table.coeffs, bw, jnp.asarray(bins_np), n_bins=NB,
        chain_tile=4, event_tile=ET, param_tile=PT,
    )
    pr.fused_reweight_histogram_shared.clear_cache()
    # budget sized so one 128-chain block fits but 256 does not: the padded
    # 384-chain axis must run as 3 grid chain blocks
    out = pr.fused_reweight_histogram_shared(
        sel, table.coeffs, bw, jnp.asarray(bins_np), n_bins=NB,
        chain_tile=4, event_tile=ET, param_tile=PT,
        tile_starts=jnp.asarray(starts), nbl=int(nbl),
        vmem_budget=2_400_000,
    )
    np.testing.assert_allclose(np.asarray(ref[0]), np.asarray(out[0]),
                               rtol=2e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ref[1]), np.asarray(out[1]),
                               rtol=2e-5, atol=1e-5)
