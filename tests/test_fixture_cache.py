"""Fixture disk cache: round-trip, invalidation, fallback (core/fixture_cache)."""
import numpy as np
import pytest

from mach3_tpu.core import fixture_cache as fc


def test_round_trip_and_hit_counting(tmp_path):
    calls = []

    def build():
        calls.append(1)
        return {"a": np.arange(5), "name": "x"}

    a = fc.load_or_build("t", build, cache_dir=str(tmp_path), enabled=True)
    b = fc.load_or_build("t", build, cache_dir=str(tmp_path), enabled=True)
    assert len(calls) == 1
    np.testing.assert_array_equal(a["a"], b["a"])


def test_kwargs_key_separates_entries(tmp_path):
    n1 = fc.load_or_build(
        "t", lambda: 1, cache_dir=str(tmp_path), kwargs={"n": 1}, enabled=True
    )
    n2 = fc.load_or_build(
        "t", lambda: 2, cache_dir=str(tmp_path), kwargs={"n": 2}, enabled=True
    )
    assert (n1, n2) == (1, 2)


def test_validation_failure_rebuilds(tmp_path):
    fc.load_or_build("t", lambda: {"v": 1}, cache_dir=str(tmp_path), enabled=True)
    out = fc.load_or_build(
        "t",
        lambda: {"v": 2},
        cache_dir=str(tmp_path),
        validate=lambda o: o["v"] == 2,
        enabled=True,
    )
    assert out["v"] == 2
    # the rebuilt entry overwrote the stale one
    again = fc.load_or_build(
        "t", lambda: {"v": 3}, cache_dir=str(tmp_path),
        validate=lambda o: o["v"] == 2, enabled=True,
    )
    assert again["v"] == 2


def test_corrupt_entry_falls_back(tmp_path):
    fc.load_or_build("t", lambda: 1, cache_dir=str(tmp_path), enabled=True)
    for p in tmp_path.iterdir():
        p.write_bytes(b"not a pickle")
    assert fc.load_or_build("t", lambda: 7, cache_dir=str(tmp_path), enabled=True) == 7


def test_disabled_always_builds(tmp_path):
    calls = []

    def build():
        calls.append(1)
        return 1

    fc.load_or_build("t", build, cache_dir=str(tmp_path), enabled=False)
    fc.load_or_build("t", build, cache_dir=str(tmp_path), enabled=False)
    assert len(calls) == 2


def test_fingerprint_is_stable():
    assert fc.source_fingerprint() == fc.source_fingerprint()
    assert len(fc.source_fingerprint()) == 8


def test_cached_model_evaluates_identically(tmp_path):
    """A real (small) fixture round-trips with identical NLL on CPU."""
    jax = pytest.importorskip("jax")
    import jax.numpy as jnp

    from mach3_tpu.tutorial.toy import build_toy

    def build():
        return build_toy(n_events=500, seed=3, e_grid_size=20, use_pallas=False)

    toy1 = fc.load_or_build("toy-small", build, cache_dir=str(tmp_path), enabled=True)
    toy2 = fc.load_or_build("toy-small", build, cache_dir=str(tmp_path), enabled=True)
    th = jnp.asarray(np.asarray(toy1.model.prefit_vector()))[None, :]
    a = jax.jit(lambda m, t: m.total_nll_batch(t))(toy1.model, th)
    b = jax.jit(lambda m, t: m.total_nll_batch(t))(toy2.model, th)
    assert float(a[0]) == pytest.approx(float(b[0]), rel=0, abs=0)
