"""Native columnar IO: round-trips, CSV ingestion, native/fallback agreement."""
import numpy as np
import pytest

from mach3_tpu.core import nativeio


@pytest.fixture(scope="module")
def sample_columns():
    rng = np.random.default_rng(0)
    return {
        "e_true": rng.gamma(3.0, 0.25, 1000).astype(np.float64),
        "e_reco": rng.gamma(3.0, 0.25, 1000).astype(np.float32),
        "mode": rng.integers(0, 4, 1000).astype(np.int32),
    }


def test_round_trip(tmp_path, sample_columns):
    p = str(tmp_path / "events.m3ev")
    nativeio.write_events(p, sample_columns)
    back = nativeio.read_events(p)
    assert set(back) == set(sample_columns)
    for k in sample_columns:
        assert back[k].dtype == sample_columns[k].dtype
        assert np.array_equal(back[k], sample_columns[k])


def test_native_and_fallback_formats_identical(tmp_path, sample_columns):
    """Bytes written by the native library and the numpy fallback must match."""
    p_native = str(tmp_path / "native.m3ev")
    p_py = str(tmp_path / "py.m3ev")
    lib = nativeio._load_library()
    nativeio.write_events(p_native, sample_columns)
    # force the fallback
    saved, nativeio._lib = nativeio._lib, None
    saved_tried, nativeio._lib_tried = nativeio._lib_tried, True
    try:
        nativeio.write_events(p_py, sample_columns)
        back_py = nativeio.read_events(p_py)
    finally:
        nativeio._lib, nativeio._lib_tried = saved, saved_tried
    with open(p_native, "rb") as f1, open(p_py, "rb") as f2:
        b1, b2 = f1.read(), f2.read()
    if lib is not None:
        assert b1 == b2
    back_native = nativeio.read_events(p_native)
    for k in sample_columns:
        assert np.array_equal(back_native[k], back_py[k])


def test_csv_parse(tmp_path):
    p = str(tmp_path / "events.csv")
    rng = np.random.default_rng(1)
    data = rng.normal(size=(500, 3))
    with open(p, "w") as f:
        f.write("a,b,c\n")
        for row in data:
            f.write(",".join(f"{v:.17g}" for v in row) + "\n")
    cols = nativeio.parse_csv(p, ["a", "b", "c"])
    assert len(cols["a"]) == 500
    for i, n in enumerate(["a", "b", "c"]):
        assert np.allclose(cols[n], data[:, i], rtol=1e-15)


def test_bad_magic_raises(tmp_path):
    p = str(tmp_path / "junk.m3ev")
    with open(p, "wb") as f:
        f.write(b"NOTMAGIC" + b"\0" * 100)
    with pytest.raises(OSError):
        nativeio.read_events(p)


def test_empty_columns_rejected(tmp_path):
    with pytest.raises(ValueError):
        nativeio.write_events(
            str(tmp_path / "x.m3ev"), {"a": np.zeros((2, 2))}
        )


def test_stale_library_rebuilt_from_source():
    """A libm3io.so older than m3io.cpp is rebuilt on load (the binary is
    never committed; the library is always a build product)."""
    import os
    import shutil

    if shutil.which("make") is None or shutil.which("g++") is None:
        pytest.skip("no native toolchain")
    d = nativeio._native_dir()
    so = os.path.join(d, "libm3io.so")
    src = os.path.join(d, "m3io.cpp")
    nativeio._lib, nativeio._lib_tried = None, False
    assert nativeio._load_library() is not None  # builds if missing
    os.utime(src, None)  # source now newer than the binary
    assert os.path.getmtime(src) > os.path.getmtime(so)
    nativeio._lib, nativeio._lib_tried = None, False
    assert nativeio._load_library() is not None
    assert os.path.getmtime(so) >= os.path.getmtime(src)  # rebuilt
