"""System introspection, banners, and progress reporting.

TPU-native equivalent of ``Manager/Monitor.h/.cpp``: welcome banner,
CPU/RAM/OS/device introspection, progress bar, and per-process resource usage.
GPU VRAM queries (``gpuUtils.cu``) become JAX device memory stats.
"""
from __future__ import annotations

import os
import platform
import sys
import time

from .. import __version__
from .logging import get_logger

_log = get_logger("monitor")


def get_cpu_info() -> dict[str, str]:
    info = {"machine": platform.machine(), "processor": platform.processor() or "unknown"}
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("model name"):
                    info["model"] = line.split(":", 1)[1].strip()
                    break
    except OSError:
        pass
    info["count"] = str(os.cpu_count())
    return info


def get_memory_info() -> dict[str, float]:
    out = {}
    try:
        with open("/proc/meminfo") as f:
            for line in f:
                key, val = line.split(":", 1)
                if key in ("MemTotal", "MemAvailable"):
                    out[key] = float(val.strip().split()[0]) / 1e6  # GB
    except OSError:
        pass
    return out


def get_device_info() -> list[dict]:
    """JAX device inventory + memory stats (replaces ``checkGpuMem``)."""
    import jax

    devices = []
    for d in jax.devices():
        entry = {"id": d.id, "platform": d.platform, "kind": d.device_kind}
        try:
            stats = d.memory_stats()
            if stats:
                entry["bytes_in_use"] = stats.get("bytes_in_use", 0)
                entry["bytes_limit"] = stats.get("bytes_limit", 0)
        except Exception:
            pass
        devices.append(entry)
    return devices


def welcome() -> None:
    """``MaCh3Welcome``: banner + system summary at startup."""
    cpu = get_cpu_info()
    mem = get_memory_info()
    _log.info("mach3_tpu %s  (python %s, %s)", __version__, sys.version.split()[0], platform.platform())
    _log.info("CPU: %s x%s", cpu.get("model", cpu["processor"]), cpu["count"])
    if mem:
        _log.info("RAM: %.1f GB total, %.1f GB available", mem.get("MemTotal", 0), mem.get("MemAvailable", 0))
    for d in get_device_info():
        extra = ""
        if "bytes_limit" in d and d["bytes_limit"]:
            extra = f" ({d['bytes_in_use'] / 1e9:.2f}/{d['bytes_limit'] / 1e9:.2f} GB)"
        _log.info("Device %d: %s %s%s", d["id"], d["platform"], d["kind"], extra)


class ProgressBar:
    """Step-loop progress reporting (``PrintProgressBar`` + the per-10%%
    acceptance printout of ``MCMCBase.cpp:96-100``)."""

    def __init__(self, total: int, label: str = "MCMC", every: float = 0.1):
        self.total = total
        self.label = label
        self.every = max(1, int(total * every))
        self.start = time.perf_counter()

    def update(self, done: int, **stats: float) -> None:
        if done % self.every and done != self.total:
            return
        elapsed = time.perf_counter() - self.start
        rate = done / max(elapsed, 1e-9)
        extra = "  ".join(f"{k} {v:.3g}" for k, v in stats.items())
        _log.info(
            "%s %d/%d (%.0f%%)  %.1f steps/s  %s",
            self.label,
            done,
            self.total,
            100.0 * done / self.total,
            rate,
            extra,
        )
