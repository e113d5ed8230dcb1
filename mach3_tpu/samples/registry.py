"""Experiment registry.

The reference's extension point is C++ subclassing of ``SampleHandlerFD``
(experiments implement ``SetupExperimentMC``/``SetupFDMC``/...; pybind11
trampolines let Python subclasses do the same, ``python/samples.cpp:393-456``).

Here an *experiment* is a named builder function returning the model bundle;
registration makes it reachable from the CLI (``mach3-mcmc --experiment X``).
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Protocol

from ..core.exceptions import ConfigError


class ExperimentBundle(Protocol):
    """What a builder must return: anything exposing .model (FitModel),
    .samples, and .names — the tutorial's ToyExperiment is the template."""

    model: object
    samples: list
    names: list[str]


_REGISTRY: dict[str, Callable[..., ExperimentBundle]] = {}


def register_experiment(name: str):
    """Decorator: ``@register_experiment("my_exp")`` over a builder function
    taking keyword config arguments."""

    def wrap(fn: Callable[..., ExperimentBundle]):
        if name in _REGISTRY:
            raise ConfigError(f"Experiment '{name}' already registered")
        _REGISTRY[name] = fn
        return fn

    return wrap


def build_experiment(name: str, **kwargs) -> ExperimentBundle:
    if name not in _REGISTRY:
        raise ConfigError(
            f"Unknown experiment '{name}' (registered: {', '.join(sorted(_REGISTRY)) or 'none'})"
        )
    return _REGISTRY[name](**kwargs)


def list_experiments() -> list[str]:
    return sorted(_REGISTRY)


# Register the in-repo tutorial toy.
def _register_builtin():
    from ..tutorial.toy import build_toy

    if "toy" not in _REGISTRY:
        _REGISTRY["toy"] = lambda **kw: build_toy(**kw)


_register_builtin()
