"""Config-driven experiment construction: YAML -> FitModel.

TPU-native equivalent of the reference's experiment-definition pipeline
(``Samples/SampleHandlerFD.cpp:169-202``: ``ReadConfig -> SetupExperimentMC ->
SetBinning -> SetupSplines -> SetupNormParameters -> ...`` driven by per-sample
YAML configs, plus the covariance/sample factories of
``Fitters/MaCh3Factory.h:69-157``). Where the reference requires an experiment
C++ subclass for MC loading and functional parameters, here an experiment is
fully declarative: event columns come from ``.npz`` / ``.csv`` / ``.m3evt``
(native mmap IO) files and functional shifts are picked from a registry of
named pure functions (extensible via :func:`register_shift`).

Schema (all under one ``Experiment`` key; see ``tests/test_experiment.py``):

.. code-block:: yaml

    Experiment:
      Systematics:
        - File: xsec.yaml          # ParameterSet YAML (reference schema)
        - File: osc.yaml
      Samples:
        - Name: numu_sample
          MCFile: numu.npz         # columns: kinematics + mode/target/pdg/...
          VarOrder: [e_true, e_reco]
          Binning:
            Vars: [e_reco]
            Edges: [[0.0, 0.25, 0.5, 1.0, 3.0]]   # or Uniform / NonUniformBins
          Oscillation:             # optional
            EGrid: {Low: 0.05, High: 10.0, N: 200, Log: true}
            Baseline: 295.0
            Density: 2.6
            NCModes: [3]
          SplineFile: numu_splines.npz  # optional: <name>:knots/:event_ids/:y
          TF1File: numu_tf1.npz         # optional: <name>:event_ids/:slope/:intercept
          Shifts:
            - {Function: scale, Parameter: EScale, Var: e_reco}
          TestStatistic: BarlowBeeston
      Data: Asimov               # or per-sample DataFile
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Mapping, Sequence

import jax.numpy as jnp
import numpy as np

from ..core.config import Config
from ..core.exceptions import ConfigError
from ..core.logging import get_logger
from ..fitters.model import FitModel
from ..params.parameterset import ParameterSet, ParamType
from ..splines.monolith import SplineParamSpec, build_dense_table
from ..splines.tf1 import TF1ParamSpec, build_tf1_table
from .binning import NonUniformBinning
from .events import (
    EventData,
    build_osc_config,
    build_sample_model,
    match_norm_params,
)
from .sample import SampleModel, ShiftSpec
from .teststats import TestStatistic

_log = get_logger("experiment")

#: Named functional shifts (the reference's ``RegisterFunctionalParameters``
#: callbacks, ``SampleHandlerFD.cpp:465-564``) — pure (value, x, kin) -> x'.
_SHIFT_REGISTRY: dict[str, Callable] = {
    "scale": lambda v, x, kin: x * (1.0 + v),
    "offset": lambda v, x, kin: x + v,
    "scale_about_one": lambda v, x, kin: 1.0 + (x - 1.0) * (1.0 + v),
}


def register_shift(name: str, fn: Callable) -> None:
    """Register a named functional shift for use in experiment YAMLs."""
    _SHIFT_REGISTRY[name] = fn


def _res_scale_weight(v, x, kin, true_var=0, sigma_frac=0.1):
    """Resolution-scale weight: the ratio of smearing kernels
    N(x; x_true, (1+v)·σ) / N(x; x_true, σ) with σ = sigma_frac · x_true.
    Scales the detector resolution by (1+v) WITHOUT moving events — the
    weight-valued form of a resolution systematic (routine in real T2K/DUNE
    configs; the reference implements these as ``FuncParFuncType`` weight
    callbacks, ``SampleHandlerFD.cpp:465-564``)."""
    xt = kin[true_var]
    s = sigma_frac * jnp.maximum(xt, 1e-6)
    z = (x - xt) / s
    r = 1.0 + v
    return jnp.exp(0.5 * z * z * (1.0 - 1.0 / (r * r))) / r


#: Weight-valued functional parameters (the other half of the reference's
#: ``FuncParFuncType`` callbacks): pure ``(value, x, kin, **args) -> w [E]``.
#: ``x`` is the YAML-selected kinematic row; Args values naming a kinematic
#: variable are resolved to row indices at build time.
_WEIGHT_REGISTRY: dict[str, Callable] = {
    "linear_weight": lambda v, x, kin: 1.0 + v * x,
    "scale_weight": lambda v, x, kin: (1.0 + v) * jnp.ones_like(x),
    "res_scale_weight": _res_scale_weight,
}


def register_weight_fn(name: str, fn: Callable) -> None:
    """Register a named weight-valued functional response for experiment
    YAMLs: ``fn(value, x [E], kin [V, E], **args) -> weight [E]``."""
    _WEIGHT_REGISTRY[name] = fn


@dataclasses.dataclass
class Experiment:
    model: FitModel
    param_sets: list[ParameterSet]
    samples: list[SampleModel]
    config: Config


def _load_columns(path: str) -> dict[str, np.ndarray]:
    if path.endswith(".npz"):
        with np.load(path, allow_pickle=False) as f:
            return {k: np.asarray(f[k]) for k in f.files}
    if path.endswith(".csv"):
        from ..core.nativeio import parse_csv

        with open(path) as f:
            header = f.readline().strip().split(",")
        return parse_csv(path, header)
    if path.endswith(".m3evt"):
        from ..core.nativeio import read_events

        return read_events(path)
    raise ConfigError(f"Unknown MC file format: {path} (.npz/.csv/.m3evt)")


def _event_data(columns: Mapping[str, np.ndarray]) -> EventData:
    special = {"mode", "target", "pdg", "preosc_pdg", "mc_weight"}
    missing = special - set(columns)
    if missing:
        raise ConfigError(f"MC file missing required columns: {sorted(missing)}")
    kin = {k: np.asarray(v, np.float64) for k, v in columns.items() if k not in special}
    if not kin:
        raise ConfigError("MC file has no kinematic columns")
    return EventData(
        kinematics=kin,
        mode=np.asarray(columns["mode"], np.int32),
        target=np.asarray(columns["target"], np.int32),
        pdg=np.asarray(columns["pdg"], np.int32),
        preosc_pdg=np.asarray(columns["preosc_pdg"], np.int32),
        mc_weight=np.asarray(columns["mc_weight"], np.float64),
    )


def _binning_edges(bcfg: Config) -> list[np.ndarray]:
    if bcfg.has("Edges"):
        return [np.asarray(e, np.float64) for e in bcfg.get("Edges")]
    if bcfg.has("Uniform"):
        out = []
        for u in bcfg.get("Uniform"):
            u = Config(u)
            out.append(
                np.linspace(float(u.get("Low")), float(u.get("High")), int(u.get("N")) + 1)
            )
        return out
    raise ConfigError("Binning needs Edges, Uniform, or NonUniformBins")


def _spline_table(path: str, metas, events: EventData, param_index: Mapping[str, int]):
    """Spline file: per spline-param arrays ``<name>:knots`` [K],
    ``<name>:event_ids`` [S], ``<name>:y`` [S, K] (the reference's
    per-sample spline files keyed by systematic name,
    ``Splines/BinnedSplineHandler.cpp`` token scheme simplified)."""
    with np.load(path, allow_pickle=False) as f:
        keys = set(f.files)
        specs = []
        for meta in metas:
            base = meta.spline_name or meta.name
            if f"{base}:knots" not in keys:
                continue
            specs.append(
                SplineParamSpec(
                    name=meta.name,
                    param_index=param_index[meta.name],
                    x_knots=np.asarray(f[f"{base}:knots"], np.float64),
                    event_ids=np.asarray(f[f"{base}:event_ids"], np.int64),
                    y_knots=np.asarray(f[f"{base}:y"], np.float64),
                    interpolation=meta.spline_interpolation,
                    knot_low=meta.spline_knot_low,
                    knot_high=meta.spline_knot_high,
                )
            )
    if not specs:
        raise ConfigError(f"{path}: no spline arrays match any spline systematic")
    return build_dense_table(specs, events.n_events)


def _tf1_table(path: str, metas, events: EventData, param_index: Mapping[str, int]):
    with np.load(path, allow_pickle=False) as f:
        keys = set(f.files)
        specs = []
        for meta in metas:
            if f"{meta.name}:event_ids" not in keys:
                continue
            specs.append(
                TF1ParamSpec(
                    name=meta.name,
                    param_index=param_index[meta.name],
                    event_ids=np.asarray(f[f"{meta.name}:event_ids"], np.int64),
                    slope=np.asarray(f[f"{meta.name}:slope"], np.float64),
                    intercept=np.asarray(f[f"{meta.name}:intercept"], np.float64),
                )
            )
    if not specs:
        raise ConfigError(f"{path}: no TF1 arrays match any functional systematic")
    return build_tf1_table(specs, events.n_events)


def build_experiment(cfg: Config, use_pallas: bool | str = "auto") -> Experiment:
    """Build the full fit model from an ``Experiment`` config tree."""
    exp = cfg.sub("Experiment") if cfg.has("Experiment") else cfg

    # ---------------------------------------------------------- parameters
    param_sets: list[ParameterSet] = []
    for i, entry in enumerate(exp.get("Systematics")):
        entry = Config(entry)
        if entry.has("File"):
            pcfg = Config.from_file(entry.get("File"))
        else:
            pcfg = entry
        param_sets.append(
            ParameterSet.from_config(pcfg, name=str(entry.get("Name", f"params{i}")))
        )
    # Global parameter indexing: concatenation order of the sets.
    gindex: dict[str, int] = {}
    at = 0
    for ps in param_sets:
        for nm in ps.names:
            if nm in gindex:
                raise ConfigError(f"Duplicate parameter name across sets: {nm}")
            gindex[nm] = at
            at += 1
    n_total = at

    # ------------------------------------------------------------- samples
    samples: list[SampleModel] = []
    for scfg in exp.get("Samples"):
        scfg = Config(scfg)
        name = str(scfg.get("Name"))
        events = _event_data(_load_columns(str(scfg.get("MCFile"))))
        var_order = [str(v) for v in scfg.get("VarOrder")]

        norm_metas = []
        spline_metas = []
        func_metas = []
        for ps in param_sets:
            for m in ps.of_type(ParamType.NORM, name):
                norm_metas.append((m, gindex[m.name]))
            spline_metas.extend(ps.of_type(ParamType.SPLINE, name))
            func_metas.extend(ps.of_type(ParamType.FUNCTIONAL, name))
        norm_idx = match_norm_params(events, norm_metas, name)

        spline_table = None
        if scfg.get("SplineFile", None):
            spline_table = _spline_table(
                str(scfg.get("SplineFile")), spline_metas, events, gindex
            )
        tf1_table = None
        if scfg.get("TF1File", None):
            tf1_table = _tf1_table(str(scfg.get("TF1File")), func_metas, events, gindex)

        osc = None
        if scfg.get("Oscillation", None):
            ocfg = scfg.sub("Oscillation")
            g = ocfg.sub("EGrid")
            lo, hi, n = float(g.get("Low")), float(g.get("High")), int(g.get("N"))
            e_grid = (
                np.geomspace(lo, hi, n) if bool(g.get("Log", False)) else np.linspace(lo, hi, n)
            )
            osc_names = [
                m.name for ps in param_sets for m in ps.of_type(ParamType.OSC, name)
            ]
            if len(osc_names) != 6:
                raise ConfigError(
                    f"{name}: oscillation needs exactly 6 osc-type params, got {osc_names}"
                )
            phase = ocfg.get("PhaseDtype", None)
            osc = build_osc_config(
                events,
                e_grid,
                [gindex[nm] for nm in osc_names],
                baseline=float(ocfg.get("Baseline")),
                density=float(ocfg.get("Density")),
                electron_fraction=float(ocfg.get("ElectronFraction", 0.5)),
                nc_modes=[int(x) for x in ocfg.get("NCModes", []) or []],
                e_true_var=str(ocfg.get("ETrueVar", "e_true")),
                phase_dtype=jnp.dtype(str(phase)) if phase else None,
            )

        shifts = []
        for sh in scfg.get("Shifts", []) or []:
            sh = Config(sh)
            fn_name = str(sh.get("Function"))
            if fn_name not in _SHIFT_REGISTRY:
                raise ConfigError(
                    f"Unknown shift function '{fn_name}' (registered: {sorted(_SHIFT_REGISTRY)})"
                )
            shifts.append(
                ShiftSpec(
                    fn=_SHIFT_REGISTRY[fn_name],
                    param_index=gindex[str(sh.get("Parameter"))],
                    var_row=var_order.index(str(sh.get("Var"))),
                )
            )

        weight_fns = []
        for wf in scfg.get("WeightFunctions", []) or []:
            wf = Config(wf)
            fn_name = str(wf.get("Function"))
            if fn_name not in _WEIGHT_REGISTRY:
                raise ConfigError(
                    f"Unknown weight function '{fn_name}' "
                    f"(registered: {sorted(_WEIGHT_REGISTRY)})"
                )
            base_fn = _WEIGHT_REGISTRY[fn_name]
            var_row = var_order.index(str(wf.get("Var")))
            wargs = {
                str(k): (var_order.index(v) if isinstance(v, str) and v in var_order else v)
                for k, v in (wf.get("Args", {}) or {}).items()
            }
            pname = str(wf.get("Parameter"))
            meta = next(
                (m for ps in param_sets for m in ps.meta if m.name == pname), None
            )
            if meta is None:
                raise ConfigError(f"WeightFunctions: unknown parameter '{pname}'")
            from .events import match_event_mask
            from .sample import WeightSpec

            mask = match_event_mask(events, meta, name)
            weight_fns.append(
                WeightSpec(
                    fn=lambda v, kin, _f=base_fn, _r=var_row, _a=wargs: _f(
                        v, kin[_r], kin, **_a
                    ),
                    param_index=gindex[pname],
                    mask=jnp.asarray(mask),
                )
            )

        bcfg = scfg.sub("Binning")
        if bcfg.has("NonUniformBins"):
            bin_vars = [str(v) for v in bcfg.get("Vars")]
            sm = build_sample_model(
                name,
                events,
                var_order=var_order,
                binning_edges=[np.asarray([0.0, 1.0])] * len(bin_vars),  # placeholder
                binning_vars=bin_vars,
                n_total_params=n_total,
                norm_idx=norm_idx,
                spline_table=spline_table,
                tf1_table=tf1_table,
                osc=osc,
                shifts=shifts,
                weight_fns=weight_fns,
                test_statistic=TestStatistic(scfg.get("TestStatistic", "BarlowBeeston")),
                use_pallas=use_pallas,
            )
            nb = NonUniformBinning.build(
                bcfg.get("NonUniformBins"),
                [var_order.index(str(v)) for v in bcfg.get("Vars")],
            )
            sm = sm.with_binning(nb)
        else:
            sm = build_sample_model(
                name,
                events,
                var_order=var_order,
                binning_edges=_binning_edges(bcfg),
                binning_vars=[str(v) for v in bcfg.get("Vars")],
                n_total_params=n_total,
                norm_idx=norm_idx,
                spline_table=spline_table,
                tf1_table=tf1_table,
                osc=osc,
                shifts=shifts,
                weight_fns=weight_fns,
                test_statistic=TestStatistic(scfg.get("TestStatistic", "BarlowBeeston")),
                use_pallas=use_pallas,
            )
        samples.append(sm)
        _log.info(
            "Sample %s: %d events, %d bins, %s splines, %s TF1s, osc=%s",
            name, events.n_events, sm.n_bins,
            "yes" if spline_table is not None else "no",
            "yes" if tf1_table is not None else "no",
            "yes" if osc is not None else "no",
        )

    model = FitModel.build(param_sets, samples)

    # ----------------------------------------------------------------- data
    data_mode = str(exp.get("Data", "Asimov"))
    if data_mode == "Asimov":
        theta0 = model.prefit_vector()
        samples = [s.with_data(s.asimov_data(theta0)) for s in samples]
        model = FitModel.build(param_sets, samples)
    else:
        new_samples = []
        for s, scfg in zip(samples, exp.get("Samples")):
            scfg = Config(scfg)
            if not scfg.get("DataFile", None):
                raise ConfigError(f"Data: {data_mode} requires DataFile per sample")
            with np.load(str(scfg.get("DataFile")), allow_pickle=False) as f:
                new_samples.append(s.with_data(np.asarray(f["data"], np.float64)))
        samples = new_samples
        model = FitModel.build(param_sets, samples)

    return Experiment(model=model, param_sets=param_sets, samples=samples, config=cfg)
