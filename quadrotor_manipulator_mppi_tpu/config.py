"""Unified typed configuration tree with JSON round-trip.

The reference spreads configuration across four uncoordinated layers (ROS
params, xacro/launch args, SDF plugin params, hardcoded Python literals —
SURVEY.md section 5 "config/flag system").  Here every tunable lives in a
frozen dataclass; this module gives the tree one serialization surface:

    cfg = ExperimentConfig()                       # all defaults
    save_config(cfg, "exp.json")
    cfg = load_config("exp.json")                  # exact round trip
    cfg2 = replace_path(cfg, "solver.mppi.lam", 0.05)

NumPy array fields (sigma, action bounds, nominals) serialize as lists and
restore as arrays.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field, is_dataclass
from typing import Any

import numpy as np

from .models.multirotor import MultirotorParams
from .models.whole_body import WholeBodyParams
from .sim.flight_control import FlightGains
from .solver.mppi import MPPIConfig
from .solver.whole_body import WholeBodyCostParams, WholeBodyMPPIParams


def to_dict(obj: Any) -> Any:
    """Dataclass tree -> plain JSON-able structure."""
    if is_dataclass(obj) and not isinstance(obj, type):
        return {
            "__dataclass__": type(obj).__name__,
            **{
                f.name: to_dict(getattr(obj, f.name))
                for f in dataclasses.fields(obj)
            },
        }
    if isinstance(obj, np.ndarray):
        return {"__ndarray__": obj.tolist(), "dtype": str(obj.dtype)}
    if isinstance(obj, (list, tuple)):
        return [to_dict(x) for x in obj]
    if isinstance(obj, dict):
        return {k: to_dict(v) for k, v in obj.items()}
    if isinstance(obj, (np.floating, np.integer)):
        return obj.item()
    if callable(obj) and not isinstance(obj, type):
        # Exploration schedules carry a declarative identity
        # (solver/whole_body.ee_error_sigma_schedule) so the config tree
        # stays round-trippable; anonymous callables are a config bug.
        spec = getattr(obj, "__qmm_schedule__", None)
        if spec is None:
            raise TypeError(
                f"config field holds a non-serializable callable {obj!r}; "
                "use a registered schedule factory (__qmm_schedule__)"
            )
        return {"__schedule__": spec}
    return obj


_SCHEDULE_FACTORIES = {}


def register_schedule(kind: str, factory) -> None:
    _SCHEDULE_FACTORIES[kind] = factory


def _build_schedule(spec: dict):
    kind = spec["kind"]
    if kind not in _SCHEDULE_FACTORIES:
        # Lazy-register the built-ins on first use (avoids import cycles).
        from .solver.whole_body import ee_error_sigma_schedule

        _SCHEDULE_FACTORIES.setdefault("ee_error", ee_error_sigma_schedule)
    factory = _SCHEDULE_FACTORIES[kind]
    return factory(**{k: v for k, v in spec.items() if k != "kind"})


def _round3_classes():
    """Round-3 subsystem configs.  Grouped in a function only to keep the
    imports next to the classes they register (they run at module import —
    config.py imports model/sim/solver modules either way).  Note:
    sigma_scale_fn lambdas without a declarative ``__qmm_schedule__`` tag
    do not round-trip — the shipped presets all use tagged schedules."""
    from .models.fixed_wing import FwAeroParams, FwVehicleParams, LiftDragParams
    from .sim.depth_camera import DepthCameraParams
    from .sim.mapped_loop import MappedFlightConfig
    from .sim.occupancy import OccupancyParams
    from .sim.sensors import LidarParams
    from .solver.fixed_wing import FwMPPIParams
    from .solver.mapped import MappedMPPIParams

    return (
        FwAeroParams, FwVehicleParams, LiftDragParams, DepthCameraParams,
        MappedFlightConfig, OccupancyParams, LidarParams, FwMPPIParams,
        MappedMPPIParams,
    )


def _round4_classes():
    """Round-4 subsystem configs: the camera stack + the closed-loop
    episode options (frozen-coefficient plant, tube servo, payload)."""
    from .sim.geotag import GeotagParams
    from .sim.gimbal import GimbalParams
    from .sim.sensors import GpsParams
    from .sim.whole_body_loop import WholeBodyLoopConfig

    return (GimbalParams, GeotagParams, GpsParams, WholeBodyLoopConfig)


_REGISTRY = {
    cls.__name__: cls
    for cls in (
        MPPIConfig, MultirotorParams, WholeBodyParams, WholeBodyCostParams,
        WholeBodyMPPIParams, FlightGains,
    )
}
_REGISTRY.update({cls.__name__: cls for cls in _round3_classes()})
_REGISTRY.update({cls.__name__: cls for cls in _round4_classes()})


def register(cls):
    """Register an additional dataclass for deserialization."""
    _REGISTRY[cls.__name__] = cls
    return cls


def from_dict(data: Any) -> Any:
    if isinstance(data, dict):
        if "__ndarray__" in data:
            return np.asarray(data["__ndarray__"], dtype=data["dtype"])
        if "__schedule__" in data:
            return _build_schedule(data["__schedule__"])
        if "__dataclass__" in data:
            name = data["__dataclass__"]
            cls = _REGISTRY.get(name)
            if cls is None:
                raise ValueError(f"unregistered config dataclass {name!r}")
            kwargs = {
                k: from_dict(v) for k, v in data.items() if k != "__dataclass__"
            }
            # Dataclass tuple fields arrive as lists; coerce.
            for f in dataclasses.fields(cls):
                if f.name in kwargs and isinstance(kwargs[f.name], list):
                    if f.type in ("tuple", tuple) or (
                        "tuple" in str(f.type).lower()  # typing.Tuple too
                    ):
                        kwargs[f.name] = tuple(
                            tuple(x) if isinstance(x, list) else x
                            for x in kwargs[f.name]
                        )
            return cls(**kwargs)
        return {k: from_dict(v) for k, v in data.items()}
    if isinstance(data, list):
        return [from_dict(x) for x in data]
    return data


def save_config(cfg: Any, path: str) -> None:
    with open(path, "w") as f:
        json.dump(to_dict(cfg), f, indent=2)


def load_config(path: str) -> Any:
    with open(path) as f:
        return from_dict(json.load(f))


def replace_path(cfg: Any, dotted: str, value: Any) -> Any:
    """Functional update of a nested field: replace_path(c, 'mppi.lam', 0.05)."""
    head, _, rest = dotted.partition(".")
    if not rest:
        return dataclasses.replace(cfg, **{head: value})
    return dataclasses.replace(
        cfg, **{head: replace_path(getattr(cfg, head), rest, value)}
    )


@dataclass(frozen=True)
class ExperimentConfig:
    """Top-level experiment description."""

    solver: WholeBodyMPPIParams = field(default_factory=WholeBodyMPPIParams)
    gains: FlightGains = field(default_factory=FlightGains)
    seed: int = 0
    n_control_steps: int = 1000


register(ExperimentConfig)
