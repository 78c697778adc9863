"""Hierarchy serialization: save/load a ``MultilevelSolver`` to one file.

The reference has no checkpointing — its reusable artifact is the live
``MultilevelSolver`` object (SURVEY.md §5.4).  Here every level is a
pytree of arrays plus static metadata, so the natural checkpoint is a
single ``.npz`` (arrays, flat keys) + a JSON structure record (container
types, shapes, smoother specs).  Round-trip contract: a loaded solver
produces the identical residual history (tests/test_util.py).

Sharded/HaloELL levels are not serializable (they embed a live Mesh);
call ``to_device``/rebuild sharding after loading instead.
"""

from __future__ import annotations

import dataclasses
import json

import numpy as np
import jax.numpy as jnp


def _container_registry():
    from pyamg_tpu.sparse.matrix import ELL, BELL, DIA, PhaseStencil
    from pyamg_tpu.sparse.sell import SELL
    return {c.__name__: c for c in (ELL, BELL, DIA, PhaseStencil, SELL)}


def _is_array(x):
    return isinstance(x, (np.ndarray, jnp.ndarray)) or \
        (hasattr(x, "shape") and hasattr(x, "dtype"))


def _ser_value(v, key, arrays):
    """Serialize one value -> JSON-able spec; arrays go into ``arrays``."""
    reg = _container_registry()
    if v is None:
        return {"t": "none"}
    if type(v).__name__ in reg and dataclasses.is_dataclass(v):
        spec = {"t": "container", "cls": type(v).__name__, "fields": {}}
        for f in dataclasses.fields(v):
            spec["fields"][f.name] = _ser_value(
                getattr(v, f.name), f"{key}.{f.name}", arrays)
        return spec
    if _is_array(v):
        arrays[key] = np.asarray(v)
        return {"t": "arr", "k": key}
    if isinstance(v, (list, tuple)):
        items = [_ser_value(x, f"{key}.{i}", arrays)
                 for i, x in enumerate(v)]
        return {"t": "tuple" if isinstance(v, tuple) else "list",
                "items": items}
    if isinstance(v, dict):
        return {"t": "dict",
                "items": {k: _ser_value(x, f"{key}.{k}", arrays)
                          for k, x in v.items()}}
    if isinstance(v, (bool, int, float, str)):
        return {"t": "lit", "v": v}
    if isinstance(v, (np.integer,)):
        return {"t": "lit", "v": int(v)}
    if isinstance(v, (np.floating,)):
        return {"t": "lit", "v": float(v)}
    raise TypeError(f"cannot serialize {type(v)!r} at {key}")


def _deser_value(spec, arrays):
    reg = _container_registry()
    t = spec["t"]
    if t == "none":
        return None
    if t == "container":
        cls = reg[spec["cls"]]
        kw = {k: _deser_value(s, arrays)
              for k, s in spec["fields"].items()}
        # meta fields recorded as lists come back as tuples where the
        # dataclass expects them
        for f in dataclasses.fields(cls):
            if isinstance(kw.get(f.name), list):
                kw[f.name] = tuple(kw[f.name])
        return cls(**kw)
    if t == "arr":
        return arrays[spec["k"]]
    if t == "tuple":
        return tuple(_deser_value(s, arrays) for s in spec["items"])
    if t == "list":
        return [_deser_value(s, arrays) for s in spec["items"]]
    if t == "dict":
        return {k: _deser_value(s, arrays)
                for k, s in spec["items"].items()}
    if t == "lit":
        return spec["v"]
    raise TypeError(t)


_LEVEL_EXTRAS = ("B", "AggOp", "T", "C", "Cpts", "Fpts", "splitting",
                 "rho_DinvA")


def save_hierarchy(ml, path):
    """Serialize a MultilevelSolver to ``path`` (.npz)."""
    arrays = {}
    levels_spec = []
    for i, lvl in enumerate(ml.levels):
        spec = {"A": _ser_value(lvl.A, f"l{i}.A", arrays),
                "P": _ser_value(getattr(lvl, "P", None), f"l{i}.P",
                                arrays),
                "R": _ser_value(getattr(lvl, "R", None), f"l{i}.R",
                                arrays),
                "pre": _ser_value(tuple(lvl.pre), f"l{i}.pre", arrays),
                "post": _ser_value(tuple(lvl.post), f"l{i}.post",
                                   arrays),
                "extras": {}}
        for name in _LEVEL_EXTRAS:
            if getattr(lvl, name, None) is not None:
                spec["extras"][name] = _ser_value(
                    getattr(lvl, name), f"l{i}.x.{name}", arrays)
        levels_spec.append(spec)
    cs = ml.coarse_solver
    if callable(cs.kind) and not isinstance(cs.kind, str):
        raise TypeError("callable coarse solvers are not serializable")
    struct = {
        "version": 1,
        "levels": levels_spec,
        "coarse": {"kind": cs.kind, "opts": cs.opts,
                   "params": _ser_value(cs.params, "coarse.params",
                                        arrays),
                   "cho_lower": getattr(cs, "_cho_lower", None),
                   "smoother_static": getattr(cs, "_smoother_static",
                                              None)},
        "symmetric_smoothing": bool(getattr(ml, "symmetric_smoothing",
                                            False)),
    }
    np.savez_compressed(path, __structure__=json.dumps(struct), **arrays)


def load_hierarchy(path):
    """Load a MultilevelSolver saved by :func:`save_hierarchy`."""
    from pyamg_tpu.multilevel import Level, MultilevelSolver

    with np.load(path, allow_pickle=False) as z:
        struct = json.loads(str(z["__structure__"]))
        arrays = {k: z[k] for k in z.files if k != "__structure__"}

    levels = []
    for spec in struct["levels"]:
        lvl = Level(A=_deser_value(spec["A"], arrays),
                    P=_deser_value(spec["P"], arrays),
                    R=_deser_value(spec["R"], arrays))
        lvl.pre = tuple(_deser_value(spec["pre"], arrays))
        lvl.post = tuple(_deser_value(spec["post"], arrays))
        for name, s in spec.get("extras", {}).items():
            setattr(lvl, name, _deser_value(s, arrays))
        levels.append(lvl)

    ml = MultilevelSolver(levels, coarse_solver=struct["coarse"]["kind"])
    cs = ml.coarse_solver
    cs.opts = dict(struct["coarse"]["opts"])
    cs.params = _deser_value(struct["coarse"]["params"], arrays)
    if struct["coarse"]["cho_lower"] is not None:
        cs._cho_lower = bool(struct["coarse"]["cho_lower"])
    if struct["coarse"]["smoother_static"] is not None:
        ss = struct["coarse"]["smoother_static"]
        cs._smoother_static = (ss[0], _json_opts(ss[1]))
    ml.symmetric_smoothing = bool(struct["symmetric_smoothing"])
    return ml


def _json_opts(opts):
    """JSON round-trips dict keys/values as-is for our option dicts."""
    return {k: tuple(v) if isinstance(v, list) else v
            for k, v in dict(opts).items()}
