"""Typed-config machinery: YAML groups + dotted CLI overrides -> dataclasses.

Replaces the reference's Hydra + OmegaConf + dacite stack
(config/tools.py:16-56, train.py:23-28) with a dependency-free equivalent
that keeps the exact CLI surface (`dataset=dataset_allegro model=model_allegro
dataset.mode=action checkpoint.load=...`, README.md:124-133):

  - `load_config(config_dir, overrides)` reads config.yaml, resolves
    `defaults:` group entries (group: name -> group/<name>.yaml), deep-merges,
    then applies dotted overrides;
  - `from_dict(cls, data)` converts the merged dict into nested dataclasses,
    dispatching union-typed fields by their `name:` literal tag (the
    reference's dacite union semantics, models/decoder/__init__.py:22-27);
  - Path fields and tuple casts handled like the reference's type_hooks.
"""

import dataclasses
import typing
from pathlib import Path
from typing import Any, Dict, List, Sequence, Tuple, Union

import yaml


def _is_optional(tp) -> Tuple[bool, Any]:
    origin = typing.get_origin(tp)
    if origin is Union:
        args = [a for a in typing.get_args(tp) if a is not type(None)]
        if len(args) == 1:
            return True, args[0]
        return True, Union[tuple(args)]
    return False, tp


def from_dict(cls, data):
    """Recursively build dataclass `cls` from plain dicts/lists."""
    if data is None:
        return None
    _, cls = _is_optional(cls)
    origin = typing.get_origin(cls)

    if dataclasses.is_dataclass(cls):
        if not isinstance(data, dict):
            raise TypeError(f"expected mapping for {cls.__name__}, got {type(data)}")
        kwargs = {}
        fields = {f.name: f for f in dataclasses.fields(cls)}
        for key, value in data.items():
            if key not in fields:
                raise KeyError(f"unknown config key {key!r} for {cls.__name__}")
            kwargs[key] = from_dict(fields[key].type, value)
        return cls(**kwargs)

    if origin is Union:
        # name-discriminated union of dataclasses (dacite semantics)
        candidates = [a for a in typing.get_args(cls) if dataclasses.is_dataclass(a)]
        if isinstance(data, dict) and "name" in data:
            for cand in candidates:
                name_field = next(
                    (f for f in dataclasses.fields(cand) if f.name == "name"), None
                )
                if name_field is None:
                    continue
                default = name_field.default
                if default == data["name"]:
                    return from_dict(cand, data)
        raise TypeError(f"cannot dispatch union {cls} for {data!r}")

    if origin in (list, typing.List):
        (item_t,) = typing.get_args(cls) or (Any,)
        return [from_dict(item_t, v) for v in data]
    if origin in (tuple, typing.Tuple):
        args = typing.get_args(cls)
        if len(args) == 2 and args[1] is Ellipsis:
            return tuple(from_dict(args[0], v) for v in data)
        return tuple(from_dict(t, v) for t, v in zip(args, data))
    if origin in (dict, typing.Dict):
        kt, vt = typing.get_args(cls) or (Any, Any)
        return {k: from_dict(vt, v) for k, v in data.items()}

    if cls is Path:
        return Path(data)
    if cls is float and data is not None:
        return float(data)
    if cls is int and data is not None and not isinstance(data, bool):
        return int(data)
    if isinstance(cls, type) and dataclasses.is_dataclass(cls):
        return from_dict(cls, data)
    return data


def deep_merge(base: Dict, override: Dict) -> Dict:
    out = dict(base)
    for k, v in override.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = deep_merge(out[k], v)
        else:
            out[k] = v
    return out


def _parse_value(text: str):
    return yaml.safe_load(text)


def apply_override(cfg: Dict, dotted: str, value) -> None:
    keys = dotted.split(".")
    node = cfg
    for k in keys[:-1]:
        node = node.setdefault(k, {})
    node[keys[-1]] = value


def load_config(config_dir, overrides: Sequence[str] = ()) -> Dict:
    """Hydra-like resolution: config.yaml + defaults groups + CLI overrides.

    Group overrides (`dataset=dataset_allegro`) swap the group file; dotted
    overrides (`dataset.mode=action`) set leaves.
    """
    config_dir = Path(config_dir)

    def read(path: Path) -> Dict:
        with open(path, encoding="utf-8") as f:
            return yaml.safe_load(f) or {}

    def resolve(doc: Dict, base_dir: Path, group_choices: Dict[str, str]) -> Dict:
        defaults = doc.pop("defaults", [])
        merged: Dict = {}
        for entry in defaults:
            if isinstance(entry, str):
                if entry == "_self_":
                    continue
                merged = deep_merge(merged, resolve(read(base_dir / f"{entry}.yaml"),
                                                    base_dir, group_choices))
                continue
            for group, choice in entry.items():
                choice = group_choices.get(group, choice)
                group_file = base_dir / group / f"{choice}.yaml"
                sub = resolve(read(group_file), group_file.parent, group_choices)
                merged = deep_merge(merged, {group: sub})
        return deep_merge(merged, doc)

    group_choices = {}
    dotted = []
    for ov in overrides:
        key, _, val = ov.partition("=")
        if "." not in key and (config_dir / key).is_dir():
            group_choices[key] = val
        else:
            dotted.append((key, _parse_value(val)))

    cfg = resolve(read(config_dir / "config.yaml"), config_dir, group_choices)
    for key, val in dotted:
        apply_override(cfg, key, val)
    return cfg


def get_typed_config(cls, data: Dict):
    """config/tools.py:16-25 equivalent."""
    return from_dict(cls, data)
