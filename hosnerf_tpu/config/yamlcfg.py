"""yacs-equivalent YAML config tree (attribute access + deep merge).

The reference vendors yacs and merges configs/default.yaml with a per-scene
yaml (ref: 2nd_State_Conditional_Human-Object/run.py:31-62 `make_cfg`,
third_parties/yacs/yacs.py). This is a ~60-line typed replacement keeping
the same yaml schema readable unchanged.
"""

from __future__ import annotations

import copy
from typing import Any, Dict, Optional

import yaml


class CfgNode(dict):
    """dict with attribute access, recursive over nested dicts."""

    def __init__(self, d: Optional[Dict[str, Any]] = None):
        super().__init__()
        for k, v in (d or {}).items():
            self[k] = CfgNode(v) if isinstance(v, dict) else v

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name, value):
        self[name] = CfgNode(value) if isinstance(value, dict) else value

    def clone(self) -> "CfgNode":
        return copy.deepcopy(self)

    def merge_from(self, other: Dict[str, Any]) -> "CfgNode":
        for k, v in other.items():
            if (k in self and isinstance(self[k], CfgNode)
                    and isinstance(v, dict)):
                self[k].merge_from(v)
            else:
                self[k] = CfgNode(v) if isinstance(v, dict) else v
        return self


def load_yaml(path: str) -> CfgNode:
    with open(path) as f:
        return CfgNode(yaml.safe_load(f) or {})


def make_cfg(scene_cfg_path: Optional[str] = None,
             default_cfg_path: Optional[str] = None,
             overrides: Optional[Dict[str, Any]] = None) -> CfgNode:
    """default.yaml <- per-scene yaml <- overrides (yacs merge order;
    ref: run.py:57-62)."""
    cfg = CfgNode()
    if default_cfg_path:
        cfg.merge_from(load_yaml(default_cfg_path))
    if scene_cfg_path:
        cfg.merge_from(load_yaml(scene_cfg_path))
    if overrides:
        cfg.merge_from(overrides)
    return cfg
