"""Minimal gin-compatible config parser.

The reference drives run options through gin files of plain
`scope.param = value` bindings (no macros/imports/scopes beyond one dot) —
see 1st_State-Conditional_Scene/configs/state_mipnerf360/Backpack.gin and
run.py:236 `gin.parse_config_files_and_bindings`. gin itself is not in this
image; this parser covers exactly that surface and keeps the reference's
config files loadable as-is.
"""

from __future__ import annotations

import ast
from typing import Dict, Iterable, Optional


def _parse_value(text: str):
    text = text.strip()
    try:
        return ast.literal_eval(text)
    except (ValueError, SyntaxError):
        # bare identifiers (gin allows unquoted references); keep as string
        return text


def parse_lines(lines: Iterable[str]) -> Dict[str, object]:
    out: Dict[str, object] = {}
    buf = ""
    for raw in lines:
        line = raw.split("#", 1)[0].rstrip()
        if not line.strip():
            continue
        buf += line
        # continue multi-line values (unbalanced brackets)
        if buf.count("(") > buf.count(")") or buf.count("[") > buf.count("]"):
            continue
        if "=" not in buf:
            raise ValueError(f"unparseable gin line: {buf!r}")
        key, val = buf.split("=", 1)
        out[key.strip()] = _parse_value(val)
        buf = ""
    if buf:
        raise ValueError(f"unterminated gin value: {buf!r}")
    return out


def parse_config_files_and_bindings(
        files: Iterable[str],
        bindings: Optional[Iterable[str]] = None) -> Dict[str, object]:
    """Later files/bindings override earlier ones (gin semantics)."""
    cfg: Dict[str, object] = {}
    for path in files or []:
        with open(path) as f:
            cfg.update(parse_lines(f))
    for b in bindings or []:
        cfg.update(parse_lines([b]))
    return cfg


def scoped(cfg: Dict[str, object], scope: str) -> Dict[str, object]:
    """All params bound to `scope` (e.g. 'run') without the prefix."""
    prefix = scope + "."
    return {k[len(prefix):]: v for k, v in cfg.items()
            if k.startswith(prefix)}


def dumps(cfg: Dict[str, object]) -> str:
    """Serialize back to gin text (the reference dumps the merged config to
    <logdir>/config.gin; run.py:106-119)."""
    return "\n".join(f"{k} = {v!r}" for k, v in sorted(cfg.items())) + "\n"
