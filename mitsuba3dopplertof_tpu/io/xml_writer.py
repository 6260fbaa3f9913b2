"""dict -> scene XML writer (the mi.xml module's dict_to_xml,
reference src/python/python/xml.py)."""

from __future__ import annotations

import os
from typing import Any, Dict
from xml.sax.saxutils import quoteattr

import numpy as np

from ..core.transform import AnimatedTransform

_OBJ_CATS = {"integrator", "sensor", "sampler", "film", "rfilter", "shape",
             "bsdf", "emitter", "texture", "medium", "phase", "volume"}


def _value_tag(name: str, v) -> str:
    if isinstance(v, bool):
        return f'<boolean name="{name}" value="{str(v).lower()}"/>'
    if isinstance(v, int):
        return f'<integer name="{name}" value="{v}"/>'
    if isinstance(v, float):
        return f'<float name="{name}" value="{v}"/>'
    if isinstance(v, str):
        return f'<string name="{name}" value={quoteattr(v)}/>'
    if isinstance(v, dict) and v.get("type") == "rgb":
        vals = ", ".join(str(x) for x in v["value"])
        return f'<rgb name="{name}" value="{vals}"/>'
    if isinstance(v, AnimatedTransform):
        parts = [f'<animation name="{name}">']
        for t, m in (v.keyframes or [(0.0, v.static_matrix)]):
            vals = " ".join(str(x) for x in np.asarray(m).reshape(-1))
            parts.append(f'<transform time="{t}"><matrix value="{vals}"/>'
                         '</transform>')
        parts.append("</animation>")
        return "".join(parts)
    arr = np.asarray(v)
    if arr.shape == (4, 4):
        vals = " ".join(str(x) for x in arr.reshape(-1))
        return (f'<transform name="{name}"><matrix value="{vals}"/>'
                '</transform>')
    if arr.shape == (3,):
        return (f'<vector name="{name}" x="{arr[0]}" y="{arr[1]}" '
                f'z="{arr[2]}"/>')
    raise RuntimeError(f"dict_to_xml: cannot serialize {name}={v!r}")


def _obj_xml(key: str, d: Dict[str, Any], indent: int) -> str:
    from .dict_loader import _category_of
    t = d["type"]
    pad = "  " * indent
    if t == "ref":
        return f'{pad}<ref id="{d["id"]}"/>'
    cat = _category_of(t)
    if cat is None:
        raise RuntimeError(f"dict_to_xml: unknown type '{t}'")
    attrs = f' id="{d["id"]}"' if d.get("id") else (
        f' id="{key}"' if key and not key.startswith("_") and indent == 1
        else "")
    lines = [f'{pad}<{cat} type="{t}"{attrs}>']
    for k, v in d.items():
        if k in ("type", "id"):
            continue
        if k.startswith("_"):
            # "_arg_N" carries anonymous nested plugins (the XML parser's
            # unnamed-child convention, io/xml.py); other _keys are
            # loader-internal metadata
            if k.startswith("_arg_") and isinstance(v, dict):
                lines.append(_obj_xml("", v, indent + 1))
            continue
        if isinstance(v, dict) and v.get("type") not in (None, "rgb"):
            lines.append(_obj_xml(k, v, indent + 1))
        else:
            lines.append("  " * (indent + 1) + _value_tag(k, v))
    lines.append(f"{pad}</{cat}>")
    return "\n".join(lines)


def dict_to_xml(scene_dict: Dict[str, Any], filename: str = None) -> str:
    """Serialize a load_dict-style nested dict to scene XML."""
    lines = ['<scene version="3.0.0">']
    for key, v in scene_dict.items():
        # underscore keys are the parser's anonymous children
        # (_integrator_0, _sensor_1, _arg_N); serialize them unnamed.
        # Non-dict underscore values (_base_dir) are loader metadata.
        if key == "type" or not (isinstance(v, dict) and "type" in v):
            continue
        lines.append(_obj_xml("" if key.startswith("_") else key, v, 1))
    lines.append("</scene>")
    out = "\n".join(lines)
    if filename:
        os.makedirs(os.path.dirname(os.path.abspath(filename)), exist_ok=True)
        with open(filename, "w") as f:
            f.write(out)
    return out


__all__ = ["dict_to_xml"]
