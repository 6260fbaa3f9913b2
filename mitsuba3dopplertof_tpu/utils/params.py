"""Scene parameter traversal — the mi.traverse / SceneParameters API
(reference src/python/python/util.py:12-350).

Exposes editable leaf parameters of the object graph as a dict-like view;
``update()`` re-compiles the scene arrays so subsequent renders see the new
values. (The differentiable-render path will build on this: parameters map
1:1 onto SceneArrays leaves, which are jit inputs.)
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


class SceneParameters(dict):
    """dict of 'object_id.param' -> value with deferred scene update."""

    def __init__(self, scene, entries: Dict[str, Any], setters):
        super().__init__(entries)
        self._scene = scene
        self._setters = setters

    def update(self, values: Dict[str, Any] = None):
        if values:
            for k, v in values.items():
                self[k] = v
        for k, v in self.items():
            if k in self._setters:
                self._setters[k](v)
        # invalidate compiled arrays so the next render rebuilds
        self._scene._compiled = None
        return [(k, None) for k in self.keys()]


def traverse(scene) -> SceneParameters:
    """Collect editable parameters (reference util.py traverse :288)."""
    entries: Dict[str, Any] = {}
    setters = {}

    def add(key, value, setter):
        entries[key] = value
        setters[key] = setter

    # editable BSDF parameters, recursing through adapter BSDFs
    # (twosided/mask/blend/normalmap — reference traverse exposes the
    # nested plugin's params under the child's path, util.py:288)
    color_attrs = ("reflectance", "specular_reflectance",
                   "specular_transmittance", "transmittance",
                   "diffuse_reflectance", "sigma_a", "eta", "k")
    scalar_attrs = ("alpha", "alpha_u", "alpha_v", "weight", "int_ior",
                    "ext_ior", "theta")

    def walk_bsdf(prefix, b, seen):
        if b is None or id(b) in seen:
            return
        seen.add(id(b))
        for attr in color_attrs:
            v = getattr(b, attr, None)
            if v is None or np.ndim(v) != 1 or np.size(v) != 3:
                continue

            def csetter(val, b=b, attr=attr):
                setattr(b, attr, np.asarray(val, np.float64).reshape(3))
            add(f"{prefix}.{attr}.value", np.asarray(v, np.float64),
                csetter)
        for attr in scalar_attrs:
            v = getattr(b, attr, None)
            if not isinstance(v, (int, float)) or isinstance(v, bool):
                continue

            def ssetter(val, b=b, attr=attr):
                setattr(b, attr, float(np.asarray(val).reshape(())))
            add(f"{prefix}.{attr}", float(v), ssetter)
        for nattr in ("nested", "nested_bsdf"):
            nb = getattr(b, nattr, None)
            if nb is not None and not isinstance(nb, (list, tuple)):
                nid = getattr(nb, "id", None) or "nested"
                walk_bsdf(f"{prefix}.{nid}", nb, seen)

    for i, sh in enumerate(scene.shapes):
        sid = sh.id or f"shape_{i}"
        walk_bsdf(f"{sid}.bsdf", sh.bsdf, set())
        at = sh.to_world

        def tsetter(v, sh=sh):
            from ..core.transform import AnimatedTransform
            sh.to_world = AnimatedTransform(
                static_matrix=np.asarray(v, np.float64).reshape(4, 4))
        if not at.animated:
            add(f"{sid}.to_world", at.static_matrix, tsetter)

    for i, em in enumerate(scene.emitters):
        eid = em.id or f"emitter_{i}"
        if hasattr(em, "intensity"):
            def isetter(v, em=em):
                em.intensity = np.asarray(v, np.float64).reshape(3)
            add(f"{eid}.intensity.value", np.asarray(em.intensity), isetter)
        if hasattr(em, "radiance"):
            def rsetter(v, em=em):
                em.radiance = np.asarray(v, np.float64).reshape(3)
            add(f"{eid}.radiance.value", np.asarray(em.radiance), rsetter)

    return SceneParameters(scene, entries, setters)


__all__ = ["traverse", "SceneParameters"]
