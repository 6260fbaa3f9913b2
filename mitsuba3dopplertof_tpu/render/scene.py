"""Scene assembly and compilation into device SoA arrays.

The reference assembles an object graph then uploads acceleration structures
(reference src/render/scene.cpp:22-101, scene_optix.inl / scene_embree.inl).
TPU-native equivalent: the host compiles the shape graph into flat triangle /
instance / BSDF / emitter tables (a pytree of jnp arrays + static metadata),
and ray queries are jnp programs over those tables that jit/fuse into the
integrator's bounce loop.

Intersection currently runs a scanned brute-force over triangle chunks —
dense, regular VPU work that is optimal for small scenes; a two-level Pallas
BVH kernel slots in behind the same ``ray_intersect`` signature for large
scenes (SURVEY.md §7 "hard parts" #1).

Motion blur: every shape is an instance with two keyframe matrices; rays are
transformed by the *exact* inverse of the lerped matrix at their time (the
semantics of Embree 2-step instance motion / OptixMatrixMotionTransform +
reference src/shapes/instance.cpp:155-250, transform.h:458-466).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..core.math import dot, normalize, coordinate_system
from ..core.transform import affine_inverse, animated_lerp
from .types import Ray, SurfaceInteraction

TRI_CHUNK = 8  # triangles tested per scan step (VPU-width friendly)


class SceneArrays:
    """Pytree of device arrays. Registered with static metadata as aux so the
    whole scene can be passed through jit/shard_map."""

    ARRAY_FIELDS = [
        # static-instance triangles, world space
        "s_v0", "s_e1", "s_e2", "s_n0", "s_n1", "s_n2",
        "s_uv0", "s_uv1", "s_uv2", "s_inst", "s_prim",
        # animated-instance triangles, object space (per instance ranges)
        "a_v0", "a_e1", "a_e2", "a_n0", "a_n1", "a_n2",
        "a_uv0", "a_uv1", "a_uv2", "a_inst", "a_prim",
        # instances
        "inst_m0", "inst_m1", "inst_t0", "inst_t1",
        "inst_bsdf", "inst_emitter",
        # material / emitter tables
        "bsdf_type", "bsdf_params",
        "emitter_type", "emitter_params", "emitter_to_world",
        "bsphere_radius",
    ]
    META_FIELDS = [
        "n_static_tris", "n_anim_tris", "anim_ranges", "bsdf_types_present",
        "emitter_types_present", "n_emitters", "has_environment",
        "env_radiance", "bsdf_flags_host",
    ]

    def __init__(self, **kw):
        for k in self.ARRAY_FIELDS + self.META_FIELDS:
            setattr(self, k, kw.get(k))

    def tree_flatten(self):
        children = tuple(getattr(self, k) for k in self.ARRAY_FIELDS)
        aux = tuple(getattr(self, k) for k in self.META_FIELDS)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls()
        for k, v in zip(cls.ARRAY_FIELDS, children):
            setattr(obj, k, v)
        for k, v in zip(cls.META_FIELDS, aux):
            setattr(obj, k, v)
        return obj


jax.tree_util.register_pytree_node(
    SceneArrays, SceneArrays.tree_flatten, SceneArrays.tree_unflatten)


class Scene:
    """Host-side object graph (reference src/render/scene.cpp:22-101)."""

    def __init__(self, shapes, emitters, sensors, integrator=None):
        self.shapes = shapes          # flattened instances (Shape objects)
        self.emitters = emitters      # Emitter objects (incl. area emitters)
        self.sensors = sensors
        self.integrator = integrator
        self._compiled: Optional[SceneArrays] = None

    @property
    def sensor(self):
        return self.sensors[0]

    def environment(self):
        for e in self.emitters:
            if e.is_environment:
                return e
        return None

    # ------------------------------------------------------------------
    def compile(self) -> SceneArrays:
        if self._compiled is not None:
            return self._compiled

        from ..bsdfs import BSDF, Diffuse, N_BSDF_PARAMS
        from ..emitters import N_EMITTER_PARAMS, EMITTER_AREA_RECT
        from ..core.properties import Properties

        # --- BSDF table (deduplicated by object identity) ---------------
        bsdf_objs: List[Any] = []
        bsdf_index: Dict[int, int] = {}
        for sh in self.shapes:
            b = sh.bsdf
            if b is None:
                b = Diffuse(Properties("diffuse"))
                sh.bsdf = b
            if id(b) not in bsdf_index:
                bsdf_index[id(b)] = len(bsdf_objs)
                bsdf_objs.append(b)
        bsdf_type = np.array([b.type_id for b in bsdf_objs], np.int32)
        bsdf_flags = np.array([b.flags for b in bsdf_objs], np.int32)
        bsdf_params = np.stack([b.params_row() for b in bsdf_objs]) \
            if bsdf_objs else np.zeros((0, N_BSDF_PARAMS))

        # --- emitter table ----------------------------------------------
        emitter_rows, emitter_types, emitter_mats = [], [], []
        for ei, em in enumerate(self.emitters):
            row = em.params_row()
            mat = np.eye(4)
            if em.shape is not None:     # area emitter: bind shape geometry
                m0, m1, _, _ = em.shape.to_world.matrices()
                mat = m0
                area = float(np.sum(em.shape.mesh.surface_areas(m0)))
                from ..emitters import E_AREA
                row[E_AREA] = area
            emitter_rows.append(row)
            emitter_types.append(em.type_id)
            emitter_mats.append(mat)
        n_emitters = len(self.emitters)
        emitter_params = (np.stack(emitter_rows) if emitter_rows
                          else np.zeros((0, N_EMITTER_PARAMS)))
        emitter_type = np.array(emitter_types, np.int32)
        emitter_to_world = (np.stack(emitter_mats) if emitter_mats
                            else np.zeros((0, 4, 4)))

        env = self.environment()
        env_radiance = (np.asarray(env.radiance, np.float32)
                        if env is not None else np.zeros(3, np.float32))

        # --- instances & triangles ---------------------------------------
        inst_m0, inst_m1, inst_t0, inst_t1 = [], [], [], []
        inst_bsdf, inst_emitter, inst_animated = [], [], []
        static_parts = {k: [] for k in
                        ("v0", "e1", "e2", "n0", "n1", "n2", "uv0", "uv1",
                         "uv2", "inst", "prim")}
        anim_parts = {k: [] for k in static_parts}
        anim_ranges: List[Tuple[int, int, int]] = []  # (inst, start, count)
        all_pts = []

        for ii, sh in enumerate(self.shapes):
            m0, m1, t0, t1 = sh.to_world.matrices()
            animated = sh.to_world.animated
            inst_m0.append(m0)
            inst_m1.append(m1)
            inst_t0.append(t0)
            inst_t1.append(t1)
            inst_bsdf.append(bsdf_index[id(sh.bsdf)])
            inst_emitter.append(
                self.emitters.index(sh.emitter) if sh.emitter is not None else -1)
            inst_animated.append(animated)

            mesh = sh.mesh
            f = mesh.faces
            v = mesh.vertices
            vn = mesh.normals if mesh.normals is not None else None
            uv = mesh.uvs if mesh.uvs is not None else None
            nt = f.shape[0]

            def tri_attrs(verts, which):
                return verts[f[:, which]]

            if animated:
                parts, inst_col = anim_parts, ii
                vv = v
                nt_pad = (nt + TRI_CHUNK - 1) // TRI_CHUNK * TRI_CHUNK
                start = sum(r[2] for r in anim_ranges)
                anim_ranges.append((ii, start, nt_pad))
                # conservative bounds for later culling
                for tt in (0.0, 1.0):
                    mm = m0 if tt == 0.0 else m1
                    all_pts.append(v @ mm[:3, :3].T + mm[:3, 3])
            else:
                parts, inst_col = static_parts, ii
                vv = v @ m0[:3, :3].T + m0[:3, 3]      # bake world transform
                all_pts.append(vv)

            p0, p1, p2 = (tri_attrs(vv, 0), tri_attrs(vv, 1), tri_attrs(vv, 2))
            parts["v0"].append(p0)
            parts["e1"].append(p1 - p0)
            parts["e2"].append(p2 - p0)
            if vn is not None:
                if animated:
                    nrm = vn
                else:
                    inv_t = np.linalg.inv(m0[:3, :3]).T
                    nrm = vn @ inv_t.T
                    nrm /= np.maximum(
                        np.linalg.norm(nrm, axis=-1, keepdims=True), 1e-20)
                n0, n1, n2 = (tri_attrs(nrm, 0), tri_attrs(nrm, 1), tri_attrs(nrm, 2))
            else:
                gn = np.cross(p1 - p0, p2 - p0)
                gn /= np.maximum(np.linalg.norm(gn, axis=-1, keepdims=True), 1e-20)
                n0 = n1 = n2 = gn
            parts["n0"].append(n0)
            parts["n1"].append(n1)
            parts["n2"].append(n2)
            if uv is not None:
                parts["uv0"].append(tri_attrs(uv, 0))
                parts["uv1"].append(tri_attrs(uv, 1))
                parts["uv2"].append(tri_attrs(uv, 2))
            else:
                z2 = np.zeros((nt, 2))
                parts["uv0"].append(z2)
                parts["uv1"].append(z2)
                parts["uv2"].append(z2)
            parts["inst"].append(np.full(nt, inst_col, np.int32))
            parts["prim"].append(np.arange(nt, dtype=np.int32))

            if animated:
                # pad THIS instance's block to a chunk multiple so its range
                # can be sliced chunk-aligned at trace time
                pad = (nt + TRI_CHUNK - 1) // TRI_CHUNK * TRI_CHUNK - nt
                if pad:
                    for k in parts:
                        last = parts[k][-1]
                        if k in ("inst", "prim"):
                            filler = np.full((pad,), -1, np.int32)
                        else:
                            filler = np.zeros((pad,) + last.shape[1:], last.dtype)
                        parts[k][-1] = np.concatenate([last, filler], axis=0)

        def pack(parts, pad_to_chunk=True):
            out = {}
            nt = sum(a.shape[0] for a in parts["v0"]) if parts["v0"] else 0
            pad = ((nt + TRI_CHUNK - 1) // TRI_CHUNK * TRI_CHUNK - nt
                   if pad_to_chunk and nt > 0 else (TRI_CHUNK if nt == 0 else 0))
            for k, arrs in parts.items():
                if nt > 0:
                    cat = np.concatenate(arrs, axis=0)
                else:
                    width = {"inst": None, "prim": None}.get(k, 3)
                    if k.startswith("uv"):
                        width = 2
                    cat = (np.zeros((0,), np.int32) if width is None
                           else np.zeros((0, width)))
                if pad:
                    pad_shape = (pad,) + cat.shape[1:]
                    if k in ("inst", "prim"):
                        filler = np.full(pad_shape, -1, np.int32)
                    else:
                        filler = np.zeros(pad_shape, cat.dtype)
                    cat = np.concatenate([cat, filler], axis=0)
                dtype = np.int32 if k in ("inst", "prim") else np.float32
                out[k] = jnp.asarray(cat, dtype=dtype)
            return out, nt

        s, n_static = pack(static_parts)
        a, n_anim = pack(anim_parts)

        pts = np.concatenate(all_pts, axis=0) if all_pts else np.zeros((1, 3))
        center = 0.5 * (pts.min(0) + pts.max(0))
        radius = float(np.linalg.norm(pts - center, axis=-1).max()) + 1e-3

        self._compiled = SceneArrays(
            s_v0=s["v0"], s_e1=s["e1"], s_e2=s["e2"],
            s_n0=s["n0"], s_n1=s["n1"], s_n2=s["n2"],
            s_uv0=s["uv0"], s_uv1=s["uv1"], s_uv2=s["uv2"],
            s_inst=s["inst"], s_prim=s["prim"],
            a_v0=a["v0"], a_e1=a["e1"], a_e2=a["e2"],
            a_n0=a["n0"], a_n1=a["n1"], a_n2=a["n2"],
            a_uv0=a["uv0"], a_uv1=a["uv1"], a_uv2=a["uv2"],
            a_inst=a["inst"], a_prim=a["prim"],
            inst_m0=jnp.asarray(np.stack(inst_m0), jnp.float32),
            inst_m1=jnp.asarray(np.stack(inst_m1), jnp.float32),
            inst_t0=jnp.asarray(inst_t0, jnp.float32),
            inst_t1=jnp.asarray(inst_t1, jnp.float32),
            inst_bsdf=jnp.asarray(inst_bsdf, jnp.int32),
            inst_emitter=jnp.asarray(inst_emitter, jnp.int32),
            bsdf_type=jnp.asarray(bsdf_type),
            bsdf_params=jnp.asarray(bsdf_params, jnp.float32),
            emitter_type=jnp.asarray(emitter_type),
            emitter_params=jnp.asarray(emitter_params, jnp.float32),
            emitter_to_world=jnp.asarray(emitter_to_world, jnp.float32),
            bsphere_radius=jnp.float32(radius),
            n_static_tris=n_static,
            n_anim_tris=n_anim,
            anim_ranges=tuple(anim_ranges),
            bsdf_types_present=tuple(sorted(set(int(t) for t in bsdf_type))),
            emitter_types_present=tuple(sorted(set(int(t) for t in emitter_type))),
            n_emitters=n_emitters,
            has_environment=env is not None,
            env_radiance=tuple(float(x) for x in env_radiance),
            bsdf_flags_host=tuple(int(f) for f in bsdf_flags),
        )
        return self._compiled


# ---------------------------------------------------------------------------
# Ray intersection (brute-force scanned; Pallas BVH slots in here later)
# ---------------------------------------------------------------------------

def _intersect_tris_scan(o, d, maxt, v0, e1, e2, best):
    """Scan over triangle chunks; carry = (t, tri_index). Möller-Trumbore.

    ``o, d``: (N,3); ``v0/e1/e2``: (T,3) padded to TRI_CHUNK multiples.
    ``best``: (t (N,), idx (N,)) initial carry. Returns updated carry and
    barycentrics are recomputed later from the winning triangle (cheaper than
    carrying u,v through the scan).
    """
    T = v0.shape[0]
    n_chunks = T // TRI_CHUNK
    v0c = v0.reshape(n_chunks, TRI_CHUNK, 3)
    e1c = e1.reshape(n_chunks, TRI_CHUNK, 3)
    e2c = e2.reshape(n_chunks, TRI_CHUNK, 3)
    base = (jnp.arange(n_chunks, dtype=jnp.int32) * TRI_CHUNK)

    def step(carry, tri):
        bt, bi = carry
        cv0, ce1, ce2, cbase = tri
        # (N, C) batched Möller–Trumbore
        pvec = jnp.cross(d[:, None, :], ce2[None, :, :])
        det = jnp.sum(ce1[None, :, :] * pvec, axis=-1)
        inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
        tvec = o[:, None, :] - cv0[None, :, :]
        u = jnp.sum(tvec * pvec, axis=-1) * inv_det
        qvec = jnp.cross(tvec, ce1[None, :, :])
        v = jnp.sum(d[:, None, :] * qvec, axis=-1) * inv_det
        t = jnp.sum(ce2[None, :, :] * qvec, axis=-1) * inv_det
        hit = ((jnp.abs(det) > 1e-12) & (u >= 0.0) & (v >= 0.0)
               & (u + v <= 1.0) & (t > 0.0) & (t < maxt[:, None])
               & (t < bt[:, None]))
        t = jnp.where(hit, t, jnp.inf)
        kmin = jnp.argmin(t, axis=-1)
        tmin = jnp.take_along_axis(t, kmin[:, None], axis=-1)[:, 0]
        better = tmin < bt
        bi = jnp.where(better, cbase + kmin.astype(jnp.int32), bi)
        bt = jnp.where(better, tmin, bt)
        return (bt, bi), None

    (bt, bi), _ = jax.lax.scan(step, best, (v0c, e1c, e2c, base))
    return bt, bi


def _recompute_bary(o, d, v0, e1, e2):
    """Barycentrics of the ray/plane hit for the winning triangle."""
    pvec = jnp.cross(d, e2)
    det = jnp.sum(e1 * pvec, axis=-1)
    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
    tvec = o - v0
    u = jnp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = jnp.cross(tvec, e1)
    v = jnp.sum(d * qvec, axis=-1) * inv_det
    t = jnp.sum(e2 * qvec, axis=-1) * inv_det
    return t, u, v


def _animated_object_rays(sa: SceneArrays, inst: int, ray: Ray):
    """Transform rays into the object space of animated instance ``inst`` at
    each ray's own time (exact motion blur: inverse of the lerped matrix)."""
    m0 = sa.inst_m0[inst]
    m1 = sa.inst_m1[inst]
    m_t = animated_lerp(m0, m1, sa.inst_t0[inst], sa.inst_t1[inst], ray.time)
    inv = affine_inverse(m_t)
    o_obj = (inv[..., :3, :3] @ ray.o[..., None])[..., 0] + inv[..., :3, 3]
    d_obj = (inv[..., :3, :3] @ ray.d[..., None])[..., 0]
    return o_obj, d_obj, m_t, inv


def ray_intersect(sa: SceneArrays, ray: Ray, active=None) -> SurfaceInteraction:
    """Full surface-interaction query (reference scene.cpp:125-137 +
    Instance::compute_surface_interaction, instance.cpp:155-250)."""
    n = ray.o.shape[0]
    dt = ray.o.dtype
    inf = jnp.full((n,), jnp.inf, dt)
    best_t = inf
    best_idx = jnp.full((n,), -1, jnp.int32)     # global triangle slot
    best_space = jnp.zeros((n,), jnp.int32)      # 0 = static, 1 = animated

    if sa.n_static_tris > 0:
        best_t, best_idx = _intersect_tris_scan(
            ray.o, ray.d, ray.maxt, sa.s_v0, sa.s_e1, sa.s_e2,
            (best_t, best_idx))

    o_objs = {}
    if sa.n_anim_tris > 0:
        for (inst, start, count) in sa.anim_ranges:
            o_obj, d_obj, _, _ = _animated_object_rays(sa, inst, ray)
            o_objs[inst] = (o_obj, d_obj)
            # ranges are chunk-aligned by construction (padded at compile
            # time with inst == -1 filler triangles)
            sl = slice(start, start + count)
            t_a, i_a = _intersect_tris_scan(
                o_obj, d_obj, ray.maxt, sa.a_v0[sl], sa.a_e1[sl], sa.a_e2[sl],
                (best_t, jnp.full((n,), -1, jnp.int32)))
            took = i_a >= 0
            # filter filler hits (inst == -1 in that slot)
            slot = jnp.where(took, i_a + start, 0)
            valid_slot = sa.a_inst[slot] == inst
            took = took & valid_slot
            best_idx = jnp.where(took, slot, best_idx)
            best_space = jnp.where(took, 1, best_space)
            best_t = jnp.where(took, t_a, best_t)

    valid = best_idx >= 0
    idx = jnp.maximum(best_idx, 0)

    is_anim = best_space == 1

    def gather(field_s, field_a):
        fs = getattr(sa, field_s)[idx]
        fa = getattr(sa, field_a)[idx]
        return jnp.where(is_anim[..., None] if fs.ndim == 2 else is_anim,
                         fa, fs)

    v0 = gather("s_v0", "a_v0")
    e1 = gather("s_e1", "a_e1")
    e2 = gather("s_e2", "a_e2")
    n0 = gather("s_n0", "a_n0")
    n1 = gather("s_n1", "a_n1")
    n2 = gather("s_n2", "a_n2")
    uv0 = gather("s_uv0", "a_uv0")
    uv1 = gather("s_uv1", "a_uv1")
    uv2 = gather("s_uv2", "a_uv2")
    inst_id = gather("s_inst", "a_inst")
    prim_id = gather("s_prim", "a_prim")

    # hit-space ray (object space for animated instances)
    o_hit = ray.o
    d_hit = ray.d
    if sa.n_anim_tris > 0:
        o_anim = jnp.zeros_like(ray.o)
        d_anim = jnp.zeros_like(ray.d)
        for (inst, _, _) in sa.anim_ranges:
            o_obj, d_obj = o_objs[inst]
            m = (inst_id == inst) & is_anim
            o_anim = jnp.where(m[:, None], o_obj, o_anim)
            d_anim = jnp.where(m[:, None], d_obj, d_anim)
        o_hit = jnp.where(is_anim[:, None], o_anim, ray.o)
        d_hit = jnp.where(is_anim[:, None], d_anim, ray.d)

    t, u, v = _recompute_bary(o_hit, d_hit, v0, e1, e2)
    t = jnp.where(valid, t, jnp.inf)

    p_local = v0 + u[:, None] * e1 + v[:, None] * e2
    ng_local = normalize(jnp.cross(e1, e2))
    w = 1.0 - u - v
    ns_local = normalize(w[:, None] * n0 + u[:, None] * n1 + v[:, None] * n2)
    uv = w[:, None] * uv0 + u[:, None] * uv1 + v[:, None] * uv2

    # world-space transform for animated hits (lerped at ray time,
    # reference instance.cpp:155-250)
    p = p_local
    ng = ng_local
    ns = ns_local
    if sa.n_anim_tris > 0:
        m0g = sa.inst_m0[jnp.maximum(inst_id, 0)]
        m1g = sa.inst_m1[jnp.maximum(inst_id, 0)]
        t0g = sa.inst_t0[jnp.maximum(inst_id, 0)]
        t1g = sa.inst_t1[jnp.maximum(inst_id, 0)]
        denom = jnp.where(t1g - t0g != 0.0, t1g - t0g, 1.0)
        uu = jnp.clip((ray.time - t0g) / denom, 0.0, 1.0)
        m_t = m0g * (1.0 - uu[:, None, None]) + m1g * uu[:, None, None]
        inv_t = affine_inverse(m_t)
        p_w = (m_t[:, :3, :3] @ p_local[..., None])[..., 0] + m_t[:, :3, 3]
        ng_w = normalize(
            (jnp.swapaxes(inv_t[:, :3, :3], -1, -2) @ ng_local[..., None])[..., 0])
        ns_w = normalize(
            (jnp.swapaxes(inv_t[:, :3, :3], -1, -2) @ ns_local[..., None])[..., 0])
        p = jnp.where(is_anim[:, None], p_w, p_local)
        ng = jnp.where(is_anim[:, None], ng_w, ng_local)
        ns = jnp.where(is_anim[:, None], ns_w, ns_local)

    # face the geometric normal with the shading normal (mitsuba convention:
    # both normals follow the mesh orientation; wi determines the side)
    sh_s, sh_t = coordinate_system(ns)
    wi_world = -ray.d
    wi = jnp.stack([dot(wi_world, sh_s), dot(wi_world, sh_t),
                    dot(wi_world, ns)], axis=-1)

    if active is not None:
        valid = valid & active

    return SurfaceInteraction(
        valid=valid, t=t, p=p, n=ng, sh_n=ns, sh_s=sh_s, sh_t=sh_t, uv=uv,
        wi=wi, inst=jnp.where(valid, inst_id, -1),
        prim=jnp.where(valid, prim_id, -1), time=ray.time)


def ray_test(sa: SceneArrays, ray: Ray, active=None):
    """Shadow/any-hit query (reference scene.cpp ray_test)."""
    n = ray.o.shape[0]
    best_t = jnp.full((n,), jnp.inf, ray.o.dtype)
    best_i = jnp.full((n,), -1, jnp.int32)
    if sa.n_static_tris > 0:
        best_t, best_i = _intersect_tris_scan(
            ray.o, ray.d, ray.maxt, sa.s_v0, sa.s_e1, sa.s_e2,
            (best_t, best_i))
    occluded = best_i >= 0
    if sa.n_anim_tris > 0:
        for (inst, start, count) in sa.anim_ranges:
            o_obj, d_obj, _, _ = _animated_object_rays(sa, inst, ray)
            sl = slice(start, start + count)
            t_a, i_a = _intersect_tris_scan(
                o_obj, d_obj, ray.maxt, sa.a_v0[sl], sa.a_e1[sl], sa.a_e2[sl],
                (jnp.full((n,), jnp.inf, ray.o.dtype),
                 jnp.full((n,), -1, jnp.int32)))
            took = i_a >= 0
            slot = jnp.where(took, i_a + start, 0)
            took = took & (sa.a_inst[slot] == inst)
            occluded = occluded | took
    if active is not None:
        occluded = occluded & active
    return occluded


__all__ = ["Scene", "SceneArrays", "ray_intersect", "ray_test", "TRI_CHUNK"]
