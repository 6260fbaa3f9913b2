"""Shape plugins.

Every shape compiles to an indexed triangle mesh in *object space* plus a
(possibly animated) to_world transform. Analytic primitives (sphere, disk,
cylinder) are tessellated for the v1 triangle-only intersector; rectangle and
cube are exact (planar). Reference plugin inventory:
src/shapes/{rectangle,cube,sphere,disk,cylinder,obj,ply,serialized,
shapegroup,instance}.cpp.

The reference's animated-shape pipeline rewrites animated shapes into
shapegroup+instance (reference src/core/xml.cpp:1166-1191); here every shape
*is* an instance: it owns a triangle range and two keyframe matrices, so the
intersector treats static and animated shapes uniformly.
"""

from __future__ import annotations

import math
from typing import Optional

import numpy as np

from ..core.properties import Properties, register_plugin, create_plugin
from ..core.transform import AnimatedTransform


class Mesh:
    """Host-side indexed triangle mesh (numpy, object space)."""

    def __init__(self, vertices: np.ndarray, faces: np.ndarray,
                 normals: Optional[np.ndarray] = None,
                 uvs: Optional[np.ndarray] = None,
                 attributes: Optional[dict] = None):
        self.vertices = np.asarray(vertices, dtype=np.float64).reshape(-1, 3)
        self.faces = np.asarray(faces, dtype=np.int64).reshape(-1, 3)
        self.normals = (np.asarray(normals, dtype=np.float64).reshape(-1, 3)
                        if normals is not None else None)
        self.uvs = (np.asarray(uvs, dtype=np.float64).reshape(-1, 2)
                    if uvs is not None else None)
        # named per-vertex attributes, e.g. {"vertex_color": (V, k) array}
        # (reference Mesh attribute system, mesh.cpp add_attribute)
        self.attributes = dict(attributes or {})

    @property
    def n_triangles(self) -> int:
        return self.faces.shape[0]

    def face_normals(self) -> np.ndarray:
        v0 = self.vertices[self.faces[:, 0]]
        e1 = self.vertices[self.faces[:, 1]] - v0
        e2 = self.vertices[self.faces[:, 2]] - v0
        n = np.cross(e1, e2)
        l = np.linalg.norm(n, axis=-1, keepdims=True)
        return n / np.maximum(l, 1e-20)

    def surface_areas(self, to_world: np.ndarray) -> np.ndarray:
        """Per-triangle world-space areas under an affine transform."""
        vw = self.vertices @ to_world[:3, :3].T + to_world[:3, 3]
        v0 = vw[self.faces[:, 0]]
        e1 = vw[self.faces[:, 1]] - v0
        e2 = vw[self.faces[:, 2]] - v0
        return 0.5 * np.linalg.norm(np.cross(e1, e2), axis=-1)


class Shape:
    """Base: a mesh + to_world (static or 2-keyframe animated) + refs."""

    def __init__(self, props: Properties):
        self.id = props.id
        self.to_world: AnimatedTransform = props.get_animated_transform(
            "to_world", AnimatedTransform())
        # reference shape.cpp flip_normals: negate geometric + shading
        # normals (turn the shape inside out); applied per instance in
        # render/scene.py build_si
        self.flip_normals = props.get_bool("flip_normals", False)
        self.bsdf = None          # nested/referenced BSDF child
        self.emitter = None       # area emitter attached to this shape
        self.sensor = None        # irradiancemeter bound to this shape
        self.interior_medium = None
        self.exterior_medium = None
        self.mesh: Optional[Mesh] = None
        # wire children passed through Properties (the reference receives
        # them the same way via Properties object references)
        from ..bsdfs import BSDF
        from ..emitters import Emitter
        from ..media import Medium
        for key, v in props.objects():
            if isinstance(v, BSDF):
                self.bsdf = v
            elif isinstance(v, Emitter):
                self.emitter = v
                v.shape = self
            elif v.__class__.__name__ == "IrradianceMeter":
                self.sensor = v
                v.shape = self
            elif isinstance(v, Medium):
                if key == "exterior":
                    self.exterior_medium = v
                else:
                    self.interior_medium = v

    def build_mesh(self) -> Mesh:
        raise NotImplementedError


# ---------------------------------------------------------------------------
# Primitive generators
# ---------------------------------------------------------------------------

def make_rectangle() -> Mesh:
    """Unit rectangle [-1,1]^2 in the XY plane, normal +Z, uv in [0,1]^2
    (reference src/shapes/rectangle.cpp:104-121)."""
    v = np.array([[-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0]], dtype=np.float64)
    uv = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], dtype=np.float64)
    f = np.array([[0, 1, 2], [2, 3, 0]])
    n = np.tile([[0.0, 0.0, 1.0]], (4, 1))
    return Mesh(v, f, n, uv)


def make_cube() -> Mesh:
    """[-1,1]^3 cube with the reference's 24-vertex layout
    (reference src/shapes/cube.cpp:114-140)."""
    v = np.array([
        [1, -1, -1], [1, -1, 1], [-1, -1, 1], [-1, -1, -1],
        [1, 1, -1], [-1, 1, -1], [-1, 1, 1], [1, 1, 1],
        [1, -1, -1], [1, 1, -1], [1, 1, 1], [1, -1, 1],
        [1, -1, 1], [1, 1, 1], [-1, 1, 1], [-1, -1, 1],
        [-1, -1, 1], [-1, 1, 1], [-1, 1, -1], [-1, -1, -1],
        [1, 1, -1], [1, -1, -1], [-1, -1, -1], [-1, 1, -1],
    ], dtype=np.float64)
    n = np.array(
        [[0, -1, 0]] * 4 + [[0, 1, 0]] * 4 + [[1, 0, 0]] * 4 +
        [[0, 0, 1]] * 4 + [[-1, 0, 0]] * 4 + [[0, 0, -1]] * 4,
        dtype=np.float64)
    uv = np.array([[0, 1], [1, 1], [1, 0], [0, 0]] * 6, dtype=np.float64)
    f = np.array([
        [0, 1, 2], [3, 0, 2], [4, 5, 6], [7, 4, 6],
        [8, 9, 10], [11, 8, 10], [12, 13, 14], [15, 12, 14],
        [16, 17, 18], [19, 16, 18], [20, 21, 22], [23, 20, 22],
    ])
    return Mesh(v, f, n, uv)


def make_sphere(subdiv_theta: int = 64, subdiv_phi: int = 128) -> Mesh:
    """Unit sphere, lat-long tessellation with smooth vertex normals.

    The reference sphere (src/shapes/sphere.cpp) is analytic; an analytic
    quadric path is planned for the Pallas intersector — this tessellation
    keeps sphere scenes working meanwhile.
    """
    th = np.linspace(0.0, math.pi, subdiv_theta + 1)
    ph = np.linspace(0.0, 2.0 * math.pi, subdiv_phi + 1)
    T, P = np.meshgrid(th, ph, indexing="ij")
    x = np.sin(T) * np.cos(P)
    y = np.sin(T) * np.sin(P)
    z = np.cos(T)
    verts = np.stack([x, y, z], axis=-1).reshape(-1, 3)
    uvs = np.stack([P / (2 * math.pi), 1.0 - T / math.pi], axis=-1).reshape(-1, 2)
    faces = []
    W = subdiv_phi + 1
    for i in range(subdiv_theta):
        for j in range(subdiv_phi):
            a, b, c, d = i * W + j, i * W + j + 1, (i + 1) * W + j + 1, (i + 1) * W + j
            if i > 0:
                faces.append([a, b, c])
            if i < subdiv_theta - 1:
                faces.append([a, c, d])
    return Mesh(verts, np.asarray(faces), normals=verts.copy(), uvs=uvs)


def make_disk(subdiv: int = 64) -> Mesh:
    """Unit disk in the XY plane (reference src/shapes/disk.cpp)."""
    ang = np.linspace(0, 2 * math.pi, subdiv, endpoint=False)
    rim = np.stack([np.cos(ang), np.sin(ang), np.zeros_like(ang)], axis=-1)
    verts = np.concatenate([[[0.0, 0.0, 0.0]], rim], axis=0)
    faces = [[0, 1 + i, 1 + (i + 1) % subdiv] for i in range(subdiv)]
    n = np.tile([[0.0, 0.0, 1.0]], (len(verts), 1))
    uv = 0.5 * (verts[:, :2] + 1.0)
    return Mesh(verts, np.asarray(faces), n, uv)


def make_cylinder(subdiv: int = 64) -> Mesh:
    """Open cylinder along +Z, radius 1, z in [0,1] (reference src/shapes/cylinder.cpp)."""
    ang = np.linspace(0, 2 * math.pi, subdiv, endpoint=False)
    c, s = np.cos(ang), np.sin(ang)
    bot = np.stack([c, s, np.zeros_like(ang)], axis=-1)
    top = np.stack([c, s, np.ones_like(ang)], axis=-1)
    verts = np.concatenate([bot, top], axis=0)
    normals = np.concatenate([np.stack([c, s, np.zeros_like(ang)], axis=-1)] * 2, axis=0)
    faces = []
    for i in range(subdiv):
        j = (i + 1) % subdiv
        faces.append([i, j, subdiv + j])
        faces.append([i, subdiv + j, subdiv + i])
    uv = np.concatenate([
        np.stack([ang / (2 * math.pi), np.zeros_like(ang)], axis=-1),
        np.stack([ang / (2 * math.pi), np.ones_like(ang)], axis=-1)], axis=0)
    return Mesh(verts, np.asarray(faces), normals, uv)


# ---------------------------------------------------------------------------
# Plugins
# ---------------------------------------------------------------------------

@register_plugin("shape", "rectangle")
class RectangleShape(Shape):
    def __init__(self, props: Properties):
        super().__init__(props)
        self.mesh = make_rectangle()


@register_plugin("shape", "cube")
class CubeShape(Shape):
    def __init__(self, props: Properties):
        super().__init__(props)
        self.mesh = make_cube()


@register_plugin("shape", "sphere")
class SphereShape(Shape):
    """Analytic unit sphere under its to_world transform (reference
    src/shapes/sphere.cpp). No tessellation: the intersection kernels solve
    the quadratic in object space."""
    is_analytic_sphere = True

    def __init__(self, props: Properties):
        super().__init__(props)
        import numpy as np
        from ..core import transform as tf
        center = props.get_vector("center", np.zeros(3))
        radius = props.get_float("radius", 1.0)
        base = self.to_world
        local = tf.translate(center) @ tf.scale([radius] * 3)
        if base.animated:
            self.to_world = AnimatedTransform(
                keyframes=[(t, m @ local) for t, m in base.keyframes])
        else:
            self.to_world = AnimatedTransform(
                static_matrix=base.static_matrix @ local)
        self.mesh = None


@register_plugin("shape", "disk")
class DiskShape(Shape):
    def __init__(self, props: Properties):
        super().__init__(props)
        self.mesh = make_disk()


@register_plugin("shape", "cylinder")
class CylinderShape(Shape):
    def __init__(self, props: Properties):
        super().__init__(props)
        self.mesh = make_cylinder()


@register_plugin("shape", "obj")
class ObjShape(Shape):
    def __init__(self, props: Properties):
        super().__init__(props)
        from ..io.mesh_loaders import load_obj
        from ..core.fresolver import resolve_filename
        filename = resolve_filename(props.get_string("filename"))
        props.mark_queried("face_normals")
        self.mesh = load_obj(filename)


@register_plugin("shape", "ply")
class PlyShape(Shape):
    def __init__(self, props: Properties):
        super().__init__(props)
        from ..io.mesh_loaders import load_ply
        from ..core.fresolver import resolve_filename
        filename = resolve_filename(props.get_string("filename"))
        props.mark_queried("face_normals")
        self.mesh = load_ply(filename)


@register_plugin("shape", "serialized")
class SerializedShape(Shape):
    def __init__(self, props: Properties):
        super().__init__(props)
        from ..io.mesh_loaders import load_serialized
        from ..core.fresolver import resolve_filename
        filename = resolve_filename(props.get_string("filename"))
        shape_index = props.get_int("shape_index", 0)
        props.mark_queried("face_normals")
        self.mesh = load_serialized(filename, shape_index)


@register_plugin("shape", "shapegroup")
class ShapeGroup(Shape):
    """Container of shapes for instancing (reference src/shapes/shapegroup.cpp).
    Holds children; instances expand it at scene-compile time."""

    def __init__(self, props: Properties):
        super().__init__(props)
        self.children = []
        for key, v in props.objects():
            if isinstance(v, Shape):
                self.children.append(v)


@register_plugin("shape", "instance")
class Instance(Shape):
    """Instance of a shapegroup with a (possibly animated) transform
    (reference src/shapes/instance.cpp, incl. the fork's animated-transform
    support at instance.cpp:62-63,155-250)."""

    def __init__(self, props: Properties):
        super().__init__(props)
        self.group = None
        for key, v in props.objects():
            if isinstance(v, ShapeGroup):
                self.group = v
        if self.group is None:
            raise RuntimeError("instance: requires a shapegroup child/ref")


__all__ = ["Shape", "Mesh", "ShapeGroup", "Instance",
           "make_rectangle", "make_cube", "make_sphere", "make_disk",
           "make_cylinder"]


@register_plugin("shape", "merge")
class MergeShape(Shape):
    """reference src/shapes/merge.cpp — merges child meshes that share a
    BSDF into one mesh (an optimization pass in the reference; here children
    are concatenated into a single triangle soup)."""

    def __init__(self, props: Properties):
        super().__init__(props)
        children = [v for _, v in props.objects() if isinstance(v, Shape)]
        if not children:
            raise RuntimeError("merge: requires child shapes")
        verts, faces, base = [], [], 0
        for ch in children:
            if ch.mesh is None:
                raise RuntimeError("merge: analytic children not supported")
            m0 = (ch.to_world.static_matrix if not ch.to_world.animated
                  else ch.to_world.matrices()[0])
            v = ch.mesh.vertices @ m0[:3, :3].T + m0[:3, 3]
            verts.append(v)
            faces.append(ch.mesh.faces + base)
            base += v.shape[0]
        self.mesh = Mesh(np.concatenate(verts), np.concatenate(faces))
        if children[0].bsdf is not None and self.bsdf is None:
            self.bsdf = children[0].bsdf


@register_plugin("shape", "blender")
class BlenderShape(Shape):
    """reference src/shapes/blender.cpp — zero-copy Blender mesh import.
    Only meaningful inside a Blender process; raises a clear error here."""

    def __init__(self, props: Properties):
        raise RuntimeError(
            "shape type 'blender' imports in-memory Blender meshes and is "
            "only available inside Blender; export to PLY/OBJ instead")
