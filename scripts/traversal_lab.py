"""Traversal diagnostics: where does large-scene intersection time go?

Host-side culling statistics (replays the stream kernel's block-level slab
test in numpy over binned ray order) + optional on-chip kernel timing.

Usage:
  python scripts/traversal_lab.py stats        # CPU, culling stats
  python scripts/traversal_lab.py time         # TPU, isolated kernel timing
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

MODE = sys.argv[1] if len(sys.argv) > 1 else "stats"
if MODE == "stats":
    import jax
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax
import jax.numpy as jnp

import mitsuba3dopplertof_tpu as mi
from mitsuba3dopplertof_tpu.core import transform as tf
from mitsuba3dopplertof_tpu.core.transform import AnimatedTransform
from mitsuba3dopplertof_tpu.core.vec import Vec3
from mitsuba3dopplertof_tpu.render.types import Ray
from bench_suite import animated_mesh_scene, static_mesh_scene


def make_rays(sa, scene, n, kind, rng):
    """Three ray populations: camera (coherent), bounce (surface origins,
    cosine-ish directions), shadow (surface -> fixed light)."""
    # mesh surface points: sample triangle vertices as proxies
    v0 = np.stack([np.asarray(sa.tri("s" if sa.n_static_tris else "a", c))
                   for c in ("v0x", "v0y", "v0z")], -1)
    idx = rng.integers(0, v0.shape[0], n)
    p = v0[idx]
    # transform to world via instance 0 matrices (bench scenes: 1 instance)
    m0 = np.asarray(sa.inst_m0c)[:, 0].reshape(4, 3)   # (12,) rows
    pw = p @ m0[:3].T + m0[3]
    if kind == "camera":
        o = np.tile(np.array([[0.0, 0.0, -6.0]], np.float32), (n, 1))
        tgt = rng.uniform(-1.5, 1.5, (n, 3))
        d = tgt - o
    elif kind == "bounce":
        o = pw + rng.normal(0, 1e-3, (n, 3))
        d = rng.normal(size=(n, 3))
    else:  # shadow
        o = pw
        d = np.array([[0.0, 4.0, -4.0]]) - o
    d = d / np.linalg.norm(d, axis=1, keepdims=True)
    f32 = lambda a: jnp.asarray(a, jnp.float32)
    return Ray(Vec3(f32(o[:, 0]), f32(o[:, 1]), f32(o[:, 2])),
               Vec3(f32(d[:, 0]), f32(d[:, 1]), f32(d[:, 2])),
               f32(rng.uniform(0, 1, n)), f32(np.full(n, np.inf, np.float32)))


def cull_stats(sa, ray, rows, lanes=128):
    """Replay binned order + block slab tests in numpy; report mean
    fraction of chunks a block must visit."""
    from mitsuba3dopplertof_tpu.ops.ray_binning import bin_key
    aabb = np.asarray(sa.chunk_aabb)                     # (C, 6)
    live = aabb[:, 0] <= aabb[:, 3]
    lo = aabb[live, :3].min(0)
    hi = aabb[live, 3:].max(0)
    key = np.asarray(bin_key(ray, jnp.asarray(lo, jnp.float32),
                             jnp.asarray(hi, jnp.float32)))
    order = np.argsort(key, kind="stable")
    o = np.stack([np.asarray(ray.o.x), np.asarray(ray.o.y),
                  np.asarray(ray.o.z)], -1)[order]
    d = np.stack([np.asarray(ray.d.x), np.asarray(ray.d.y),
                  np.asarray(ray.d.z)], -1)[order]
    n = o.shape[0]
    blk = rows * lanes
    nb = n // blk
    o = o[:nb * blk].reshape(nb, blk, 3)
    d = d[:nb * blk].reshape(nb, blk, 3)
    ol, oh = o.min(1), o.max(1)                          # (nb, 3)
    dl, dh = d.min(1), d.max(1)
    bmin, bmax = aabb[:, :3], aabb[:, 3:]                # (C, 3)
    pass_ct = np.zeros(nb)
    t_lo = np.zeros((nb, aabb.shape[0]))
    t_hi = np.full((nb, aabb.shape[0]), 3e38)
    for ax in range(3):
        same = (dl[:, ax] > 1e-12) | (dh[:, ax] < -1e-12)  # (nb,)
        cand = []
        for p_ in (bmin[None, :, ax], bmax[None, :, ax]):
            for oo in (ol[:, None, ax], oh[:, None, ax]):
                num = p_ - oo                            # (nb, C)
                for dd in (dl[:, None, ax], dh[:, None, ax]):
                    cand.append(num / np.where(np.abs(dd) > 1e-12, dd, 1.0))
        cand = np.stack(cand, 0)
        lo_ax = np.where(same[:, None], cand.min(0), -3e38)
        hi_ax = np.where(same[:, None], cand.max(0), 3e38)
        t_lo = np.maximum(t_lo, lo_ax)
        t_hi = np.minimum(t_hi, hi_ax)
    visits = ((t_lo <= t_hi) & (t_lo <= 3e38) & live[None, :]).sum(1)
    return visits.mean(), visits.max(), live.sum()


def main():
    rng = np.random.default_rng(0)
    for name, build in [
        ("static-50k", lambda: static_mesh_scene(mi, tf, 160, 158, 1)),
        ("anim-40k", lambda: animated_mesh_scene(
            mi, tf, AnimatedTransform, 144, 140, 1)),
    ]:
        ntri, sc = build()
        sa = sc.compile()
        n = 1 << 19
        if MODE == "stats":
            for kind in ("camera", "bounce", "shadow"):
                ray = make_rays(sa, sc, n, kind, rng)
                for rows in (8, 64):
                    mean_v, max_v, nch = cull_stats(sa, ray, rows)
                    print(f"{name} {kind:7s} rows={rows:3d}: "
                          f"visit {mean_v:8.1f}/{nch} chunks "
                          f"({100*mean_v/nch:5.1f}%) max {max_v}",
                          flush=True)
        else:
            from mitsuba3dopplertof_tpu.ops.intersect_kernel import (
                intersect_pallas)
            for kind in ("camera", "bounce", "shadow"):
                ray = make_rays(sa, sc, n, kind, rng)
                for env in ("v2", "v1"):
                    os.environ["MI_STREAM_KERNEL"] = env
                    hit = intersect_pallas(sa, ray)
                    jax.block_until_ready(hit.t)         # compile+warm
                    t0 = time.time()
                    for _ in range(3):
                        hit = intersect_pallas(sa, ray)
                        jax.block_until_ready(hit.t)
                    dt = (time.time() - t0) / 3
                    print(f"{name} {kind:7s} {env}: "
                          f"{n/dt/1e6:8.2f} Mrays/s ({dt*1e3:.1f} ms)",
                          flush=True)


if __name__ == "__main__":
    main()
