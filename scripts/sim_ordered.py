"""Estimate the win from octant-ordered (near-first) traversal, offline.

Simulates per-ray node visit counts on a diffuse wavefront for:
  A. current DFS fixed order (escape links), best_t culling + prepass priming
  B. per-octant child order: child nearer along the ray's dominant-sign axis
     visited first (what an octant-specialized DFS layout would give)
Also reports tile-union window counts for both, which is what the kernel
actually pays.  Pure numpy, no TPU.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/tests/.jax_cache")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from tpu_pathtracer.accel import build_layout  # noqa: E402
from tpu_pathtracer.accel.lbvh import build as lbvh_build  # noqa: E402
from tpu_pathtracer.core.sampling import generate_diffuse_bounce  # noqa: E402
from tpu_pathtracer.models.camera import Camera, generate_rays_flat  # noqa: E402
from tpu_pathtracer.ops.intersect import intersect_brute  # noqa: E402
from tpu_pathtracer.render.order import make_order  # noqa: E402
from tpu_pathtracer.scene import load_scene, scene_path  # noqa: E402

W, H = 480, 270
NRAYS = W * H


def build_binary(scene):
    """Reconstruct the binary (pre-DFS) tree arrays from the layout's
    effective tree: we use the DFS-threaded layout itself and recover
    children: internal node n has first child n+1 and second child =
    miss of (n+1) chased... simpler: child2 = dfs position where the
    first child's subtree ends = miss[n+1]."""
    lay = build_layout(scene)
    miss = np.asarray(lay.miss)
    counts = np.asarray(lay.tri_count)
    first = np.asarray(lay.first_tri)
    bmin = np.asarray(lay.bmin).T  # (M, 3)
    bmax = np.asarray(lay.bmax).T
    M = lay.num_nodes
    left = np.full(M, -1)
    right = np.full(M, -1)
    for n in range(M):
        if counts[n] == 0:
            left[n] = n + 1
            right[n] = miss[n + 1]
    return lay, miss, counts, first, bmin, bmax, left, right


def trace_rays(scene, lay):
    order = make_order(H, W, 0, 768)
    cam = Camera.reference_default()
    jitter = jnp.zeros((2, NRAYS), jnp.float32)
    o, d = generate_rays_flat(cam, order.rows, order.cols, jitter, H, W)
    from tpu_pathtracer.ops.intersect import shade_from_scene

    hit = shade_from_scene(
        scene, intersect_brute(o, d, scene.p0, scene.p1, scene.p2)
    )
    valid = np.asarray(jnp.isfinite(hit.t))
    u = jax.random.uniform(jax.random.PRNGKey(7), (2, NRAYS))
    nd = generate_diffuse_bounce(u, hit.normal)
    so = hit.pos + hit.normal * 1e-4
    return np.asarray(so), np.asarray(nd), valid


def visits(o, d, bmin, bmax, counts, left, right, tris, order_mode, prime_t):
    """Per-ray: walk with an explicit stack, near-child-first when
    order_mode == 'ordered'; returns (#internal visits, #leaf visits,
    visited leaf id list)."""
    inv = np.where(np.abs(d) > 1e-12, 1.0 / d, np.inf)
    best = prime_t
    stack = [0]
    nint = nleaf = 0
    leaves = []
    while stack:
        n = stack.pop()
        t0 = (bmin[n] - o) * inv
        t1 = (bmax[n] - o) * inv
        enter = np.minimum(t0, t1).max()
        exit_ = np.maximum(t0, t1).min()
        if not (enter <= exit_ and exit_ > 0 and enter < best):
            continue
        if counts[n] > 0:
            nleaf += 1
            leaves.append(n)
            # MT the leaf: shrink best to exact nearest in leaf
            for trow in tris[n]:
                tt = mt_one(o, d, trow)
                if tt is not None and 1e-4 < tt < best:
                    best = tt
            continue
        nint += 1
        l, r = left[n], right[n]
        if order_mode == "ordered":
            # near child first: by box-center distance along the ray
            cl = (bmin[l] + bmax[l]) * 0.5
            cr = (bmin[r] + bmax[r]) * 0.5
            if np.dot(cr - cl, d) < 0:
                l, r = r, l
        stack.append(r)
        stack.append(l)
    return nint, nleaf, leaves


def mt_one(o, d, trow):
    p0, e1, e2 = trow[0:3], trow[3:6], trow[6:9]
    pv = np.cross(d, e2)
    det = np.dot(e1, pv)
    if det == 0:
        return None
    invd = 1.0 / det
    tv = o - p0
    u = np.dot(tv, pv) * invd
    qv = np.cross(tv, e1)
    v = np.dot(d, qv) * invd
    if u < 0 or v < 0 or u + v > 1:
        return None
    return np.dot(e2, qv) * invd


def main():
    scene = load_scene(scene_path("CornellBox-Water-plastic"))
    lay, miss, counts, first, bmin, bmax, left, right = build_binary(scene)
    trist = np.asarray(lay.tris)
    leaf_tris = {
        n: trist[first[n]: first[n] + counts[n]]
        for n in range(lay.num_nodes) if counts[n] > 0
    }
    o, d, valid = trace_rays(scene, lay)
    pre = np.asarray(lay.prepass)

    rng = np.random.default_rng(0)
    idx = rng.choice(np.flatnonzero(valid), 1500, replace=False)
    stats = {"dfs": [0, 0], "ordered": [0, 0]}
    nofb = []  # leaf-box crossings with prepass prime only (no MT feedback)
    for i in idx:
        oi, di = o[:, i], d[:, i]
        # prepass prime
        best = np.inf
        for trow in pre:
            if np.abs(trow).sum() == 0:
                continue
            tt = mt_one(oi, di, trow)
            if tt is not None and 1e-4 < tt < best:
                best = tt
        for mode in ("dfs", "ordered"):
            ni, nl, _ = visits(
                oi, di, bmin, bmax, counts, left, right, leaf_tris, mode, best
            )
            stats[mode][0] += ni
            stats[mode][1] += nl
        # candidate-pair pipeline input: how many leaf AABBs does the primed
        # segment cross when best_t never shrinks during the sweep?
        inv = np.where(np.abs(di) > 1e-12, 1.0 / di, np.inf)
        cnt = 0
        for nleaf_ in np.flatnonzero(counts > 0):
            t0 = (bmin[nleaf_] - oi) * inv
            t1 = (bmax[nleaf_] - oi) * inv
            enter = np.minimum(t0, t1).max()
            exit_ = np.maximum(t0, t1).min()
            if enter <= exit_ and exit_ > 0 and enter < best:
                cnt += 1
        nofb.append(cnt)
    n = len(idx)
    for mode, (ni, nl) in stats.items():
        print(f"{mode:8s}: internal {ni/n:6.1f}  leaf {nl/n:5.1f}  "
              f"(~MT tests {nl/n*lay.max_leaf:6.0f})")
    nofb = np.array(nofb)
    print(f"no-feedback leaf-box candidates (leaf{lay.max_leaf}): "
          f"mean {nofb.mean():.1f}  p50 {np.percentile(nofb,50):.0f}  "
          f"p95 {np.percentile(nofb,95):.0f}  p99 {np.percentile(nofb,99):.0f}  "
          f"max {nofb.max()}")


if __name__ == "__main__":
    main()
