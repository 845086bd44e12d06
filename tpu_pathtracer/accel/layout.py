"""DFS-threaded BVH layout for tile-coherent traversal.

The Karras build (lbvh.py) numbers internal nodes by sorted-leaf ranges, not by
traversal order.  This pass (host-side numpy, one-shot at scene load — the
analog of the reference's startup ``rebuild``, renderer/Renderer.mm:456-462)
re-numbers the *effective* tree (leaf-collapsed) in DFS preorder and packs it
for the traversal kernels:

  * DFS preorder makes ``first_child == node + 1``: a node's id is the order it
    is visited, so a tile of rays whose per-lane node pointers are advanced by
    "process min(pointer) each step" visits the union of their traversal sets
    exactly once, in order — the property that makes the Pallas kernel's
    tile-synchronous loop optimal for coherent rays.
  * ``miss`` (escape) links always point forward; the sentinel M means done.
  * Node records: (M, 8) f32 [bmin.xyz, bmax.xyz, pad2] plus a parallel
    (M, 2) int32 table [miss, meta] (meta = first_tri * 64 + tri_count;
    tri_count == 0 marks an internal node) — Mosaic has no scalar bitcast,
    so float and int node data live in separate VMEM tables.
  * Triangle record: 24 f32 lanes [p0.xyz, e1.xyz, e2.xyz, orig_idx,
    n0.xyz, n1.xyz, n2.xyz, material_id, light_index+1, pad2] in morton-sorted
    order, so every leaf is one contiguous run of rows.  Integer fields are
    stored as exact small floats (< 2^24).  A sentinel all-zeros row at index T
    serves lanes that miss.

Everything stays small enough to live entirely in VMEM for the bundled scenes
(effective nodes ~ 2*T/leaf_size).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from .lbvh import BVH

MAX_LEAF = 63  # tri_count field width (6 bits)
PREPASS_MAX = 64  # rows in the big-triangle pre-pass block


class BVHLayout(NamedTuple):
    nodes: jnp.ndarray           # (M, 8) float32 [bmin.xyz, bmax.xyz, pad2]
    nodes_meta: jnp.ndarray      # (M, 2) int32 [miss, first_tri*64 + count]
    tris: jnp.ndarray            # (T+1, 24) float32 (see module docstring)
    sorted_to_orig: jnp.ndarray  # (T,) int32 sorted slot -> original tri index
    num_nodes: int               # M (sentinel id == M)
    num_tris: int
    max_leaf: int                # max tri_count over leaves (static unroll bound)
    prepass: jnp.ndarray         # (PREPASS_MAX, 24) largest-area tri rows,
                                 # col 21 = sorted-row index (best_t priming)

    # window-walk kernel tables (ops/pallas_traverse.py window kernel):
    # nodes padded to a multiple of 8 rows so any aligned 8-row window is
    # fetchable; meta4 = [miss, first*64+count, tri_start, 0] padded 8 rows
    # past that; tris8 = tris padded to a multiple of 8 rows, col 21 = DFS
    # leaf node id owning each row (the window kernel's MT predicate).
    nodes8: jnp.ndarray          # (M8, 8) float32
    meta4: jnp.ndarray           # (M8 + 8, 4) int32
    tris8: jnp.ndarray           # (T8, 24) float32
    # Baldwin-Weber intersection rows, same row indexing as tris8:
    # (T8, 16) f32 [n0.xyz d0 | n1.xyz d1 | n2.xyz d2 | leaf_id, orig_id,
    # pad2] — the
    # hit test becomes three plane evaluations (t = -(n0.o+d0)/(n0.d),
    # u = n1.p+d1, v = n2.p+d2 at p = o+t*d), ~20% fewer vector ops per
    # tested row than Moller-Trumbore and no cross products in the hot loop.
    # Plane constants are ANCHORED at the scene-AABB center (``anchor``):
    # the kernel evaluates them at o - anchor, keeping |n.o + d| cancellation
    # at scene-extent scale even for scenes far from the world origin (the
    # MT form is translation-invariant and needs no anchor).
    tris8bw: jnp.ndarray         # (T8, 16) float32
    prepassbw: jnp.ndarray       # (PREPASS_MAX, 16) f32, col 12 = row index
    anchor: tuple                # (ax, ay, az) floats the BW planes are built about

    # leaf-box tables for the EXPERIMENTAL candidate-sweep kernels
    # (scripts/experimental_pallas_sweep.py; measured net-negative in prod):
    # one row per LEAF in DFS order — (L16, 8) f32 [bmin, bmax, pad2] (pad
    # rows inverted) + (L16, 4) i32 [first_tri, tri_count, dfs_node_id, 0].
    leafbox: jnp.ndarray         # (L16, 8) float32
    leafmeta: jnp.ndarray        # (L16, 4) int32
    num_leaves: int

    # component-major copies for the pure-JAX traversal path
    bmin: jnp.ndarray            # (3, M)
    bmax: jnp.ndarray            # (3, M)
    miss: jnp.ndarray            # (M,) int32
    first_tri: jnp.ndarray       # (M,) int32
    tri_count: jnp.ndarray       # (M,) int32 (0 = internal)
    p0: jnp.ndarray              # (3, T) sorted triangle vertices
    p1: jnp.ndarray
    p2: jnp.ndarray

    # Optional material-baked resolve table (cfg.bake_materials): the first
    # 24 columns are ``tris`` verbatim; columns 24.. append the hit
    # triangle's material constants [diffuse S, emissive S, ior, mtype,
    # (rough)] so ONE row gather resolves geometry AND materials (XLA's TPU
    # row-gather cost is per row, flat in width).  ``matmeta`` = (S,
    # has_rough) records the column split.  Only the nearest-hit resolve
    # reads this table; the traversal kernels keep the 24-col ``tris``.
    triswide: jnp.ndarray | None = None   # (T+1, 24 + 2S + 2 (+1))
    matmeta: tuple | None = None          # (spectrum_samples, has_rough)


def dfs_layout(
    bvh: BVH,
    normals=None,        # optional ((3,T), (3,T), (3,T)) in ORIGINAL tri order
    material_id=None,    # optional (T,) in original order
    light_index=None,    # optional (T,) in original order (-1 = not a light)
    mat_tables=None,     # optional dict: diffuse/emissive (S, M), ior (M,),
                         # mtype (M,), rough (M,) or None -> builds triswide
) -> BVHLayout:
    """Flatten the effective (leaf-collapsed) tree into DFS preorder."""
    left = np.asarray(bvh.left)
    right = np.asarray(bvh.right)
    is_leaf = np.asarray(bvh.is_leaf)
    first_tri = np.asarray(bvh.first_tri)
    tri_count = np.asarray(bvh.tri_count)
    bmin = np.asarray(bvh.bmin)
    bmax = np.asarray(bvh.bmax)

    # Iterative DFS preorder over the effective tree; post-order accumulation
    # of subtree sizes gives the escape links: miss[pos] = pos + subtree_size.
    order: list[int] = []
    sizes: list[int] = []
    stack: list[tuple[int, int, bool]] = [(int(bvh.root), -1, False)]
    open_pos: list[int] = []  # positions awaiting their post-visit size fix-up
    while stack:
        node, _, post = stack.pop()
        if post:
            p = open_pos.pop()
            sizes[p] = (len(order) - p)
            continue
        order.append(node)
        sizes.append(1)
        if not is_leaf[node]:
            open_pos.append(len(order) - 1)
            stack.append((node, -1, True))  # post-visit marker
            stack.append((int(right[node]), -1, False))
            stack.append((int(left[node]), -1, False))

    m = len(order)
    order_arr = np.asarray(order, np.int64)
    new_miss = (np.arange(m) + np.asarray(sizes)).astype(np.int32)

    out_bmin = bmin[:, order_arr]
    out_bmax = bmax[:, order_arr]
    out_first = first_tri[order_arr].astype(np.int32)
    counts = np.where(is_leaf[order_arr], tri_count[order_arr], 0).astype(np.int32)
    max_leaf = int(counts.max()) if m else 1
    if max_leaf > MAX_LEAF:
        raise ValueError(f"leaf size {max_leaf} exceeds packable {MAX_LEAF}")

    # The window kernel requires leaf triangle runs to appear in DFS leaf
    # order (so a window's triangles are one contiguous range).  Builders
    # partition the sorted-triangle array left/right, which *should* already
    # give DFS order, but enforce it by remapping when needed.
    p0 = np.asarray(bvh.p0)
    p1 = np.asarray(bvh.p1)
    p2 = np.asarray(bvh.p2)
    num_tris = p0.shape[1]
    s2o = np.asarray(bvh.sorted_to_orig, np.int64)
    leaf_mask = counts > 0
    leaf_pos = np.flatnonzero(leaf_mask)
    firsts = out_first[leaf_pos]
    cnts = counts[leaf_pos]
    contiguous = (
        len(leaf_pos) > 0
        and firsts[0] == 0
        and np.all(firsts[1:] == firsts[:-1] + cnts[:-1])
        and firsts[-1] + cnts[-1] == num_tris
    )
    if not contiguous:
        # remap sorted-tri order to DFS leaf order
        perm = np.concatenate(
            [np.arange(f, f + c) for f, c in zip(firsts, cnts)]
        ) if len(leaf_pos) else np.arange(0)
        assert perm.size == num_tris, "leaves must partition the triangles"
        p0 = p0[:, perm]
        p1 = p1[:, perm]
        p2 = p2[:, perm]
        s2o = s2o[perm]
        out_first[leaf_pos] = np.cumsum(np.concatenate([[0], cnts[:-1]]))

    meta = ((out_first.astype(np.uint32) << 6) | counts.astype(np.uint32)).astype(np.int32)
    nodes = np.zeros((m, 8), np.float32)
    nodes[:, 0:3] = out_bmin.T
    nodes[:, 3:6] = out_bmax.T
    nodes_meta = np.stack([new_miss, meta], axis=1).astype(np.int32)
    tris = np.zeros((num_tris + 1, 24), np.float32)  # +1: all-zeros miss row
    tris[:num_tris, 0:3] = p0.T
    tris[:num_tris, 3:6] = (p1 - p0).T
    tris[:num_tris, 6:9] = (p2 - p0).T
    tris[:num_tris, 9] = s2o.astype(np.float32)
    if normals is not None:
        n0, n1, n2 = (np.asarray(n)[:, s2o] for n in normals)
        tris[:num_tris, 10:13] = n0.T
        tris[:num_tris, 13:16] = n1.T
        tris[:num_tris, 16:19] = n2.T
    if material_id is not None:
        tris[:num_tris, 19] = np.asarray(material_id)[s2o].astype(np.float32)
    if light_index is not None:
        # stored +1 so the sentinel row's 0 decodes to light_index = -1
        tris[:num_tris, 20] = np.asarray(light_index)[s2o].astype(np.float32) + 1.0

    # Big-triangle pre-pass block: the PREPASS_MAX largest-area triangles,
    # tested before the walk to prime best_t (in closed scenes most incoherent
    # rays terminate on a handful of large wall/floor triangles; a primed
    # best_t culls the subtrees behind them via the `enter < best_t` test).
    # Padded with the all-zero sentinel row (det == 0 -> never hits).
    e1 = tris[:num_tris, 3:6]
    e2 = tris[:num_tris, 6:9]
    area = 0.5 * np.linalg.norm(np.cross(e1, e2), axis=1)
    by_area = np.argsort(-area)[:PREPASS_MAX]
    prepass = np.zeros((PREPASS_MAX, 24), np.float32)
    prepass[: by_area.size] = tris[by_area]
    prepass[: by_area.size, 21] = by_area.astype(np.float32)

    # ---- window-walk kernel tables ----
    # col 21 of the main table = DFS leaf node id owning the row
    leaf_ids = np.zeros(num_tris, np.float32)
    for pos in leaf_pos:
        f, c = out_first[pos], counts[pos]
        leaf_ids[f:f + c] = pos
    tris[:num_tris, 21] = leaf_ids

    m8 = max(-(-m // 32) * 32, 32)  # window kernel supports widths up to 32
    nodes8 = np.zeros((m8, 8), np.float32)
    nodes8[:m] = nodes
    # Pad rows: an inverted box.  NOTE this does NOT reject every direction
    # sign combination (mixed signs can still pass the slab test — see the
    # leafbox comment below); safety for pad rows rests on the kernel's
    # invariants instead: a done lane (cur >= sentinel m) can drift at most
    # +window rows per the chain loop (meta4 carries +8 pad rows for
    # exactly this), pad rows have count == 0 so they are never "leaves",
    # and no triangle row's leaf id can equal a drifted cursor.
    nodes8[m:, 0:3] = 1e30
    nodes8[m:, 3:6] = -1e30
    # tri_start[n]: first DFS-ordered triangle at-or-after node n
    tri_start = np.full(m8 + 8, num_tris, np.int32)
    for n in range(m - 1, -1, -1):
        if counts[n] > 0:
            tri_start[n] = out_first[n]
        else:
            tri_start[n] = tri_start[n + 1]
    meta4 = np.zeros((m8 + 8, 4), np.int32)
    meta4[:m, 0] = new_miss
    meta4[m:, 0] = m          # sentinel (never followed)
    meta4[:m, 1] = meta[:]
    meta4[:, 2] = tri_start
    # +72 pad rows: MT fetches up to 64 rows from an 8-aligned start
    t8 = -(-(num_tris + 1) // 8) * 8 + 72
    tris8 = np.zeros((t8, 24), np.float32)
    tris8[: num_tris + 1] = tris

    # ---- Baldwin-Weber plane rows (same indexing as tris8) ----
    # Anchor the plane constants at the scene-AABB center: d = -(n . (p0-a))
    # evaluated at (o - a) keeps the n.o + d cancellation at scene-extent
    # scale, so a scene translated far from the world origin loses no t
    # precision vs the translation-invariant MT form.
    if num_tris:
        vmin = np.minimum(np.minimum(p0.min(1), p1.min(1)), p2.min(1))
        vmax = np.maximum(np.maximum(p0.max(1), p1.max(1)), p2.max(1))
        anchor = ((vmin + vmax) * 0.5).astype(np.float32)
    else:
        anchor = np.zeros(3, np.float32)

    def bw_rows(tri_rows: np.ndarray, leaf_col: np.ndarray) -> np.ndarray:
        """(R, 24) MT rows -> (R, 16) BW rows [n0 d0 n1 d1 n2 d2 leaf orig pad2]
        (col 13 = ORIGINAL triangle id — read by _hit8's with_orig latch for
        the fused walk's gather-free occlusion-target check; do not reuse).

        Degenerate rows (zero normal) produce all-zero planes: den == 0 is
        the kernel's reject test, exactly like det == 0 in MT.
        """
        p0r = tri_rows[:, 0:3].astype(np.float64) - anchor.astype(np.float64)
        e1r = tri_rows[:, 3:6].astype(np.float64)
        e2r = tri_rows[:, 6:9].astype(np.float64)
        n = np.cross(e1r, e2r)
        c1 = np.cross(e2r, n)
        c2 = np.cross(n, e1r)
        s1 = (c1 * e1r).sum(1, keepdims=True)
        s2 = (c2 * e2r).sum(1, keepdims=True)
        ok = (np.abs(s1) > 0) & (np.abs(s2) > 0)
        n1 = np.where(ok, c1 / np.where(s1 == 0, 1, s1), 0.0)
        n2 = np.where(ok, c2 / np.where(s2 == 0, 1, s2), 0.0)
        n = np.where(ok, n, 0.0)
        out = np.zeros((tri_rows.shape[0], 16), np.float32)
        out[:, 0:3] = n
        out[:, 3] = -(n * p0r).sum(1)
        out[:, 4:7] = n1
        out[:, 7] = -(n1 * p0r).sum(1)
        out[:, 8:11] = n2
        out[:, 11] = -(n2 * p0r).sum(1)
        out[:, 12] = leaf_col
        # col 13: original triangle id, so the fused path+shadow walk can
        # latch the occlusion target id without a row gather (MT rows carry
        # it in col 9)
        out[:, 13] = tri_rows[:, 9]
        return out

    tris8bw = bw_rows(tris8, tris8[:, 21])
    tris8bw[num_tris:] = 0.0  # sentinel + pad rows can never hit (den == 0)
    tris8bw[num_tris:, 12] = -1.0
    tris8bw[num_tris:, 13] = -1.0
    prepassbw = bw_rows(prepass, prepass[:, 21])
    prepassbw[by_area.size:] = 0.0

    # ---- leaf-box tables (candidate-sweep kernels) ----
    num_leaves = len(leaf_pos)
    l16 = max(-(-num_leaves // 16) * 16, 16)
    leafbox = np.zeros((l16, 8), np.float32)
    # pad rows: a degenerate far point-box with alternating axis signs —
    # its slab enter is +inf (or enter > exit) for EVERY direction sign
    # combination, so `enter < best_t` can never pass.  (An "inverted" box
    # bmin=+B/bmax=-B is NOT safe here: with mixed direction signs each
    # axis interval becomes [-inf, +inf] and the test passes.)
    leafbox[:, 0:3] = (1e30, -1e30, 1e30)
    leafbox[:, 3:6] = (1e30, -1e30, 1e30)
    leafbox[:num_leaves, 0:3] = out_bmin[:, leaf_pos].T
    leafbox[:num_leaves, 3:6] = out_bmax[:, leaf_pos].T
    leafmeta = np.zeros((l16, 4), np.int32)
    leafmeta[:num_leaves, 0] = out_first[leaf_pos]
    leafmeta[:num_leaves, 1] = counts[leaf_pos]
    leafmeta[:num_leaves, 2] = leaf_pos

    # ---- material-baked resolve rows (cfg.bake_materials) ----
    triswide = None
    matmeta = None
    if mat_tables is not None and material_id is not None:
        mid = np.asarray(material_id)[s2o].astype(np.int64)   # (T,) sorted
        diffuse = np.asarray(mat_tables["diffuse"], np.float32)   # (S, M)
        emissive = np.asarray(mat_tables["emissive"], np.float32)
        s = diffuse.shape[0]
        rough = mat_tables.get("rough")
        cols = [diffuse[:, mid].T, emissive[:, mid].T,
                np.asarray(mat_tables["ior"], np.float32)[mid][:, None],
                np.asarray(mat_tables["mtype"], np.float32)[mid][:, None]]
        if rough is not None:
            cols.append(np.asarray(rough, np.float32)[mid][:, None])
        matcols = np.concatenate(cols, axis=1)                # (T, K)
        wide = np.zeros((num_tris + 1, 24 + matcols.shape[1]), np.float32)
        wide[:, :24] = tris
        wide[:num_tris, 24:] = matcols  # sentinel row stays all-zero
        triswide = jnp.asarray(wide)
        matmeta = (s, rough is not None)

    return BVHLayout(
        nodes=jnp.asarray(nodes),
        nodes_meta=jnp.asarray(nodes_meta),
        tris=jnp.asarray(tris),
        sorted_to_orig=jnp.asarray(s2o, jnp.int32),
        num_nodes=m,
        num_tris=num_tris,
        max_leaf=max_leaf,
        prepass=jnp.asarray(prepass),
        nodes8=jnp.asarray(nodes8),
        meta4=jnp.asarray(meta4),
        tris8=jnp.asarray(tris8),
        tris8bw=jnp.asarray(tris8bw),
        prepassbw=jnp.asarray(prepassbw),
        anchor=tuple(float(a) for a in anchor),
        leafbox=jnp.asarray(leafbox),
        leafmeta=jnp.asarray(leafmeta),
        num_leaves=num_leaves,
        bmin=jnp.asarray(out_bmin),
        bmax=jnp.asarray(out_bmax),
        miss=jnp.asarray(new_miss),
        first_tri=jnp.asarray(out_first),
        tri_count=jnp.asarray(counts),
        p0=jnp.asarray(p0),
        p1=jnp.asarray(p1),
        p2=jnp.asarray(p2),
        triswide=triswide,
        matmeta=matmeta,
    )
