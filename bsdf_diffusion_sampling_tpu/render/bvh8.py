"""8-wide BVH for the Pallas packet-traversal kernel (render/traverse8.py).

Why a second BVH: the binary lockstep traversal (render/bvh.py) pays one
XLA gather/scatter round per node visit per ray — measured ~0.6 ms per
64k-row gather on v5e — which made the r03 renderer ~0.01 Mray/s, three
orders slower than the Mitsuba/OptiX wavefront core the reference leans on
(`/root/reference/rendering/brdf_measured_disk.py:151-155`). The TPU-native
replacement traverses PACKETS of rays against 8-wide nodes whose children
live in CONTIGUOUS table rows, so one fixed-size async DMA fetches a whole
child block (8 rows x 128 lanes) from HBM and the slab/triangle math runs
as dense (8, S, 128) vector ops — no gathers at all.

Built by collapsing the binary SAH tree from the native builder
(native/bvh_build.cpp): subtrees with <= max_leaf prims become fat leaves
(their prims are contiguous because the binary build reorders prims in DFS
leaf order), and the remaining inner structure is merged greedily
(largest-surface-area child expanded first) into nodes of up to 8
children. Children are sorted along the axis of largest centroid spread;
the axis rides in the parent's packed meta so the kernel can order its
stack pushes by the packet's majority ray-direction sign (near-first pop).

Unified row table (float32, 128 lanes per row):
  node row:  lanes 0:3 lo, 3:6 hi, 12 child base row, 13 flags
  tri row:   lanes 0:3 v0, 3:6 e1, 6:9 e2, 9 prim_id
  flags = ((count-1) << 3) | (axis << 1) | is_leaf; base exact as f32 up
  to 2^24 rows. For a node, rows [base, base+count) are its children's
  node rows; for a leaf they are tri rows.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from bsdf_diffusion_sampling_tpu.render.mesh import TriangleSoup

MAX_LEAF8 = 8
ROW_LANES = 128
# packed stack-entry/meta word (int32): low 25 bits = base row, then
# (count-1) << 3 | axis << 1 | leaf in bits 25..30 (sign bit untouched).
# In the TABLE the word is split over two f32 lanes — lane 12 carries the
# base (exact as f32 up to 2^24 rows), lane 13 the 6 flag bits — because
# one f32 mantissa cannot hold 25 + 6 bits.
META_BASE_BITS = 25
META_FLAGS_SHIFT = 25
# stack entries per packet in the kernel; collapse keeps depth small
# (arity-8 over ~10k fat leaves => depth ~5), each level pushes <= 8
STACK8_DEPTH = 64


class BVH8Arrays(NamedTuple):
    table: jnp.ndarray  # (n_rows, 128) float32 unified node+tri rows
    root_meta: int  # packed meta of the root child block
    n_rows: int
    tri0: int  # first tri row; prim p's row is table[tri0 + p]
    max_depth: int  # 8-wide depth (stack-need diagnostic)
    # per-prim attributes in REORDERED (perm) space, shared with the
    # binary BVH consumer path (normals/uv/material lookups happen in XLA
    # by prim id after the kernel returns)
    n0: jnp.ndarray
    n1: jnp.ndarray
    n2: jnp.ndarray
    uv0: jnp.ndarray
    uv1: jnp.ndarray
    uv2: jnp.ndarray
    material_id: jnp.ndarray
    # packed per-prim attribute rows (n_prims, 16):
    # [n0(0:3), n1(3:6), n2(6:9), uv0(9:11), uv1(11:13), uv2(13:15),
    #  material_id(15)] — ONE row gather per hit instead of seven narrow
    # gathers (TPU gathers are row-count bound; the narrow (N,3)/(N,2)
    # tables additionally pay a lane-padding relayout)
    attr_rows: jnp.ndarray | None = None
    # (2, 3) whole-scene [lo, hi] — metadata (an XLA-side bbox pre-prune
    # was tried and measured a no-op: every production ray originates ON
    # scene geometry, i.e. inside the bbox, so the slab test always hits)
    root_bbox: jnp.ndarray | None = None


def pack_flags(count: int, axis: int, leaf: bool) -> int:
    assert 0 < count <= 8 and 0 <= axis < 4
    return ((count - 1) << 3) | (axis << 1) | int(leaf)


def pack_meta(base: int, count: int, axis: int, leaf: bool) -> int:
    assert 0 <= base < (1 << META_BASE_BITS)
    return (pack_flags(count, axis, leaf) << META_FLAGS_SHIFT) | base


def build_bvh8(soup: TriangleSoup, max_leaf: int = MAX_LEAF8) -> BVH8Arrays:
    """Collapse the native binary SAH tree into the 8-wide row table."""
    from bsdf_diffusion_sampling_tpu.native.bvhlib import build_bvh_native

    v0, e1, e2 = soup.v0, soup.e1, soup.e2
    lo = np.minimum(np.minimum(v0, v0 + e1), v0 + e2)
    hi = np.maximum(np.maximum(v0, v0 + e1), v0 + e2)
    # finer binary granularity (max_leaf 2) so fat-leaf chunking can hit
    # close to `max_leaf` prims per 8-leaf
    bb_min, bb_max, left, count, perm, _ = build_bvh_native(lo, hi, 2)
    n_bin = len(count)

    # subtree prim counts + first prim (DFS preorder: left child = i+1,
    # right child = left[i]; leaf ranges contiguous in perm order)
    first = np.zeros(n_bin, np.int64)
    nprims = np.zeros(n_bin, np.int64)
    order = []  # post-order
    stack = [(0, False)]
    while stack:
        i, processed = stack.pop()
        if processed:
            order.append(i)
            continue
        stack.append((i, True))
        if count[i] == 0:
            stack.append((int(left[i]), False))
            stack.append((i + 1, False))
    for i in order:
        if count[i] > 0:
            first[i] = left[i]
            nprims[i] = count[i]
        else:
            l, r = i + 1, int(left[i])
            first[i] = first[l]
            nprims[i] = nprims[l] + nprims[r]

    area = (
        np.maximum(bb_max - bb_min, 0.0)
    )
    area = area[:, 0] * area[:, 1] + area[:, 1] * area[:, 2] + area[:, 2] * area[:, 0]

    def is_fat_leaf(i: int) -> bool:
        return nprims[i] <= max_leaf

    def collapse_children(i: int) -> list[int]:
        """Binary node i (not a fat leaf) -> up to 8 binary-node children."""
        kids = [i + 1, int(left[i])]
        while len(kids) < 8:
            # expand the largest-area non-fat-leaf child
            best, best_a = -1, -1.0
            for k, c in enumerate(kids):
                if not is_fat_leaf(c) and area[c] > best_a:
                    best, best_a = k, area[c]
            if best < 0:
                break
            c = kids.pop(best)
            kids.extend([c + 1, int(left[c])])
        return kids

    # BFS allocation so each node's children occupy consecutive rows.
    # Row ids for node rows first; tri rows appended afterwards.
    node_rows: list[tuple[int, int]] = []  # (binary node id, row id)
    rows_meta: list[float] = []  # packed meta per node row (filled later)

    # queue entries: (binary node id, row id). root is virtual: its
    # children block is the first allocation.
    n_node_rows = 0
    row_of: dict[int, int] = {}
    pending: list[int] = []  # binary ids whose child blocks need allocation

    def alloc_block(kids: list[int]) -> int:
        nonlocal n_node_rows
        base = n_node_rows
        for c in kids:
            row_of[c] = n_node_rows
            n_node_rows += 1
        return base

    # sort helper: order children along the axis of largest centroid spread
    def sort_kids(kids: list[int]) -> tuple[list[int], int]:
        cen = 0.5 * (bb_min[kids] + bb_max[kids])
        spread = cen.max(0) - cen.min(0)
        axis = int(np.argmax(spread))
        order = np.argsort(cen[:, axis], kind="stable")
        return [kids[int(j)] for j in order], axis

    depth_of: dict[int, int] = {}
    if is_fat_leaf(0) or count[0] > 0:
        root_kids, root_axis = [0], 0
    else:
        root_kids, root_axis = sort_kids(collapse_children(0))
    root_base = alloc_block(root_kids)
    max_depth = 1
    for c in root_kids:
        depth_of[c] = 1
    queue = list(root_kids)
    child_info: dict[int, tuple[list[int], int]] = {}
    while queue:
        i = queue.pop(0)
        if is_fat_leaf(i) or count[i] > 0:
            continue
        kids, axis = sort_kids(collapse_children(i))
        alloc_block(kids)
        child_info[i] = (kids, axis)
        d = depth_of[i] + 1
        max_depth = max(max_depth, d)
        for c in kids:
            depth_of[c] = d
        queue.extend(kids)

    # tri rows after node rows
    n_prims = len(perm)
    n_rows = n_node_rows + n_prims
    # pad so any 8-row DMA window stays in bounds
    n_rows_padded = ((n_rows + 7) // 8) * 8 + 8
    if n_rows_padded >= (1 << 24):
        raise ValueError(
            f"BVH8 table has {n_rows_padded} rows; the f32 base lane is "
            "exact only below 2^24"
        )
    table = np.zeros((n_rows_padded, ROW_LANES), np.float32)

    v0r = np.asarray(soup.v0)[perm]
    e1r = np.asarray(soup.e1)[perm]
    e2r = np.asarray(soup.e2)[perm]
    tri0 = n_node_rows
    table[tri0 : tri0 + n_prims, 0:3] = v0r
    table[tri0 : tri0 + n_prims, 3:6] = e1r
    table[tri0 : tri0 + n_prims, 6:9] = e2r
    table[tri0 : tri0 + n_prims, 9] = np.arange(n_prims, dtype=np.float32)

    # node rows
    for i, row in row_of.items():
        table[row, 0:3] = bb_min[i]
        table[row, 3:6] = bb_max[i]
        if is_fat_leaf(i) or count[i] > 0:
            base_v = tri0 + int(first[i])
            flags_v = pack_flags(int(nprims[i]), 0, True)
        else:
            kids, axis = child_info[i]
            base_v = row_of[kids[0]]
            flags_v = pack_flags(len(kids), axis, False)
        table[row, 12] = float(base_v)
        table[row, 13] = float(flags_v)

    # root_meta always describes an INNER block (the kernel slab-tests its
    # rows as node rows) — a single-fat-leaf scene becomes a one-child
    # block whose child row is the leaf
    root_meta = pack_meta(root_base, len(root_kids), root_axis, False)

    def reorder(x):
        return jnp.asarray(np.asarray(x)[perm])

    attr = np.zeros((n_prims, 16), np.float32)
    attr[:, 0:3] = np.asarray(soup.n0)[perm]
    attr[:, 3:6] = np.asarray(soup.n1)[perm]
    attr[:, 6:9] = np.asarray(soup.n2)[perm]
    attr[:, 9:11] = np.asarray(soup.uv0)[perm]
    attr[:, 11:13] = np.asarray(soup.uv1)[perm]
    attr[:, 13:15] = np.asarray(soup.uv2)[perm]
    attr[:, 15] = np.asarray(soup.material_id)[perm]

    return BVH8Arrays(
        table=jnp.asarray(table),
        root_meta=root_meta,
        n_rows=n_rows_padded,
        tri0=tri0,
        max_depth=max_depth,
        n0=reorder(soup.n0),
        n1=reorder(soup.n1),
        n2=reorder(soup.n2),
        uv0=reorder(soup.uv0),
        uv1=reorder(soup.uv1),
        uv2=reorder(soup.uv2),
        material_id=reorder(soup.material_id),
        attr_rows=jnp.asarray(attr),
        root_bbox=jnp.asarray(
            np.stack([lo.min(axis=0), hi.max(axis=0)]), jnp.float32
        ),
    )
