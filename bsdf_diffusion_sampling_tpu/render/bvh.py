"""BVH: host-side build (numpy) + vectorized device traversal (JAX).

The reference delegates ray tracing to Mitsuba's C++/CUDA (OptiX) kernels;
here the accelerator is TPU-native: the tree is built once on the host and
flattened into arrays, and traversal runs as one lockstep `lax.while_loop`
over the whole ray wavefront — each iteration every live ray pops one node
from its private stack, slab-tests it, and either pushes children or
Möller-Trumbore-tests a small leaf. No divergence handling beyond masking:
rays that empty their stack idle until the wavefront finishes (the
fixed-size-wavefront-with-masks design SURVEY.md §7 calls for; queue
compaction is XLA-hostile).

Build: binned-midpoint top-down split on the longest centroid axis,
max-leaf 4, primitives reordered so leaves span contiguous ranges.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from bsdf_diffusion_sampling_tpu.render.mesh import TriangleSoup

MAX_LEAF = 4
STACK_DEPTH = 48
_INF = np.float32(1e30)


class BVHArrays(NamedTuple):
    bb_min: jnp.ndarray  # (N, 3)
    bb_max: jnp.ndarray  # (N, 3)
    left: jnp.ndarray  # (N,) inner: left-child index; leaf: first prim
    count: jnp.ndarray  # (N,) 0 = inner, >0 = leaf prim count
    # gather-packed traversal table: TPU gathers cost ~0.6 ms per 64k
    # random rows per lockstep iteration REGARDLESS of row width (measured
    # v5e), so EVERYTHING a node visit needs lives in ONE row:
    # cols 0:12  = both children's boxes (lo_l hi_l lo_r hi_r),
    # col  12/13/14 = right-child index / leaf prim count / first prim,
    # cols 16:64 = the leaf's 4 triangles as [v0 e1 e2] (degenerate-edge
    #              padded => guaranteed miss), cols 64:68 = global prim ids.
    packed: jnp.ndarray  # (N, 68) float32
    # reordered triangle data
    v0: jnp.ndarray
    e1: jnp.ndarray
    e2: jnp.ndarray
    n0: jnp.ndarray
    n1: jnp.ndarray
    n2: jnp.ndarray
    uv0: jnp.ndarray
    uv1: jnp.ndarray
    uv2: jnp.ndarray
    material_id: jnp.ndarray


def build_bvh(soup: TriangleSoup) -> BVHArrays:
    """Build via the native C++ median-split builder (native/bvh_build.cpp)
    — the pure-Python recursive equivalent took minutes on the 61k-triangle
    matpreview scene; the native one takes milliseconds."""
    from bsdf_diffusion_sampling_tpu.native.bvhlib import build_bvh_native

    v0, e1, e2 = soup.v0, soup.e1, soup.e2
    # the packed traversal table stores child/prim indices as float32 —
    # exact only up to 2^24 (the native builder's depth bound also assumes
    # this cap; see bvh_build.cpp kSahDepthLimit)
    if len(v0) >= (1 << 24):
        raise ValueError(
            f"scene has {len(v0)} primitives; the float32-packed traversal "
            "table supports < 2^24"
        )
    lo = np.minimum(np.minimum(v0, v0 + e1), v0 + e2)
    hi = np.maximum(np.maximum(v0, v0 + e1), v0 + e2)
    bb_min_a, bb_max_a, left_a, count_a, perm, max_depth = build_bvh_native(
        lo, hi, MAX_LEAF
    )
    # ordered DFS pushes two children per pop: stack need == depth + 1
    if max_depth + 1 > STACK_DEPTH:
        raise ValueError(
            f"BVH depth {max_depth} exceeds traversal STACK_DEPTH {STACK_DEPTH}"
        )

    def reorder(x):
        return jnp.asarray(np.asarray(x)[perm])

    n_nodes = len(count_a)
    if n_nodes >= (1 << 24):
        raise ValueError(
            f"BVH has {n_nodes} nodes; float32-packed child indices "
            "support < 2^24"
        )
    v0r = np.asarray(soup.v0)[perm]
    e1r = np.asarray(soup.e1)[perm]
    e2r = np.asarray(soup.e2)[perm]
    n_prims = len(v0r)

    packed = np.zeros((n_nodes, 68), np.float32)
    inner = count_a == 0
    l_child = np.where(inner, np.arange(n_nodes) + 1, 0)
    r_child = np.where(inner, left_a, 0)
    packed[:, 0:3] = bb_min_a[l_child]
    packed[:, 3:6] = bb_max_a[l_child]
    packed[:, 6:9] = bb_min_a[r_child]
    packed[:, 9:12] = bb_max_a[r_child]
    packed[:, 12] = r_child
    packed[:, 13] = count_a
    packed[:, 14] = left_a  # leaf: first reordered prim

    leaf_idx = np.nonzero(~inner)[0]
    for k in range(MAX_LEAF):
        prim = np.minimum(left_a[leaf_idx] + k, n_prims - 1)
        valid = k < count_a[leaf_idx]
        base = 16 + 12 * k
        packed[leaf_idx, base:base + 3] = v0r[prim]
        # degenerate edges => Moller-Trumbore det == 0 => guaranteed miss
        packed[leaf_idx, base + 3:base + 6] = np.where(
            valid[:, None], e1r[prim], 0.0)
        packed[leaf_idx, base + 6:base + 9] = np.where(
            valid[:, None], e2r[prim], 0.0)
        packed[leaf_idx, 64 + k] = prim

    return BVHArrays(
        bb_min=jnp.asarray(bb_min_a),
        bb_max=jnp.asarray(bb_max_a),
        left=jnp.asarray(left_a),
        count=jnp.asarray(count_a),
        packed=jnp.asarray(packed),
        v0=reorder(soup.v0),
        e1=reorder(soup.e1),
        e2=reorder(soup.e2),
        n0=reorder(soup.n0),
        n1=reorder(soup.n1),
        n2=reorder(soup.n2),
        uv0=reorder(soup.uv0),
        uv1=reorder(soup.uv1),
        uv2=reorder(soup.uv2),
        material_id=reorder(soup.material_id),
    )


class Hit(NamedTuple):
    t: jnp.ndarray  # (R,) hit distance (1e30 = miss)
    prim: jnp.ndarray  # (R,) primitive index (reordered space)
    u: jnp.ndarray  # (R,) barycentric
    v: jnp.ndarray
    # scalar bool (Python or traced): True iff the traversal hit its
    # iteration cap with rays still live — results for those rays are
    # partial (possible false miss). Surfaced so a silently biased render
    # is detectable (ADVICE r3); render_bench asserts it stays False on
    # the shipped scenes. Default is a PYTHON bool — a jnp default here
    # would initialize the JAX backend at import time, breaking the
    # init_distributed()-before-any-JAX-API contract (see render/scene.py).
    truncated: object = False


def _slab_rows(lo, hi, ro, inv_rd, t_best):
    """Slab test against per-ray boxes given as (R, 3) slices of the packed
    node row. Returns (hit, t_near)."""
    t0 = (lo - ro) * inv_rd
    t1 = (hi - ro) * inv_rd
    t_near = jnp.max(jnp.minimum(t0, t1), axis=-1)
    t_far = jnp.min(jnp.maximum(t0, t1), axis=-1)
    return (t_near <= t_far) & (t_far > 1e-5) & (t_near < t_best), t_near


def intersect(
    bvh: BVHArrays,
    ro: jnp.ndarray,
    rd: jnp.ndarray,
    t_max: float | jnp.ndarray = _INF,
    active: jnp.ndarray | None = None,
    any_hit: bool = False,
) -> Hit:
    """Closest-hit traversal for a wavefront of rays (R, 3).

    Per lockstep iteration each live ray pops one (node, entry-t) pair,
    culls it against the shrunken t_best, and does ONE gather of the
    68-wide packed row holding both children's boxes AND the leaf's 4
    triangles — TPU gathers are ~row-count bound, not byte bound, so the
    whole visit costs 2 gathers (stack pop + row) and 2 scatters (ordered
    child pushes) regardless of how much geometry it touches. `active`
    masks rays out of the loop entirely (idle rays cost nothing once
    their stack drains); `any_hit` terminates a ray on its first accepted
    hit (shadow rays).
    """
    r = ro.shape[0]
    inv_rd = 1.0 / jnp.where(jnp.abs(rd) < 1e-12, jnp.where(rd >= 0, 1e-12, -1e-12), rd)
    # Two flat per-ray stacks: node indices (int32) and entry-t (f32).
    # Column STACK_DEPTH is write-scratch so every push is one scatter.
    # (An earlier revision fused both into one (R, D+1, 2) f32 carry with
    # int32 bitcasts; that shape SILENTLY miscomputes inside while_loop
    # on the TPU backend — every construct passes in isolation, but the
    # composite carry returns all-miss traversals and, uncapped, a
    # runaway loop that kills the worker. Two 2D carries with plain
    # row-index scatters lower correctly.)
    node_stk = jnp.zeros((r, STACK_DEPTH + 1), jnp.int32)
    t_stk = jnp.full((r, STACK_DEPTH + 1), -_INF, jnp.float32)
    t_max_arr = jnp.full((r,), t_max, jnp.float32) if jnp.ndim(t_max) == 0 else t_max
    ptr = (
        jnp.ones((r,), jnp.int32)
        if active is None
        else jnp.where(active, 1, 0).astype(jnp.int32)
    )

    init = (
        jnp.int32(0),
        node_stk,
        t_stk,
        ptr,
        t_max_arr,
        jnp.zeros((r,), jnp.int32),
        jnp.zeros((r,), jnp.float32),
        jnp.zeros((r,), jnp.float32),
    )

    rows = jnp.arange(r)
    # Iteration cap. This is a SAFETY VALVE, not a bound: lockstep
    # iterations track the worst ray's total node visits, which is
    # scene-dependent and not bounded by the stack discipline (each pop
    # can push two more entries; entry-t culling prunes most but
    # guarantees nothing). On the shipped matpreview scenes the worst ray
    # finishes in a few hundred iterations, far under the cap; if the cap
    # DOES trigger, the still-live rays return partial results (possible
    # false miss), which the `truncated` output flag surfaces instead of
    # silently biasing the render. The cap exists because the tunneled
    # dev-TPU worker hard-kills on runaway programs, taking the whole
    # backend down for ~30 min.
    max_iters = 64 * STACK_DEPTH

    def cond(state):
        it, _, _, ptr, *_ = state
        return jnp.any(ptr > 0) & (it < max_iters)

    def body(state):
        it, node_stk, t_stk, ptr, t_best, prim_best, u_best, v_best = state
        live = ptr > 0
        top = jnp.maximum(ptr - 1, 0)
        node = jnp.where(live, node_stk[rows, top], 0)
        t_entry = t_stk[rows, top]
        ptr = jnp.where(live, ptr - 1, ptr)
        # cull stale entries: t_best may have shrunk since the push
        visit = live & (t_entry < t_best)

        row = bvh.packed[node]  # (R, 68) gather — boxes + leaf triangles
        cnt = row[:, 13].astype(jnp.int32)
        is_leaf = visit & (cnt > 0)
        is_inner = visit & (cnt == 0)

        # leaf: Moller-Trumbore on the 4 packed triangles (padding rows
        # have zero edges => det == 0 => miss)
        for k in range(MAX_LEAF):
            b = 16 + 12 * k
            v0 = row[:, b : b + 3]
            e1 = row[:, b + 3 : b + 6]
            e2 = row[:, b + 6 : b + 9]
            pvec = jnp.cross(rd, e2)
            det = jnp.sum(e1 * pvec, axis=-1)
            inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
            s = ro - v0
            u = jnp.sum(s * pvec, axis=-1) * inv_det
            qvec = jnp.cross(s, e1)
            v = jnp.sum(rd * qvec, axis=-1) * inv_det
            t = jnp.sum(e2 * qvec, axis=-1) * inv_det
            ok = (
                is_leaf
                & (jnp.abs(det) > 1e-12)
                & (u >= 0.0)
                & (v >= 0.0)
                & (u + v <= 1.0)
                & (t > 1e-4)
                & (t < t_best)
            )
            t_best = jnp.where(ok, t, t_best)
            prim_best = jnp.where(ok, row[:, 64 + k].astype(jnp.int32), prim_best)
            u_best = jnp.where(ok, u, u_best)
            v_best = jnp.where(ok, v, v_best)
        if any_hit:
            # shadow query: first accepted hit ends the ray — drop the
            # remaining stack AND suppress this iteration's child pushes
            # (a terminated ray that popped an inner node must not re-arm
            # itself by pushing that node's children)
            terminated = t_best < t_max_arr
            ptr = jnp.where(terminated, 0, ptr)
            is_inner &= ~terminated

        # inner: slab-test both children from the row, push hit ones
        # far-first so the near child pops first
        hit_l, tn_l = _slab_rows(row[:, 0:3], row[:, 3:6], ro, inv_rd, t_best)
        hit_r, tn_r = _slab_rows(row[:, 6:9], row[:, 9:12], ro, inv_rd, t_best)
        hit_l &= is_inner
        hit_r &= is_inner
        l_child = node + 1
        r_child = row[:, 12].astype(jnp.int32)
        l_near = tn_l <= tn_r
        c_far = jnp.where(l_near, r_child, l_child)
        t_far = jnp.where(l_near, tn_r, tn_l)
        h_far = jnp.where(l_near, hit_r, hit_l)
        c_near = jnp.where(l_near, l_child, r_child)
        t_near_ = jnp.where(l_near, tn_l, tn_r)
        h_near = jnp.where(l_near, hit_l, hit_r)

        for c, tn, h in ((c_far, t_far, h_far), (c_near, t_near_, h_near)):
            put = h & (ptr < STACK_DEPTH)
            slot = jnp.where(put, ptr, STACK_DEPTH)  # scratch col if no push
            node_stk = node_stk.at[rows, slot].set(c)
            t_stk = t_stk.at[rows, slot].set(tn)
            ptr = jnp.where(h, jnp.minimum(ptr + 1, STACK_DEPTH), ptr)

        return it + 1, node_stk, t_stk, ptr, t_best, prim_best, u_best, v_best

    it_fin, _, _, ptr_fin, t, prim, u, v = jax.lax.while_loop(cond, body, init)
    truncated = (it_fin >= max_iters) & jnp.any(ptr_fin > 0)
    return Hit(t, prim, u, v, truncated)


def occluded(bvh: BVHArrays, ro: jnp.ndarray, rd: jnp.ndarray,
             t_max: jnp.ndarray,
             active: jnp.ndarray | None = None) -> jnp.ndarray:
    """Boolean shadow query: any hit closer than t_max (early-exit)."""
    hit = intersect(bvh, ro, rd, t_max, active=active, any_hit=True)
    return hit.t < t_max * 0.9999
