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
    lo = np.minimum(np.minimum(v0, v0 + e1), v0 + e2)
    hi = np.maximum(np.maximum(v0, v0 + e1), v0 + e2)
    bb_min_a, bb_max_a, left_a, count_a, perm = build_bvh_native(lo, hi, MAX_LEAF)

    def reorder(x):
        return jnp.asarray(np.asarray(x)[perm])

    return BVHArrays(
        bb_min=jnp.asarray(bb_min_a),
        bb_max=jnp.asarray(bb_max_a),
        left=jnp.asarray(left_a),
        count=jnp.asarray(count_a),
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


def _slab_test(bb_min, bb_max, ro, inv_rd, t_best):
    """Returns (hit, t_near) — t_near orders near-child-first traversal."""
    t0 = (bb_min - ro) * inv_rd
    t1 = (bb_max - ro) * inv_rd
    t_near = jnp.max(jnp.minimum(t0, t1), axis=-1)
    t_far = jnp.min(jnp.maximum(t0, t1), axis=-1)
    return (t_near <= t_far) & (t_far > 1e-5) & (t_near < t_best), t_near


def _tri_test(bvh: BVHArrays, prim, ro, rd, t_best):
    """Möller-Trumbore for one gathered primitive per ray."""
    v0 = bvh.v0[prim]
    e1 = bvh.e1[prim]
    e2 = bvh.e2[prim]
    p = jnp.cross(rd, e2)
    det = jnp.sum(e1 * p, axis=-1)
    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
    s = ro - v0
    u = jnp.sum(s * p, axis=-1) * inv_det
    q = jnp.cross(s, e1)
    v = jnp.sum(rd * q, axis=-1) * inv_det
    t = jnp.sum(e2 * q, axis=-1) * inv_det
    ok = (
        (jnp.abs(det) > 1e-12)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > 1e-4)
        & (t < t_best)
    )
    return ok, t, u, v


def intersect(
    bvh: BVHArrays,
    ro: jnp.ndarray,
    rd: jnp.ndarray,
    t_max: float | jnp.ndarray = _INF,
    active: jnp.ndarray | None = None,
    any_hit: bool = False,
) -> Hit:
    """Closest-hit traversal for a wavefront of rays (R, 3).

    Ordered traversal: a popped inner node slab-tests BOTH children and
    pushes only the hit ones, far child first, with each child's entry
    distance stored in a parallel f32 stack so stale entries (t_near >=
    current t_best) are culled on pop without re-testing. `active=False`
    rays start with an empty stack and idle through the lockstep loop at
    zero marginal cost — the loop runs until every LIVE ray's stack is
    empty, so masking dead rays shortens the whole wavefront's traversal
    (the reference gets this for free from Dr.Jit wavefront compaction).
    `any_hit=True` terminates a ray on its first accepted triangle hit
    (shadow rays).
    """
    r = ro.shape[0]
    inv_rd = 1.0 / jnp.where(jnp.abs(rd) < 1e-12, jnp.where(rd >= 0, 1e-12, -1e-12), rd)
    # column STACK_DEPTH is write-scratch: pushes of non-hit children land
    # there, so every push is ONE per-row scatter instead of an O(r x
    # STACK_DEPTH) masked rewrite of the whole stack (the masked-where
    # version moved ~100 MB per traversal iteration at 65k rays)
    stack = jnp.zeros((r, STACK_DEPTH + 1), jnp.int32)
    tstack = jnp.full((r, STACK_DEPTH + 1), -_INF, jnp.float32)
    t_max_arr = jnp.full((r,), t_max, jnp.float32) if jnp.ndim(t_max) == 0 else t_max
    ptr = (
        jnp.ones((r,), jnp.int32)
        if active is None
        else jnp.where(active, 1, 0).astype(jnp.int32)
    )

    init = (
        stack,
        tstack,
        ptr,
        t_max_arr,
        jnp.zeros((r,), jnp.int32),
        jnp.zeros((r,), jnp.float32),
        jnp.zeros((r,), jnp.float32),
    )

    rows = jnp.arange(r)

    def cond(state):
        _, _, ptr, *_ = state
        return jnp.any(ptr > 0)

    def body(state):
        stack, tstack, ptr, t_best, prim_best, u_best, v_best = state
        live = ptr > 0
        top = jnp.maximum(ptr - 1, 0)
        node = stack[rows, top]
        t_entry = tstack[rows, top]
        node = jnp.where(live, node, 0)
        ptr = jnp.where(live, ptr - 1, ptr)
        # cull stale entries: t_best may have shrunk since the push
        visit = live & (t_entry < t_best)

        cnt = bvh.count[node]
        is_leaf = visit & (cnt > 0)
        is_inner = visit & (cnt == 0)

        # leaf: test up to MAX_LEAF prims
        first = bvh.left[node]
        for i in range(MAX_LEAF):
            prim = jnp.clip(first + i, 0, bvh.v0.shape[0] - 1)
            ok, t, u, v = _tri_test(bvh, prim, ro, rd, t_best)
            ok &= is_leaf & (i < cnt)
            t_best = jnp.where(ok, t, t_best)
            prim_best = jnp.where(ok, prim, prim_best)
            u_best = jnp.where(ok, u, u_best)
            v_best = jnp.where(ok, v, v_best)
        if any_hit:
            # shadow query: first accepted hit ends the ray
            ptr = jnp.where(t_best < t_max_arr, 0, ptr)

        # inner: slab-test both children, push hit ones far-first
        l_child = node + 1
        r_child = bvh.left[node]
        hit_l, tn_l = _slab_test(bvh.bb_min[l_child], bvh.bb_max[l_child],
                                 ro, inv_rd, t_best)
        hit_r, tn_r = _slab_test(bvh.bb_min[r_child], bvh.bb_max[r_child],
                                 ro, inv_rd, t_best)
        hit_l &= is_inner
        hit_r &= is_inner
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
            stack = stack.at[rows, slot].set(c)
            tstack = tstack.at[rows, slot].set(tn)
            ptr = jnp.where(h, jnp.minimum(ptr + 1, STACK_DEPTH), ptr)

        return stack, tstack, ptr, t_best, prim_best, u_best, v_best

    _, _, _, t, prim, u, v = jax.lax.while_loop(cond, body, init)
    return Hit(t, prim, u, v)


def occluded(bvh: BVHArrays, ro: jnp.ndarray, rd: jnp.ndarray,
             t_max: jnp.ndarray,
             active: jnp.ndarray | None = None) -> jnp.ndarray:
    """Boolean shadow query: any hit closer than t_max (early-exit)."""
    hit = intersect(bvh, ro, rd, t_max, active=active, any_hit=True)
    return hit.t < t_max * 0.9999
