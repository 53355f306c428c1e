"""Pallas packet-traversal kernel over the 8-wide BVH (render/bvh8.py).

The TPU replacement for the OptiX/CUDA ray-traversal core the reference
gets for free from Mitsuba (`/root/reference/rendering/
brdf_measured_disk.py:151-155`). Design, from measured v5e costs:

- XLA's lockstep traversal costs ~0.6 ms per 64k-row random gather PER
  tree step (render/bvh.py) — the r03 renderer was ~0.01 Mray/s. Here a
  ray PACKET (S x 128 rays in vector lanes) walks the tree with a SHARED
  stack of scalar entries, so there are no per-ray gathers at all.
- A node's 8 children occupy contiguous table rows: one fixed-size async
  DMA (8 rows x 128 lanes, 4 KB) fetches the whole child block from HBM
  into a VMEM slot. Box slabs and Moller-Trumbore run as dense (8, 128)
  vector ops via column broadcasts — the (8,1) child-field columns
  broadcast against (1,128) ray rows without any scalar extraction.
- The per-block vector->scalar sync (which children did any ray hit) and
  the HBM DMA latency are the serial bottlenecks (~700 cycles/block
  measured when exposed), so G independent packet SLOTS round-robin
  inside one kernel invocation: while one slot's DMA and reduction are in
  flight, the other G-1 slots compute.
- Stack pushes are ordered far-to-near by the packet's majority ray
  direction sign along the child-sort axis (packed in the node meta), so
  near children pop first and t_best culls far subtrees.

The binary XLA traversal (render/bvh.intersect) stays as the CPU path and
the parity oracle; tests compare this kernel (interpret mode on CPU, and
compiled on TPU) against it.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bsdf_diffusion_sampling_tpu.render.bvh import Hit
from bsdf_diffusion_sampling_tpu.render.bvh8 import (
    BVH8Arrays,
    META_BASE_BITS,
    META_FLAGS_SHIFT,
    STACK8_DEPTH,
)

_BASE_MASK = (1 << META_BASE_BITS) - 1

_INF = 1e30
_INTERPRET = False  # flipped by tests on CPU

# default packet geometry (rays per slot = S*128, G slots round-robin).
# Chosen from benchmarks/results/traverse8_sweep_r04.json + the r5 sorted
# sweep; env-overridable for sweeps (TRAVERSE8_S / TRAVERSE8_G).
import os as _os

_DEF_S = int(_os.environ.get("TRAVERSE8_S", "32"))
_DEF_G = int(_os.environ.get("TRAVERSE8_G", "2"))


def _turn(
    g: int,
    *,
    table,
    blk,
    sem,
    stack,
    sptr,
    cur,
    signs,
    ro_ref,
    rd_ref,
    ird_ref,
    tmax_ref,
    act_ref,
    out_ref,
    S: int,
    any_hit: bool,
):
    """One slot turn: wait DMA, process the block, pop + prefetch next.
    Returns 1 if the slot is now done, else 0."""
    f32 = jnp.float32

    def dma(base):
        return pltpu.make_async_copy(
            table.at[pl.ds(base, 8), :], blk.at[g], sem.at[g]
        )

    m = cur[g]
    base = m & _BASE_MASK
    dma(base).wait()
    flags = m >> META_FLAGS_SHIFT
    cnt = ((flags >> 3) & 7) + 1
    axis = (flags >> 1) & 3
    is_leaf = (flags & 1) > 0

    b = blk[g]  # (8, 128)
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
    kmask = k_iota < cnt  # (8, 1)

    def leaf_turn():
        v0x, v0y, v0z = b[:, 0:1], b[:, 1:2], b[:, 2:3]
        e1x, e1y, e1z = b[:, 3:4], b[:, 4:5], b[:, 5:6]
        e2x, e2y, e2z = b[:, 6:7], b[:, 7:8], b[:, 8:9]
        prim = b[:, 9:10]
        for s in range(S):
            rdx = rd_ref[g, 0, s : s + 1]  # (1, 128)
            rdy = rd_ref[g, 1, s : s + 1]
            rdz = rd_ref[g, 2, s : s + 1]
            rox = ro_ref[g, 0, s : s + 1]
            roy = ro_ref[g, 1, s : s + 1]
            roz = ro_ref[g, 2, s : s + 1]
            t_best = out_ref[g, 0, s : s + 1]  # (1, 128)

            # Moller-Trumbore, (8,1) columns x (1,128) rays -> (8,128)
            px = rdy * e2z - rdz * e2y
            py = rdz * e2x - rdx * e2z
            pz = rdx * e2y - rdy * e2x
            det = e1x * px + e1y * py + e1z * pz
            inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
            sx = rox - v0x
            sy = roy - v0y
            sz = roz - v0z
            u = (sx * px + sy * py + sz * pz) * inv_det
            qx = sy * e1z - sz * e1y
            qy = sz * e1x - sx * e1z
            qz = sx * e1y - sy * e1x
            v = (rdx * qx + rdy * qy + rdz * qz) * inv_det
            t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
            valid = (
                kmask
                & (jnp.abs(det) > 1e-12)
                & (u >= 0.0)
                & (v >= 0.0)
                & (u + v <= 1.0)
                & (t > 1e-4)
                & (t < t_best)
            )
            tc = jnp.where(valid, t, _INF)
            tmin = jnp.min(tc, axis=0, keepdims=True)  # (1, 128)
            improved = tmin < t_best
            best = valid & (tc == tmin)
            prim_new = jnp.max(jnp.where(best, prim, -1.0), axis=0,
                               keepdims=True)
            u_new = jnp.max(jnp.where(best, u, -_INF), axis=0, keepdims=True)
            v_new = jnp.max(jnp.where(best, v, -_INF), axis=0, keepdims=True)
            out_ref[g, 0, s : s + 1] = jnp.where(improved, tmin, t_best)
            out_ref[g, 1, s : s + 1] = jnp.where(
                improved, prim_new, out_ref[g, 1, s : s + 1]
            )
            out_ref[g, 2, s : s + 1] = jnp.where(
                improved, u_new, out_ref[g, 2, s : s + 1]
            )
            out_ref[g, 3, s : s + 1] = jnp.where(
                improved, v_new, out_ref[g, 3, s : s + 1]
            )
        if not any_hit:
            return jnp.int32(0)
        # shadow early-drain: remaining live rays = active & no hit yet
        rem = jnp.int32(0)
        for s in range(S):
            act = act_ref[g, s : s + 1] > 0
            unhit = out_ref[g, 0, s : s + 1] >= tmax_ref[g, s : s + 1] * 0.9999
            rem = rem + jnp.sum((act & unhit).astype(jnp.int32))
        return jnp.where(rem == 0, jnp.int32(1), jnp.int32(0))

    def inner_turn():
        lox, loy, loz = b[:, 0:1], b[:, 1:2], b[:, 2:3]
        hix, hiy, hiz = b[:, 3:4], b[:, 4:5], b[:, 5:6]
        total = jnp.zeros((8, 1), jnp.int32)
        for s in range(S):
            rox = ro_ref[g, 0, s : s + 1]
            roy = ro_ref[g, 1, s : s + 1]
            roz = ro_ref[g, 2, s : s + 1]
            ix = ird_ref[g, 0, s : s + 1]
            iy = ird_ref[g, 1, s : s + 1]
            iz = ird_ref[g, 2, s : s + 1]
            t_best = out_ref[g, 0, s : s + 1]
            t0x = (lox - rox) * ix
            t1x = (hix - rox) * ix
            t0y = (loy - roy) * iy
            t1y = (hiy - roy) * iy
            t0z = (loz - roz) * iz
            t1z = (hiz - roz) * iz
            tn = jnp.maximum(
                jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                jnp.minimum(t0z, t1z),
            )
            tf = jnp.minimum(
                jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                jnp.maximum(t0z, t1z),
            )
            hit = (tn <= tf) & (tf > 1e-5) & (tn < t_best)
            total = total + jnp.sum(hit.astype(jnp.int32), axis=1,
                                    keepdims=True)
        pow2 = jnp.left_shift(jnp.int32(1), k_iota)  # (8, 1)
        bits = jnp.sum(jnp.where((total > 0) & kmask, pow2, 0))  # scalar sync
        bases = b[:, 12:13]  # (8, 1) child base rows as f32
        flagv = b[:, 13:14]  # (8, 1) child flag bits as f32

        sign_pos = signs[g, axis] > 0

        def push_order(order):
            ptr0 = sptr[g]
            ptr = ptr0
            for c in order:
                bit = jnp.right_shift(bits, c) & 1
                slot = jnp.minimum(ptr, STACK8_DEPTH - 1)

                @pl.when(bit > 0)
                def _():
                    stack[g, slot] = (
                        jnp.left_shift(flagv[c, 0].astype(jnp.int32),
                                       META_FLAGS_SHIFT)
                        | bases[c, 0].astype(jnp.int32)
                    )

                ptr = jnp.minimum(ptr + bit, STACK8_DEPTH - 1)
            sptr[g] = ptr

        # children sorted ascending along `axis`; majority-positive rays
        # reach low indices first, so push high->low (near pops first)
        @pl.when(sign_pos)
        def _():
            push_order(list(range(7, -1, -1)))

        @pl.when(jnp.logical_not(sign_pos))
        def _():
            push_order(list(range(8)))

        return jnp.int32(0)

    drained = jax.lax.cond(is_leaf, leaf_turn, inner_turn)

    # pop next entry; prefetch its block
    ptr = sptr[g]
    has_next = (ptr > 0) & (drained == 0)

    @pl.when(has_next)
    def _():
        nxt = stack[g, ptr - 1]
        sptr[g] = ptr - 1
        cur[g] = nxt
        dma(nxt & _BASE_MASK).start()

    return jnp.where(has_next, jnp.int32(0), jnp.int32(1))


def _traverse_kernel(
    root_ref,  # (1, 1) int32 SMEM
    table,  # (N, 128) f32 ANY/HBM
    ro_ref,  # (G, 3, S, 128) f32
    rd_ref,
    ird_ref,
    tmax_ref,  # (G, S, 128)
    act_ref,  # (G, S, 128) f32 0/1
    out_ref,  # (G, 4, S, 128) f32: t, prim, u, v
    trunc_ref,  # (1, 1) int32 SMEM
    blk,  # VMEM (G, 8, 128)
    sem,  # DMA sems (G,)
    stack,  # SMEM (G, STACK8_DEPTH) int32
    sptr,  # SMEM (G,) int32
    cur,  # SMEM (G,) int32
    signs,  # SMEM (G, 4) int32
    *,
    S: int,
    G: int,
    any_hit: bool,
):
    root = root_ref[0, 0]

    # ---- init every slot
    done0 = jnp.int32(0)
    for g in range(G):
        live = jnp.int32(0)
        for a in range(3):
            ssum = jnp.float32(0.0)
            for s in range(S):
                act = act_ref[g, s : s + 1] > 0
                d = jnp.where(rd_ref[g, a, s : s + 1] > 0, 1.0, -1.0)
                ssum = ssum + jnp.sum(jnp.where(act, d, 0.0))
            signs[g, a] = jnp.where(ssum >= 0, 1, 0).astype(jnp.int32)
        signs[g, 3] = 0
        for s in range(S):
            act = act_ref[g, s : s + 1] > 0
            live = live + jnp.sum(act.astype(jnp.int32))
            out_ref[g, 0, s : s + 1] = jnp.where(
                act, tmax_ref[g, s : s + 1], -_INF
            )
            zero = jnp.zeros((1, 128), jnp.float32)
            out_ref[g, 1, s : s + 1] = zero - 1.0
            out_ref[g, 2, s : s + 1] = zero
            out_ref[g, 3, s : s + 1] = zero
        sptr[g] = 0
        cur[g] = root
        slot_live = live > 0

        @pl.when(slot_live)
        def _():
            pltpu.make_async_copy(
                table.at[pl.ds(root & _BASE_MASK, 8), :],
                blk.at[g],
                sem.at[g],
            ).start()

        done0 = done0 | jnp.where(slot_live, 0, 1 << g)

    all_done = jnp.int32((1 << G) - 1)
    # safety valve only (see render/bvh.py cap note): generous bound on
    # block-visits per packet group
    max_iters = jnp.int32(G * 8192)

    def body(carry):
        it, done = carry
        for g in range(G):
            bit = jnp.right_shift(done, g) & 1
            newly = jax.lax.cond(
                bit == 0,
                lambda g=g: _turn(
                    g,
                    table=table,
                    blk=blk,
                    sem=sem,
                    stack=stack,
                    sptr=sptr,
                    cur=cur,
                    signs=signs,
                    ro_ref=ro_ref,
                    rd_ref=rd_ref,
                    ird_ref=ird_ref,
                    tmax_ref=tmax_ref,
                    act_ref=act_ref,
                    out_ref=out_ref,
                    S=S,
                    any_hit=any_hit,
                ),
                lambda: jnp.int32(1),
            )
            done = done | jnp.where(newly > 0, 1 << g, 0)
        return it + 1, done

    def cond(carry):
        it, done = carry
        return (done != all_done) & (it < max_iters)

    it_fin, done_fin = jax.lax.while_loop(cond, body, (jnp.int32(0), done0))
    # truncation flag: cap fired with slots still live. A slot whose DMA
    # is still pending must be drained or the semaphore leaks — wait them.
    trunc = jnp.where(done_fin != all_done, 1, 0).astype(jnp.int32)
    for g in range(G):
        @pl.when((jnp.right_shift(done_fin, g) & 1) == 0)
        def _():
            pltpu.make_async_copy(
                table.at[pl.ds(cur[g] & _BASE_MASK, 8), :],
                blk.at[g],
                sem.at[g],
            ).wait()

    @pl.when(pl.program_id(0) == 0)
    def _():
        trunc_ref[0, 0] = 0

    @pl.when(trunc > 0)
    def _():
        trunc_ref[0, 0] = 1


@functools.partial(
    jax.jit, static_argnames=("S", "G", "any_hit", "n_steps")
)
def _traverse_call(root_arr, table, ro_p, rd_p, ird_p, tmax_p, act_p, *,
                   S, G, any_hit, n_steps):
    kernel = functools.partial(_traverse_kernel, S=S, G=G, any_hit=any_hit)
    grid = (n_steps,)
    vec_spec = lambda d1: pl.BlockSpec(  # noqa: E731
        (G, d1, S, 128), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
    )
    flat_spec = pl.BlockSpec(
        (G, S, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    out, trunc = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((n_steps * G, 4, S, 128), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            vec_spec(3),
            vec_spec(3),
            vec_spec(3),
            flat_spec,
            flat_spec,
        ],
        out_specs=(
            pl.BlockSpec((G, 4, S, 128), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((G, 8, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((G,)),
            pltpu.SMEM((G, STACK8_DEPTH), jnp.int32),
            pltpu.SMEM((G,), jnp.int32),
            pltpu.SMEM((G,), jnp.int32),
            pltpu.SMEM((G, 4), jnp.int32),
        ],
        interpret=_INTERPRET,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(root_arr, table, ro_p, rd_p, ird_p, tmax_p, act_p)
    return out, trunc


def intersect8(
    bvh8: BVH8Arrays,
    ro: jnp.ndarray,
    rd: jnp.ndarray,
    t_max: float | jnp.ndarray = _INF,
    active: jnp.ndarray | None = None,
    any_hit: bool = False,
    S: int | None = None,
    G: int | None = None,
) -> Hit:
    """Packet-kernel counterpart of render/bvh.intersect (same Hit
    contract: t == 1e30 miss, prim in reordered space)."""
    S = _DEF_S if S is None else S
    G = _DEF_G if G is None else G
    r = ro.shape[0]
    lane = S * 128
    n_pack = -(-r // lane)
    n_steps = -(-n_pack // G)
    n_pad = n_steps * G * lane

    t_max_arr = (
        jnp.full((r,), t_max, jnp.float32)
        if jnp.ndim(t_max) == 0
        else t_max.astype(jnp.float32)
    )
    act = jnp.ones((r,), bool) if active is None else active

    def pad(x, fill):
        return jnp.concatenate(
            [x, jnp.full((n_pad - r,) + x.shape[1:], fill, x.dtype)]
        ) if n_pad > r else x

    rd_safe = jnp.where(jnp.abs(rd) < 1e-12,
                        jnp.where(rd >= 0, 1e-12, -1e-12), rd)
    ird = 1.0 / rd_safe

    def to_p(x3):  # (n_pad, 3) -> (n_pack_padded, 3, S, 128)
        return jnp.transpose(
            x3.reshape(n_steps * G, S, 128, 3), (0, 3, 1, 2)
        )

    ro_p = to_p(pad(ro.astype(jnp.float32), 0.0))
    rd_p = to_p(pad(rd_safe.astype(jnp.float32), 1.0))
    ird_p = to_p(pad(ird.astype(jnp.float32), 1.0))
    tmax_p = pad(t_max_arr, 0.0).reshape(n_steps * G, S, 128)
    act_p = pad(act.astype(jnp.float32), 0.0).reshape(n_steps * G, S, 128)

    root_arr = jnp.full((1, 1), bvh8.root_meta, jnp.int32)
    out, trunc = _traverse_call(
        root_arr, bvh8.table, ro_p, rd_p, ird_p, tmax_p, act_p,
        S=S, G=G, any_hit=any_hit, n_steps=n_steps,
    )
    flat = out.reshape(n_steps * G, 4, lane)
    t = flat[:, 0].reshape(-1)[:r]
    prim = flat[:, 1].reshape(-1)[:r]
    u = flat[:, 2].reshape(-1)[:r]
    v = flat[:, 3].reshape(-1)[:r]
    # match render/bvh.intersect semantics: active rays that miss keep
    # t == t_max (init value; == 1e30 for the closest-hit default),
    # inactive rays return t_max untouched (the kernel carries -inf for
    # them), prim clamps to a safe gather index, u/v zero when missed
    miss = prim < 0
    t = jnp.where(act, t, t_max_arr)
    return Hit(
        t=t,
        prim=jnp.maximum(prim, 0.0).astype(jnp.int32),
        u=jnp.where(miss, 0.0, u),
        v=jnp.where(miss, 0.0, v),
        truncated=trunc[0, 0] > 0,
    )


def occluded8(bvh8: BVH8Arrays, ro, rd, t_max, active=None,
              S: int | None = None, G: int | None = None) -> jnp.ndarray:
    """Boolean shadow query via the any-hit kernel variant."""
    hit = intersect8(bvh8, ro, rd, t_max, active=active, any_hit=True, S=S,
                     G=G)
    return hit.t < t_max * 0.9999
