"""Pallas fused few-step ODE sampler — the tiny-cuda-nn equivalent.

The reference's hot path runs a T-step Euler loop where every step is a
full fused-MLP CUDA megakernel launch plus two autograd VJPs
(`/root/reference/rendering/utils/mlp_brdf_sampling.py:27-48`;
`/root/reference/tiny-cuda-nn/src/fully_fused_mlp.cu:499-560`). The TPU
re-design fuses MORE than tcnn does: the ENTIRE T-step loop, all MLP
layers, and the per-step 2x2 Jacobian (forward-mode tangents, not VJPs)
execute in one Pallas kernel per batch tile — weights and activations
stay resident in VMEM; HBM traffic is one read of (x0, cond) and one
write of (x_T, det) per sample, independent of T.

Lane packing: the velocity nets are only 32/64 wide, so a naive matmul
uses 32/128 of the MXU's lanes. We pack `128 // block` independent samples
into each 128-lane row and expand the weights block-diagonally
(jnp.kron(I_pack, W)) — the same trick as tcnn choosing WIDTH-specialized
kernels (`fully_fused_mlp.cu:115-118`), but expressed as a layout instead
of template code. The MXU then runs dense 128x128 passes with 4x (width
32) or 2x (width 64) the useful throughput.

Jacobian: the change-of-variables det. Two tangent streams ride the same
weights as the primal as a batched (2, TILE, 128) dot_general next to the
primal's (TILE, 128) @ (128, 128); hidden-layer tangents multiply by
silu'(z_primal) via a leading-axis broadcast. (An earlier revision
concatenated [primal; t0; t1] on the sublane axis; the per-layer
concatenation copies made the kernel VPU-bound — same MXU FLOPs, ~25%
slower end-to-end.) The streams are CARRIED across ODE steps — tang[k] =
d(state_t)/d(x0_k) by the chain rule — so ONE 2x2 det at the end of the
transport replaces a per-step det (det is multiplicative over the step
maps; round 2 paid two pltpu.rolls + ~8 VPU ops per step for the same
number). For the spherical domain the state->input encoding
(theta, phi) -> (theta, sin phi, cos phi) (`mlp_brdf_sampling.py:119-120`)
is differentiated in-kernel each step: the carried state tangent maps to
input tangents via (u_theta, cos(phi) u_phi, -sin(phi) u_phi).

Numerics: activations, state, and det products are fp32 throughout (the
det product is the sample's importance weight — drift there shows up as
image bias, SURVEY.md §7 hard part b).
`mxu_dtype` selects the MXU pass count (see _mxu_precision): the default
"bfloat16" runs single-pass bf16 matmuls with fp32 accumulation —
activations, state, and det products all stay fp32, and the measured pdf
error vs true fp32 is ~2e-5 median / 4e-5 p99 (v5e, T=4, trained-scale
weights), far below Monte Carlo render noise. "float32" forces
Precision.HIGHEST (multi-pass, genuinely fp32-accurate) for exactness
validation at a fraction of the throughput — the bf16-vs-fp32 A/B rows
are recorded in benchmarks/results/ (sweep.py emits an mxu_dtype=float32
row; round-2's ad-hoc measurement saw ~2.1x in bf16's favor). Note
DEFAULT-precision fp32 dots on TPU are single-pass bf16 ANYWAY —
"float32" here means genuinely fp32-accurate, not "what plain jnp.dot
does".
"""

from __future__ import annotations

import functools
import math
from typing import List, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
_INTERPRET = False  # flipped by tests on CPU


def _block_size(v_params: List[dict]) -> int:
    """Feature-block width: smallest of {32, 64, 128} holding every layer."""
    widest = max(max(l["w"].shape) for l in v_params)
    for b in (32, 64, 128):
        if widest <= b:
            return b
    raise ValueError(f"net too wide for lane packing: {widest}")


def pack_weights(v_params: List[dict], block: int) -> jnp.ndarray:
    """(L, 128, 128) block-diagonal expanded weights, zero-padded."""
    pack = LANES // block
    eye = jnp.eye(pack, dtype=jnp.float32)
    mats = []
    for layer in v_params:
        w = layer["w"].astype(jnp.float32)
        d_in, d_out = w.shape
        wp = jnp.zeros((block, block), jnp.float32).at[:d_in, :d_out].set(w)
        mats.append(jnp.kron(eye, wp))
    return jnp.stack(mats)


def _sigmoid(z):
    """The native `logistic` lowering is the fastest fp32 sigmoid on TPU
    (an explicit 1/(1+exp(-z)) formulation measured ~15% slower for the
    whole kernel; logistic is also broken for bf16 operands in Mosaic —
    vector.broadcast element-type mismatch — but the kernel is all-fp32,
    see _hoist_weights)."""
    return jax.nn.sigmoid(z)


def _silu_and_grad(z):
    one = jnp.asarray(1.0, z.dtype)
    s = _sigmoid(z)
    return z * s, s * (one + z * (one - s))


def _mxu_precision(mxu) -> jax.lax.Precision:
    """On TPU a DEFAULT-precision fp32 dot runs ONE bf16 MXU pass — i.e.
    operands are silently bf16-rounded. "float32" therefore maps to
    Precision.HIGHEST (the 3/6-pass bf16 decomposition that recovers fp32
    accuracy) and "bfloat16" to the fast single-pass DEFAULT."""
    return (
        jax.lax.Precision.HIGHEST
        if jnp.dtype(mxu) == jnp.float32
        else jax.lax.Precision.DEFAULT
    )


def _hoist_weights(w_ref, n_layers: int, mxu):
    """Read layer weights out of the VMEM ref ONCE, pre-cast to the MXU
    input dtype. In the fast bf16 mode this removes the per-step fp32->bf16
    operand converts Mosaic would otherwise insert in front of every matmul
    of the unrolled T-loop (the kernel is VPU-bound; converts are VPU
    work).

    MEASURED (v5e, n=2^20, T=4, tile=1024): pre-casting weights to bf16
    and running the hidden elementwise chain on bf16 vregs made the kernel
    31% SLOWER (6.75 vs 5.12 ms) — v5e VPU elementwise bf16 is emulated
    via converts, and DEFAULT-precision matmuls take fp32 operands with
    free internal rounding. So this stays fp32; hoisting still saves the
    per-step ref reads."""
    del mxu
    return [w_ref[l] for l in range(n_layers)]


def _mlp_with_tangents(inp, tang, ws, mxu=jnp.float32):
    """Primal (tile, 128) + two forward-mode tangent streams (2, tile, 128)
    through the packed MLP (ws = hoisted per-layer weights). The tangents
    ride a batched dot against the same weights; the hidden-layer silu'
    multiply broadcasts over the leading axis (no sublane concatenation/
    copies — the VPU work per step is real math only).

    Everything elementwise stays fp32 — see _hoist_weights for the
    measured evidence that a bf16 elementwise chain is slower on v5e.
    Dot outputs accumulate in fp32. Returns (v, tang_out) with tang_out
    (2, tile, 128) = (J @ seed0, J @ seed1)."""
    prec = _mxu_precision(mxu)
    dn = (((2,), (0,)), ((), ()))  # contract feature dim, no batch dims
    n_layers = len(ws)
    for l, w in enumerate(ws):
        z = jnp.dot(inp, w, preferred_element_type=jnp.float32, precision=prec)
        tz = jax.lax.dot_general(tang, w, dn, preferred_element_type=jnp.float32,
                                 precision=prec)
        if l + 1 < n_layers:
            a, sp = _silu_and_grad(z)
            inp, tang = a, tz * sp[None]
        else:
            inp, tang = z, tz
    return inp, tang


def _det2_from_tangents(tang):
    """det of the 2x2 sensitivity matrix carried in two tangent streams:
    tang[k] holds column k = d(state)/d(x0_k), state components on
    blockcols 0 (theta/x) and 1 (phi/y). Correct at col0 of each block,
    garbage elsewhere (callers mask is0) — ONE roll pair for the whole
    transport instead of two rolls per step."""
    a, b = tang[0], tang[1]
    p = a * pltpu.roll(b, shift=LANES - 1, axis=1)  # lane0: M00*M11
    q = b * pltpu.roll(a, shift=LANES - 1, axis=1)  # lane0: M01*M10
    return p - q


def _mlp_primal(x, ws, mxu=jnp.float32):
    prec = _mxu_precision(mxu)
    n_layers = len(ws)
    for l, w in enumerate(ws):
        z = jnp.dot(x, w, preferred_element_type=jnp.float32, precision=prec)
        x = z * _sigmoid(z) if l + 1 < n_layers else z
    return x


def _fused_ode_kernel(
    s_ref,  # (TILE, 128) packed state: blockcol 0:2 = x, rest zero
    c_ref,  # (TILE, 128) packed condition: blockcol 3:3+cond_dim = cond_enc
    w_ref,  # (L, 128, 128)
    out_ref,  # (TILE, 128): blockcol 0:2 = x_T, blockcol 2 = det product
    *,
    domain: str,
    T: int,
    n_layers: int,
    block: int,
    reverse: bool,
    with_jac: bool,
    mxu_dtype: str = "bfloat16",
    compact: bool = False,
    interleave: int = 1,
):
    mxu = jnp.dtype(mxu_dtype)
    tile = s_ref.shape[0]
    h = 1.0 / T
    sign = -1.0 if reverse else 1.0
    col = jax.lax.broadcasted_iota(jnp.int32, (tile, LANES), 1) % block
    is0, is1, is2 = (col == 0), (col == 1), (col == 2)
    f32 = jnp.float32

    cond = c_ref[:]
    s0 = s_ref[:]

    def encode(s, alpha):
        """State -> network input rows (x_enc, alpha, cond). Also returns
        the (cos phi, -sin phi) lanes for the spherical tangent transform
        (None for disk) so sin/cos are computed once per step."""
        if domain == "disk":
            x_part = jnp.where(col < 2, s, 0.0)
            alpha_col = jnp.where(is2, alpha, 0.0)
            return x_part + alpha_col + cond, None
        theta = jnp.where(is0, s, 0.0)
        # phi lives in blockcol 1; place sin(phi) at input col 1 and
        # cos(phi) at input col 2 by computing on the phi column and
        # shifting the cos lane right by one.
        sin_p = jnp.where(is1, jnp.sin(s), 0.0)
        cos_p = jnp.where(is1, jnp.cos(s), 0.0)
        # shift cos from blockcol1 to blockcol2 (one lane right)
        x_part = theta + sin_p + pltpu.roll(cos_p, shift=1, axis=1)
        alpha_col = jnp.where(col == 3, alpha, 0.0)
        return x_part + alpha_col + cond, (cos_p, sin_p)

    # identity tangent seeds in STATE coordinates; carried across steps
    # (see _disk_ode_loop: one end-of-transport det replaces per-step dets)
    tang0 = jnp.stack([jnp.where(is0, 1.0, 0.0).astype(f32),
                       jnp.where(is1, 1.0, 0.0).astype(f32)])

    def enc_tangent(tang, trig):
        """d(input_enc)/d(x0_k) = d(enc)/d(state) @ tang[k]. Disk: enc is
        the identity on the state lanes. Spherical: theta passes through;
        the phi component fans out to (cos phi, -sin phi) on input cols
        1 and 2."""
        if domain == "disk":
            return tang
        cos_p, sin_p = trig
        theta_part = jnp.where(is0, tang, 0.0)
        cos_part = cos_p[None] * tang           # nonzero only at is1
        sin_part = (-sin_p[None]) * tang
        return theta_part + cos_part + pltpu.roll(sin_part, shift=1, axis=2)

    ws = _hoist_weights(w_ref, n_layers, mxu)

    def body(t, carry):
        s, tang = carry
        tt = t.astype(f32) if hasattr(t, "astype") else float(t)
        alpha = (1.0 - tt * h) if reverse else (tt * h)
        inp, trig = encode(s, alpha)
        if with_jac:
            v, tz = _mlp_with_tangents(inp, enc_tangent(tang, trig), ws, mxu)
            # packed weights zero output cols >= 2 exactly, so no masks
            tang = tang + sign * h * tz
        else:
            v = _mlp_primal(inp, ws, mxu)
        s = s + sign * h * v
        return s, tang

    # Primal-only long transports (rectify pair generation: T=128/256,
    # with_jac=False) are the most VPU-exposed shape: ONE matmul stream
    # against the full silu epilogue, MXU mostly idle. Splitting the tile
    # into `interleave` independent sublane chunks and emitting each
    # layer's matmuls for ALL chunks before their activations would let
    # Mosaic overlap chunk B's matmul with chunk A's VPU epilogue INSIDE
    # the fori_loop body. r5 status: bit-exact vs the XLA oracle in
    # interpret mode, but the production compile SIGABRTs in the same
    # compiler pass as the unrolled BENCH_INTERLEAVE variant — kept
    # behind the explicit `interleave` argument for the next toolchain.
    if (
        not with_jac
        and T > _UNROLL_T
        and interleave > 1
        and tile % (8 * interleave) == 0
    ):
        C = interleave
        hr = tile // C
        col_h = col[:hr]
        conds = [cond[c * hr : (c + 1) * hr] for c in range(C)]

        def enc_chunk(s_c, alpha, cond_c):
            if domain == "disk":
                x_part = jnp.where(col_h < 2, s_c, 0.0)
                a_col = jnp.where(col_h == 2, alpha, 0.0)
                return x_part + a_col + cond_c
            theta = jnp.where(col_h == 0, s_c, 0.0)
            sin_p = jnp.where(col_h == 1, jnp.sin(s_c), 0.0)
            cos_p = jnp.where(col_h == 1, jnp.cos(s_c), 0.0)
            x_part = theta + sin_p + pltpu.roll(cos_p, shift=1, axis=1)
            a_col = jnp.where(col_h == 3, alpha, 0.0)
            return x_part + a_col + cond_c

        prec = _mxu_precision(mxu)

        def body_multi(t, ss):
            tt = t.astype(f32)
            alpha = (1.0 - tt * h) if reverse else (tt * h)
            xs = [enc_chunk(ss[c], alpha, conds[c]) for c in range(C)]
            for l, w in enumerate(ws):
                zs = [
                    jnp.dot(x, w, preferred_element_type=jnp.float32,
                            precision=prec)
                    for x in xs
                ]
                if l + 1 < n_layers:
                    xs = [z * _sigmoid(z) for z in zs]
                else:
                    xs = zs
            return tuple(ss[c] + sign * h * xs[c] for c in range(C))

        ss0 = tuple(s0[c * hr : (c + 1) * hr] for c in range(C))
        ss = jax.lax.fori_loop(0, T, body_multi, ss0)
        s_fin, tang_fin = jnp.concatenate(ss, axis=0), tang0
    elif T <= _UNROLL_T:
        s_fin, tang_fin = s0, tang0
        for t in range(T):
            s_fin, tang_fin = body(t, (s_fin, tang_fin))
    else:
        s_fin, tang_fin = jax.lax.fori_loop(0, T, body, (s0, tang0))
    # det product is stored on blockcol 2 (x uses 0:2)
    out = jnp.where(col < 2, s_fin, 0.0)
    if with_jac:
        det_fin = _det2_from_tangents(tang_fin)
        out = out + pltpu.roll(jnp.where(is0, det_fin, 0.0), shift=2, axis=1)
    out_ref[:] = _compact_epilogue(out, block) if compact else out


def _pack_rows(x: jnp.ndarray, offset: int, block: int, n_pad: int) -> jnp.ndarray:
    """(N, d) -> (N/pack, 128) rows of `pack` samples, features at blockcol
    offset:offset+d, zero elsewhere."""
    n, d = x.shape
    pack = LANES // block
    buf = jnp.zeros((n_pad, block), x.dtype)
    buf = buf.at[:n, offset : offset + d].set(x)
    return buf.reshape(n_pad // pack, LANES)


def _unpack_rows(rows: jnp.ndarray, n: int, block: int) -> jnp.ndarray:
    """(N/pack, 128) -> (N, block)."""
    pack = LANES // block
    return rows.reshape(rows.shape[0] * pack, block)[:n]


@functools.partial(
    jax.jit,
    static_argnames=("domain", "T", "n_layers", "block", "reverse", "with_jac",
                     "tile", "mxu_dtype", "compact", "interleave"),
)
def _fused_call(
    s_packed, c_packed, w_packed, *, domain, T, n_layers, block, reverse,
    with_jac, tile, mxu_dtype="bfloat16", compact=False, interleave=1
):
    n_rows = s_packed.shape[0]
    grid = (n_rows // tile,)
    kernel = functools.partial(
        _fused_ode_kernel,
        domain=domain,
        T=T,
        n_layers=n_layers,
        block=block,
        reverse=reverse,
        with_jac=with_jac,
        mxu_dtype=mxu_dtype,
        compact=compact,
        interleave=interleave,
    )
    rpo = (LANES // (LANES // block * _OUT_VALS)) if compact else 1
    streams = 3 if with_jac else 1
    flops = grid[0] * T * n_layers * (streams * tile * LANES * LANES * 2)
    out_spec = pl.BlockSpec((tile // rpo, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_rows // rpo, LANES), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (w_packed.shape[0], LANES, LANES),
                lambda i: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=out_spec,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=3 * n_rows * LANES * 4,
            transcendentals=grid[0] * T * n_layers * tile * LANES,
        ),
        interpret=_INTERPRET,
    )(s_packed, c_packed, w_packed)


# ------------------------------------------------------- fully fused ----
#
# fused_sample_pdf_disk: the ENTIRE render-time sample()+pdf() call in one
# kernel — base-density heads (a biased 2-layer MLP over the first 14
# condition columns, `model.py:374-398`), the Gaussian draw (in-kernel
# Box-Muller over pltpu.prng_random_bits), the T-step ODE with per-step
# Jacobian dets, and the final p0/det assembly. Removes the separate
# XLA base-draw dispatch which costs more than the whole kernel.
#
# Bias handling: the base net has biases (velocity nets do not); the packed
# condition rows carry a constant 1.0 at the last blockcol, and the bias
# vector rides in that row of the packed weight.

_ONE_COL = -1  # constant-one lane: last column of each block


def _pack_base_weights(base_params: dict, block: int,
                       cond_off: int = 3) -> jnp.ndarray:
    """(2, 128, 128) packed base-head weights.

    Layer 0: rows cond_off:cond_off+14 <- W0 (PE(omega_i, 3 bands) is the
    first 14 condition columns — the velocity PE shares band ordering so
    its prefix IS the base PE; cond starts at blockcol 3 for the disk
    layout and 4 for the spherical layout); row block-1 <- b0. Layer 1:
    rows 0:16 <- W1, row block-1 <- b1. Output cols 0:4 = disk
    (loc0, loc1, ls0, ls1) / spherical (loc_t, ls, loc_phi, conc_raw).
    The constant-one lane is preserved through layer 0 by a 1.0 at
    [block-1, block-1] (silu(1) != 1 is compensated by rescaling
    layer-1's bias row by 1/silu(1)).
    """
    w0 = base_params["net"][0]["w"].astype(jnp.float32)  # (14, 16)
    b0 = base_params["net"][0]["b"].astype(jnp.float32)
    w1 = base_params["net"][1]["w"].astype(jnp.float32)  # (16, 4)
    b1 = base_params["net"][1]["b"].astype(jnp.float32)
    d_in, hid = w0.shape
    pack = LANES // block
    eye = jnp.eye(pack, dtype=jnp.float32)
    # silu(1) as a python constant — float() on a jnp value would fail when
    # this packing is traced inside a jitted caller (the render programs)
    silu1 = 1.0 / (1.0 + math.exp(-1.0))

    m0 = jnp.zeros((block, block), jnp.float32)
    m0 = m0.at[cond_off : cond_off + d_in, :hid].set(w0)
    m0 = m0.at[block - 1, :hid].set(b0)
    m0 = m0.at[block - 1, block - 1].set(1.0)  # keep the one-lane alive
    m1 = jnp.zeros((block, block), jnp.float32)
    m1 = m1.at[:hid, :4].set(w1)
    m1 = m1.at[block - 1, :4].set(b1 / silu1)  # undo silu on the one-lane
    return jnp.stack([jnp.kron(eye, m0), jnp.kron(eye, m1)])


def _base_heads(cond, bw_ref, col):
    """Packed disk base-density heads from the condition rows: loc at
    blockcols 0:2, log_scale rolled onto blockcols 0:2."""
    f32 = jnp.float32
    z = jnp.dot(cond, bw_ref[0], preferred_element_type=f32)
    a = z * jax.nn.sigmoid(z)
    heads = jnp.dot(a, bw_ref[1], preferred_element_type=f32)
    loc = jnp.where(col < 2, heads, 0.0)
    ls = pltpu.roll(jnp.where((col >= 2) & (col < 4), heads, 0.0),
                    shift=LANES - 2, axis=1)  # log_scale onto cols 0:2
    return loc, ls


_UNROLL_T = 16  # unroll short ODE loops (T<=16); scan long transports

_OUT_VALS = 8  # useful values per sample in compacted kernel output


def _compact_epilogue(out, block: int):
    """Lane/row-compact the packed output tile so every lane is useful.

    Input: (tile, 128) where each 32/64-lane block holds one sample and
    only blockcols 0:8 carry data. Output: (tile // rows_per_out, 128)
    rows of `128 // 8` samples x 8 values, in sample order — a contiguous
    reshape to (n, 8) on the host side. This replaces the XLA
    reshape+slice compact of round 2, which cost MORE than the whole
    kernel (6.3 ms vs 5.0 ms at n=2^20 on v5e: the 8-of-32-lane strided
    gather plus narrow-minor-dim writes defeat the vector units); doing
    it with in-kernel rolls costs ~23 VPU ops per tile and shrinks the
    HBM write 4x.
    """
    tile = out.shape[0]
    pack = LANES // block
    group = pack * _OUT_VALS          # useful lanes per row after step 1
    rows_per_out = LANES // group
    lane = jax.lax.broadcasted_iota(jnp.int32, (tile, LANES), 1)
    bcol = lane % block
    blk = lane // block
    # step 1: gather each block's cols 0:8 into lanes [8k : 8k+8)
    y = jnp.where((blk == 0) & (bcol < _OUT_VALS), out, 0.0)
    for k in range(1, pack):
        piece = jnp.where((blk == k) & (bcol < _OUT_VALS), out, 0.0)
        y = y + pltpu.roll(piece, shift=(LANES - k * (block - _OUT_VALS)) % LANES,
                           axis=1)
    # step 2: fold `rows_per_out` consecutive rows into one 128-lane row
    z = jnp.where(lane < group, y, 0.0)
    for j in range(1, rows_per_out):
        up = pltpu.roll(y, shift=(tile - j) % tile, axis=0)
        up = pltpu.roll(up, shift=group * j, axis=1)
        z = z + jnp.where((lane >= group * j) & (lane < group * (j + 1)), up, 0.0)
    # keep every rows_per_out-th row
    return z.reshape(tile // rows_per_out, rows_per_out, LANES)[:, 0, :]


def _disk_ode_loop(x_init, cond, w_ref, *, T, n_layers, tile, col, reverse,
                   mxu, interleave=1):
    """T-step disk-domain Euler transport with the change-of-variables det,
    shared by the sample+pdf and pdf-query kernels. Returns (x_fin, det_fin)
    with x on blockcols 0:2 and the det product on blockcol 0 (other lanes
    of det_fin carry garbage — callers mask is0 once).

    VPU-economy notes (this loop is VPU-bound, not MXU-bound — VERDICT r2):
    instead of re-seeding identity tangents each step and paying a 2x2 det
    (two pltpu.rolls + ~8 elementwise ops) per step, the tangent streams
    are CARRIED across steps — tang[k] = d(state_t)/d(x0_k) propagated by
    the exact chain rule tang += h*(J_t @ tang) — and ONE det is taken at
    the end: det(prod_t(I + h J_t)) == prod_t det(I + h J_t) exactly (det
    is multiplicative), so this matches the XLA oracle's per-step det
    product (ode/flow.py:_step_det) to fp rounding. The v/tangent updates
    need no masking: the packed last-layer weights zero-pad output columns
    >= 2 of each block (pack_weights), so MXU outputs are exact zeros
    there. alpha*is2 folds to a trace-time constant in the unrolled loop;
    short loops unroll so Mosaic can software-pipeline VPU work against
    the next step's matmuls.
    """
    f32 = jnp.float32
    h = 1.0 / T
    sign = -1.0 if reverse else 1.0
    is0, is1 = (col == 0), (col == 1)
    is2f = jnp.where(col == 2, 1.0, 0.0).astype(f32)
    tang0 = jnp.stack([jnp.where(is0, 1.0, 0.0).astype(f32),
                       jnp.where(is1, 1.0, 0.0).astype(f32)])
    ws = _hoist_weights(w_ref, n_layers, mxu)

    def body(t, carry, cond_c, is2f_c=is2f):
        s, tang = carry
        tt = t.astype(f32) if hasattr(t, "astype") else float(t)
        alpha = (1.0 - tt * h) if reverse else (tt * h)
        # s stays masked to blockcols 0:2 by construction (x0 is masked at
        # the draw and every update adds exact zeros outside 0:2)
        inp = s + alpha * is2f_c + cond_c
        v, tz = _mlp_with_tangents(inp, tang, ws, mxu)
        return s + sign * h * v, tang + sign * h * tz

    # Split-chain interleave (r4 re-land of the r3 attempt that SIGABRTed
    # ApplyVectorLayoutPass): the serial matmul->silu->matmul dependency
    # leaves the MXU idle during every VPU epilogue; with `interleave`
    # independent row-chunk chains emitted in alternating program order,
    # Mosaic can overlap one chain's VPU work with another's matmuls.
    # Chunks are static sublane slices of the tile (layout-clean: tile
    # and tile//interleave stay multiples of 8).
    if interleave > 1 and T <= _UNROLL_T and tile % (8 * interleave) == 0:
        h_rows = tile // interleave
        chunks = [
            (
                x_init[c * h_rows : (c + 1) * h_rows],
                tang0[:, c * h_rows : (c + 1) * h_rows],
                cond[c * h_rows : (c + 1) * h_rows],
            )
            for c in range(interleave)
        ]
        states = [c[0] for c in chunks]
        tangs = [c[1] for c in chunks]
        conds = [c[2] for c in chunks]
        is2f_c = is2f[:h_rows]
        for t in range(T):
            for c in range(interleave):
                states[c], tangs[c] = body(t, (states[c], tangs[c]), conds[c],
                                           is2f_c)
        s_fin = jnp.concatenate(states, axis=0)
        tang_fin = jnp.concatenate(tangs, axis=1)
    elif T <= _UNROLL_T:
        carry = (x_init, tang0)
        for t in range(T):
            carry = body(t, carry, cond)
        s_fin, tang_fin = carry
    else:
        s_fin, tang_fin = jax.lax.fori_loop(
            0, T, lambda t, c: body(t, c, cond), (x_init, tang0))
    return s_fin, _det2_from_tangents(tang_fin)


def _fused_sample_pdf_kernel(
    seed_ref,  # (1, 1) int32 in SMEM
    c_ref,  # (TILE, 128) cond at blockcols 3:25, 1.0 at blockcol block-1
    *rest_refs,  # [eps_ref if not use_prng,] bw_ref, w_ref, out_ref
    T: int,
    n_layers: int,
    block: int,
    use_prng: bool,
    mxu_dtype: str = "bfloat16",
    compact: bool = False,
    interleave: int = 1,
):
    mxu = jnp.dtype(mxu_dtype)
    if use_prng:
        bw_ref, w_ref, out_ref = rest_refs
        eps_ref = None
    else:
        # interpret/CPU fallback: Pallas prng_* primitives are TPU-only,
        # normals are precomputed with jax.random and passed in
        eps_ref, bw_ref, w_ref, out_ref = rest_refs
    tile = c_ref.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (tile, LANES), 1) % block
    is0, is1, is2 = (col == 0), (col == 1), (col == 2)
    f32 = jnp.float32
    cond = c_ref[:]

    # ---- base heads: loc at cols 0:2, log_scale at cols 2:4
    loc, ls = _base_heads(cond, bw_ref, col)

    # ---- in-kernel standard normals (Box-Muller on prng bits)
    if use_prng:
        pltpu.prng_seed(seed_ref[0, 0] + pl.program_id(0))

        def _uniform():
            bits = pltpu.bitcast(pltpu.prng_random_bits((tile, LANES)), jnp.uint32)
            # top 24 bits -> [0, 1); via int32 (always positive after the
            # shift) because Mosaic has no uint32 -> f32 cast
            top24 = pltpu.bitcast(bits >> 8, jnp.int32)
            return top24.astype(f32) * (1.0 / (1 << 24))

        u1 = jnp.clip(_uniform(), 1e-7, 1.0 - 1e-7)
        u2 = _uniform()
        eps = jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(2.0 * jnp.pi * u2)
    else:
        eps = eps_ref[:]

    x0 = loc + jnp.where(col < 2, eps * jnp.exp(ls), 0.0)

    # log p0 = -log(2pi) - ls0 - ls1 - (eps0^2 + eps1^2)/2 , per sample
    per_col = jnp.where(col < 2, -ls - 0.5 * eps * eps, 0.0)
    pair_sum = per_col + pltpu.roll(per_col, shift=LANES - 1, axis=1)
    log_p0 = jnp.where(is0, pair_sum - jnp.log(2.0 * jnp.pi), 0.0)

    # ---- T-step ODE with per-step dets (disk layout: alpha at col 2)
    s_fin, det_fin = _disk_ode_loop(
        x0, cond, w_ref, T=T, n_layers=n_layers, tile=tile, col=col,
        reverse=False, mxu=mxu, interleave=interleave,
    )

    pdf = jnp.where(is0, jnp.exp(log_p0) / det_fin, 0.0)
    out = jnp.where(col < 2, s_fin, 0.0)
    out = out + pltpu.roll(pdf, shift=2, axis=1)  # pdf -> col 2
    out = out + pltpu.roll(jnp.where(col < 2, x0, 0.0), shift=4, axis=1)  # x0 -> 4:6
    out_ref[:] = _compact_epilogue(out, block) if compact else out


@functools.partial(
    jax.jit,
    static_argnames=("T", "n_layers", "block", "tile", "use_prng", "mxu_dtype",
                     "compact", "interleave"),
)
def _fused_sample_pdf_call(seed, c_packed, eps_packed, bw_packed, w_packed, *,
                           T, n_layers, block, tile, use_prng,
                           mxu_dtype="bfloat16", compact=False, interleave=1):
    n_rows = c_packed.shape[0]
    grid = (n_rows // tile,)
    kernel = functools.partial(
        _fused_sample_pdf_kernel, T=T, n_layers=n_layers, block=block,
        use_prng=use_prng, mxu_dtype=mxu_dtype, compact=compact,
        interleave=interleave,
    )
    rpo = (LANES // (LANES // block * _OUT_VALS)) if compact else 1
    tile_spec = pl.BlockSpec((tile, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        tile_spec,
    ]
    args = [seed, c_packed]
    if not use_prng:
        in_specs.append(tile_spec)
        args.append(eps_packed)
    in_specs += [
        pl.BlockSpec((2, LANES, LANES), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (w_packed.shape[0], LANES, LANES), lambda i: (0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    ]
    args += [bw_packed, w_packed]
    out_spec = (
        pl.BlockSpec((tile // rpo, LANES), lambda i: (i, 0),
                     memory_space=pltpu.VMEM)
        if compact
        else tile_spec
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_rows // rpo, LANES), jnp.float32),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        interpret=_INTERPRET,
    )(*args)


def fused_sample_pdf_disk(
    v_params: List[dict],
    base_params: dict,
    cond_enc: jnp.ndarray,
    seed,
    T: int,
    tile: int = 256,
    eps: jnp.ndarray | None = None,
    mxu_dtype: str = "bfloat16",
):
    """One-kernel disk-domain sample+pdf: (x, pdf, x0) for (N, 22) cond_enc.

    On TPU the Gaussian draw happens in-kernel (Pallas PRNG, seeded by
    `seed` + tile index). Pass `eps` (N, 2) standard normals to override —
    required in interpret mode (CPU), where the Pallas PRNG primitives
    don't exist. The in-kernel stream differs from jax.random, so x0 is
    returned for exact downstream verification. Functionally equivalent to
    `ode.ode_sample` (`mlp_brdf_sampling.py:17-51`).
    """
    n = cond_enc.shape[0]
    block = _block_size(v_params)
    pack = LANES // block
    n_pad = ((n + tile * pack - 1) // (tile * pack)) * (tile * pack)

    c_packed = _pack_rows(cond_enc.astype(jnp.float32), 3, block, n_pad)
    ones_col = jnp.zeros((n_pad, block), jnp.float32).at[:, block - 1].set(1.0)
    c_packed = c_packed + ones_col.reshape(n_pad // pack, LANES)
    bw_packed = _pack_base_weights(base_params, block)
    w_packed = pack_weights(v_params, block)
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1, 1)
    use_prng = eps is None
    eps_packed = (
        jnp.zeros((n_pad // pack, LANES), jnp.float32)
        if use_prng
        else _pack_rows(eps.astype(jnp.float32), 0, block, n_pad)
    )

    out = _fused_sample_pdf_call(
        seed_arr, c_packed, eps_packed, bw_packed, w_packed,
        T=T, n_layers=len(v_params), block=block, tile=tile, use_prng=use_prng,
        mxu_dtype=mxu_dtype, compact=True,
    )
    # compact rows reshape CONTIGUOUSLY to (n_pad, 8) — no strided gather
    rows = out.reshape(-1, _OUT_VALS)[:n]
    return rows[:, 0:2], rows[:, 2], rows[:, 4:6]


def make_fused_sample_pdf_disk(
    v_params: List[dict],
    base_params: dict,
    cond_enc: jnp.ndarray,
    T: int,
    tile: int = 256,
    eps: jnp.ndarray | None = None,
    mxu_dtype: str = "bfloat16",
):
    """Prepacked closure for repeated calls with a fixed wavefront.

    `fused_sample_pdf_disk` re-packs weights and the condition encoding on
    every invocation with eager jnp ops; over the tunneled dev backend each
    eager dispatch costs ~30 ms, which buries the ~6 ms kernel (the render
    loop and bench call it hundreds of times with the same cond_enc). This
    factory hoists all packing out and returns ``run(seed_arr) -> (x, pdf,
    x0)`` whose body is exactly three jitted dispatches: the pallas call
    and the two-stage unpack. seed_arr must be an int32 (1, 1) device
    array. Pass `eps` (N, 2) standard normals to bypass the in-kernel PRNG
    (required in interpret mode on CPU, as in `fused_sample_pdf_disk`).
    """
    n = cond_enc.shape[0]
    use_prng = eps is None
    c_packed, eps_packed, bw_packed, w_packed, block, _ = (
        pack_sample_pdf_inputs(v_params, base_params, cond_enc, tile, eps)
    )
    jax.block_until_ready((c_packed, bw_packed, w_packed, eps_packed))

    # Single-dispatch run: pallas call + unpack in ONE jitted program (the
    # tunneled backend costs ~0.55 ms per dispatch; three dispatches per
    # call buried the kernel). The packed buffers are passed as ARGUMENTS
    # to the module-level jitted impl — closing over them under jax.jit
    # would bake 134 MB of program constants in and measurably slow the
    # call. Unpack is two-stage: one wide reshape+slice to (N, 8), then
    # narrow splits on the small buffer (emitting narrow outputs directly
    # from the (N/pack, 128) kernel buffer costs ~6.5 ms on v5e — sub-tile
    # minor dims force padded scatter-writes of the full-size buffer).
    n_layers = len(v_params)

    def run(seed_arr: jnp.ndarray):
        return _sample_pdf_run(
            seed_arr, c_packed, eps_packed, bw_packed, w_packed,
            n=n, T=T, n_layers=n_layers, block=block, tile=tile,
            use_prng=use_prng, mxu_dtype=mxu_dtype,
        )

    return run


@functools.partial(
    jax.jit,
    static_argnames=("n", "T", "n_layers", "block", "tile", "use_prng",
                     "mxu_dtype"),
)
def _sample_pdf_run(seed_arr, c_packed, eps_packed, bw_packed, w_packed, *,
                    n, T, n_layers, block, tile, use_prng, mxu_dtype):
    out = _fused_sample_pdf_call(
        seed_arr, c_packed, eps_packed, bw_packed, w_packed,
        T=T, n_layers=n_layers, block=block, tile=tile,
        use_prng=use_prng, mxu_dtype=mxu_dtype, compact=True,
    )
    # The kernel compacts in-VMEM (see _compact_epilogue), so this reshape
    # is a contiguous view. NOTE: materializing the three narrow slices at
    # this jit boundary costs ~6 ms at n=2^20 (narrow-minor-dim buffers are
    # lane-padded on TPU) — throughput-critical callers should use
    # make_fused_sample_pdf_rows and slice INSIDE their own jit.
    m = out.reshape(-1, _OUT_VALS)[:n]
    return m[:, 0:2], m[:, 2], m[:, 4:6]


def pack_sample_pdf_inputs(
    v_params: List[dict],
    base_params: dict,
    cond_enc: jnp.ndarray,
    tile: int,
    eps: jnp.ndarray | None = None,
):
    """Pack every device buffer the fused sample+pdf kernel needs. Returns
    ``(c_packed, eps_packed, bw_packed, w_packed, block, n_pad)``. Exposed
    so throughput-critical callers (bench.py) can pass the packed buffers
    as ARGUMENTS to their own jitted step — closing over them under
    jax.jit bakes them in as program constants (134 MB at n=2^20) and
    measurably slows the call."""
    n = cond_enc.shape[0]
    block = _block_size(v_params)
    pack = LANES // block
    n_pad = ((n + tile * pack - 1) // (tile * pack)) * (tile * pack)

    c_packed = _pack_rows(cond_enc.astype(jnp.float32), 3, block, n_pad)
    ones_col = jnp.zeros((n_pad, block), jnp.float32).at[:, block - 1].set(1.0)
    c_packed = c_packed + ones_col.reshape(n_pad // pack, LANES)
    bw_packed = _pack_base_weights(base_params, block)
    w_packed = pack_weights(v_params, block)
    eps_packed = (
        jnp.zeros((n_pad // pack, LANES), jnp.float32)
        if eps is None
        else _pack_rows(eps.astype(jnp.float32), 0, block, n_pad)
    )
    return c_packed, eps_packed, bw_packed, w_packed, block, n_pad


def make_fused_sample_pdf_rows(
    v_params: List[dict],
    base_params: dict,
    cond_enc: jnp.ndarray,
    T: int,
    tile: int = 1024,
    eps: jnp.ndarray | None = None,
    mxu_dtype: str = "bfloat16",
):
    """Max-throughput variant of `make_fused_sample_pdf_disk`: returns
    ``(run, n_pad)`` where ``run(seed_arr)`` is ONE dispatch returning the
    kernel's compacted rows — a dense (n_rows, 128) fp32 buffer whose
    CONTIGUOUS reshape ``rows.reshape(-1, 8)[:n]`` yields per-sample
    (x at 0:2, pdf at 2, x0 at 4:6). Callers slice INSIDE their own jit;
    materializing the narrow slices at a jit boundary costs ~6 ms at
    n=2^20 (TPU lane-pads narrow minor dims), which is more than the
    whole kernel."""
    use_prng = eps is None
    c_packed, eps_packed, bw_packed, w_packed, block, n_pad = (
        pack_sample_pdf_inputs(v_params, base_params, cond_enc, tile, eps)
    )
    jax.block_until_ready((c_packed, bw_packed, w_packed, eps_packed))
    n_layers = len(v_params)

    def run(seed_arr: jnp.ndarray):
        return _fused_sample_pdf_call(
            seed_arr, c_packed, eps_packed, bw_packed, w_packed,
            T=T, n_layers=n_layers, block=block, tile=tile,
            use_prng=use_prng, mxu_dtype=mxu_dtype, compact=True,
        )

    return run, n_pad


def _disk_pdf_exact_loop(y, cond, w_ref, *, T, n_layers, tile, col, mxu,
                         newton_iters):
    """In-kernel Newton exact-inverse of the FORWARD Euler map — the fused
    twin of `ode/flow.py:ode_pdf_exact` (VERDICT r3 item 4: the production
    pdf path integrated reverse Euler, ~25% median off the sampler's own
    pdf on trained nets; this brings the fused path to Newton tolerance).

    Per step t = T-1..0 solves y = x + h v(x, t/T) for x: reverse-Euler
    warm start, `newton_iters` Newton updates (the 2x2 solve is closed
    form in lane algebra: J columns arrive as the two tangent streams,
    entries are extracted with blockcol masks and paired with one
    lane-roll), then ONE tangent pass at the converged point for the
    forward det. Returns (x0, det_prod) with det on blockcol 0; the
    caller DIVIDES p0 by it (forward-sampling semantics), unlike the
    reverse-Euler loop whose det multiplies.
    """
    f32 = jnp.float32
    h = 1.0 / T
    is0, is1 = (col == 0), (col == 1)
    is0f = jnp.where(is0, 1.0, 0.0).astype(f32)
    is1f = jnp.where(is1, 1.0, 0.0).astype(f32)
    is2f = jnp.where(col == 2, 1.0, 0.0).astype(f32)
    tang0 = jnp.stack([is0f, is1f])
    ws = _hoist_weights(w_ref, n_layers, mxu)
    left1 = LANES - 1  # roll blockcol 1 onto blockcol 0

    x = y
    det_acc = jnp.ones((tile, LANES), f32)
    for t in range(T - 1, -1, -1):
        alpha = t * h
        # warm start: reverse Euler from the current target point
        v0 = _mlp_primal(x + alpha * is2f + cond, ws, mxu)
        xg = x - h * v0
        for _ in range(newton_iters):
            vg, tz = _mlp_with_tangents(xg + alpha * is2f + cond, tang0, ws,
                                        mxu)
            # F = xg + h v(xg) - x on blockcols 0:2
            F = xg + h * vg - x
            f0 = jnp.where(is0, F, 0.0)
            f1r = pltpu.roll(jnp.where(is1, F, 0.0), shift=left1, axis=1)
            # J columns: tz[0] = (J00 at col0, J10 at col1); tz[1] =
            # (J01 at col0, J11 at col1)
            a = jnp.where(is0, 1.0 + h * tz[0], 0.0)          # col0
            b = jnp.where(is0, h * tz[1], 0.0)                # col0
            cr = pltpu.roll(jnp.where(is1, h * tz[0], 0.0), shift=left1,
                            axis=1)                            # c -> col0
            dr = pltpu.roll(jnp.where(is1, 1.0 + h * tz[1], 0.0),
                            shift=left1, axis=1)               # d -> col0
            det = a * dr - b * cr                              # col0
            inv = jnp.where(is0, 1.0 / jnp.where(jnp.abs(det) > 1e-20, det,
                                                 1.0), 0.0)
            dx0 = (dr * f0 - b * f1r) * inv                    # col0
            dx1 = (a * f1r - cr * f0) * inv                    # col0
            xg = xg - (dx0 + pltpu.roll(dx1, shift=1, axis=1))
        # forward det at the converged point (matches ode_pdf_exact's
        # final _velocity_and_jac)
        _, tzf = _mlp_with_tangents(xg + alpha * is2f + cond, tang0, ws, mxu)
        a = jnp.where(is0, 1.0 + h * tzf[0], 0.0)
        b = jnp.where(is0, h * tzf[1], 0.0)
        cr = pltpu.roll(jnp.where(is1, h * tzf[0], 0.0), shift=left1, axis=1)
        dr = pltpu.roll(jnp.where(is1, 1.0 + h * tzf[1], 0.0), shift=left1,
                        axis=1)
        det_acc = det_acc * (a * dr - b * cr)
        x = xg
    return x, det_acc


def _fused_pdf_kernel(
    s_ref,  # (TILE, 128) packed query x at blockcols 0:2
    c_ref,  # (TILE, 128) cond at blockcols 3:25, 1.0 at blockcol block-1
    bw_ref,  # (2, 128, 128) packed base weights
    w_ref,  # (L, 128, 128) packed velocity weights
    out_ref,  # (TILE, 128): 0:2 = recovered x0, col 2 = pdf
    *,
    T: int,
    n_layers: int,
    block: int,
    mxu_dtype: str = "bfloat16",
    compact: bool = False,
    exact: bool = False,
    newton_iters: int = 2,
):
    """Disk pdf query fully fused: inverse T-step transport with det
    products, then the base density at the recovered x0 — one kernel for
    the whole of `network_pdf_disk` (`mlp_brdf_sampling.py:69-103`).
    `exact=True` inverts the forward Euler map itself (Newton), matching
    the sampler's own pdf to ~1e-3 instead of reverse-Euler's ~25%."""
    mxu = jnp.dtype(mxu_dtype)
    tile = s_ref.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (tile, LANES), 1) % block
    is0 = col == 0
    cond = c_ref[:]

    if exact:
        x0, det_fin = _disk_pdf_exact_loop(
            s_ref[:], cond, w_ref, T=T, n_layers=n_layers, tile=tile,
            col=col, mxu=mxu, newton_iters=newton_iters,
        )
    else:
        x0, det_fin = _disk_ode_loop(
            s_ref[:], cond, w_ref, T=T, n_layers=n_layers, tile=tile,
            col=col, reverse=True, mxu=mxu,
        )

    # base log-prob at x0: z = (x0 - loc) * exp(-ls) per column
    loc, ls = _base_heads(cond, bw_ref, col)
    z = jnp.where(col < 2, (x0 - loc) * jnp.exp(-ls), 0.0)
    per_col = jnp.where(col < 2, -ls - 0.5 * z * z, 0.0)
    pair_sum = per_col + pltpu.roll(per_col, shift=LANES - 1, axis=1)
    log_p0 = jnp.where(is0, pair_sum - jnp.log(2.0 * jnp.pi), 0.0)

    p0 = jnp.exp(log_p0)
    # reverse-Euler multiplies reverse dets; Newton-exact divides the
    # forward det product (`ode/flow.py:219`)
    pdf = jnp.where(is0, p0 / det_fin if exact else p0 * det_fin, 0.0)
    out = jnp.where(col < 2, x0, 0.0) + pltpu.roll(pdf, shift=2, axis=1)
    out_ref[:] = _compact_epilogue(out, block) if compact else out


@functools.partial(
    jax.jit, static_argnames=("T", "n_layers", "block", "tile", "mxu_dtype",
                              "compact", "exact", "newton_iters")
)
def _fused_pdf_call(s_packed, c_packed, bw_packed, w_packed, *, T, n_layers,
                    block, tile, mxu_dtype="bfloat16", compact=False,
                    exact=False, newton_iters=2):
    n_rows = s_packed.shape[0]
    grid = (n_rows // tile,)
    kernel = functools.partial(
        _fused_pdf_kernel, T=T, n_layers=n_layers, block=block,
        mxu_dtype=mxu_dtype, compact=compact, exact=exact,
        newton_iters=newton_iters,
    )
    rpo = (LANES // (LANES // block * _OUT_VALS)) if compact else 1
    tile_spec = pl.BlockSpec((tile, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out_spec = (
        pl.BlockSpec((tile // rpo, LANES), lambda i: (i, 0),
                     memory_space=pltpu.VMEM)
        if compact
        else tile_spec
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_rows // rpo, LANES), jnp.float32),
        grid=grid,
        in_specs=[
            tile_spec,
            tile_spec,
            pl.BlockSpec((2, LANES, LANES), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w_packed.shape[0], LANES, LANES), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_spec,
        interpret=_INTERPRET,
    )(s_packed, c_packed, bw_packed, w_packed)


def fused_pdf_disk(
    v_params: List[dict],
    base_params: dict,
    x: jnp.ndarray,
    cond_enc: jnp.ndarray,
    T: int,
    tile: int = 256,
    mxu_dtype: str = "bfloat16",
    exact: bool = False,
    newton_iters: int = 2,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One-kernel disk pdf query: (pdf, x0) for query points `x` (N, 2).

    Functionally equivalent to `ode.ode_pdf` (`mlp_brdf_sampling.py:69-103`)
    (or `ode_pdf_exact` with exact=True); the XLA path is the parity
    oracle. All packing is jnp, so this traces cleanly inside a jitted
    caller (the per-bounce render program)."""
    return fused_pdf_disk_packed(
        prepack_disk(v_params, base_params), x, cond_enc, T, tile=tile,
        mxu_dtype=mxu_dtype, exact=exact, newton_iters=newton_iters,
    )


# ------------------------------------------------- prepacked entry points
#
# The render bounce program calls sample/pdf once per bounce per matball
# with FRESH conditions but FIXED weights. The plain entry points re-pack
# the weights (a stack of jnp.kron products) on every trace/call; these
# variants take the packed weights as pytree data so the bounce jit treats
# them as inputs (packed once at make_neural_bsdf time) — VERDICT r3
# item 7.


def prepack_disk(v_params: List[dict], base_params: dict):
    """(w_packed, bw_packed, block, n_layers) for the disk kernels."""
    block = _block_size(v_params)
    return (
        pack_weights(v_params, block),
        _pack_base_weights(base_params, block),
        block,
        len(v_params),
    )


def prepack_velocity(v_params: List[dict]):
    """(w_packed, block, n_layers) for the transport kernel."""
    block = _block_size(v_params)
    return pack_weights(v_params, block), block, len(v_params)


def _pack_cond(cond_enc, block, n_pad, with_one=True):
    pack = LANES // block
    c = _pack_rows(cond_enc.astype(jnp.float32), 3, block, n_pad)
    if with_one:
        ones_col = jnp.zeros((n_pad, block), jnp.float32).at[:, block - 1].set(1.0)
        c = c + ones_col.reshape(n_pad // pack, LANES)
    return c


def fused_sample_pdf_disk_packed(
    packed,
    cond_enc: jnp.ndarray,
    seed,
    T: int,
    tile: int = 256,
    eps: jnp.ndarray | None = None,
    mxu_dtype: str = "bfloat16",
):
    """`fused_sample_pdf_disk` with prepacked weights (see prepack_disk).
    `seed` feeds the in-kernel PRNG when `eps` is None (TPU production);
    pass `eps` (N, 2) for the key-exact / interpret path."""
    w_packed, bw_packed, block, n_layers = packed
    n = cond_enc.shape[0]
    pack = LANES // block
    n_pad = ((n + tile * pack - 1) // (tile * pack)) * (tile * pack)
    c_packed = _pack_cond(cond_enc, block, n_pad)
    use_prng = eps is None
    eps_packed = (
        jnp.zeros((n_pad // pack, LANES), jnp.float32)
        if use_prng
        else _pack_rows(eps.astype(jnp.float32), 0, block, n_pad)
    )
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1, 1)
    out = _fused_sample_pdf_call(
        seed_arr, c_packed, eps_packed, bw_packed, w_packed,
        T=T, n_layers=n_layers, block=block, tile=tile, use_prng=use_prng,
        mxu_dtype=mxu_dtype, compact=True,
    )
    rows = out.reshape(-1, _OUT_VALS)[:n]
    return rows[:, 0:2], rows[:, 2], rows[:, 4:6]


def fused_pdf_disk_packed(
    packed,
    x: jnp.ndarray,
    cond_enc: jnp.ndarray,
    T: int,
    tile: int = 256,
    mxu_dtype: str = "bfloat16",
    exact: bool = False,
    newton_iters: int = 2,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """`fused_pdf_disk` with prepacked weights (see prepack_disk)."""
    w_packed, bw_packed, block, n_layers = packed
    n = x.shape[0]
    pack = LANES // block
    n_pad = ((n + tile * pack - 1) // (tile * pack)) * (tile * pack)
    s_packed = _pack_rows(x.astype(jnp.float32), 0, block, n_pad)
    c_packed = _pack_cond(cond_enc, block, n_pad)
    out = _fused_pdf_call(
        s_packed, c_packed, bw_packed, w_packed,
        T=T, n_layers=n_layers, block=block, tile=tile,
        mxu_dtype=mxu_dtype, compact=True, exact=exact,
        newton_iters=newton_iters,
    )
    rows = out.reshape(-1, _OUT_VALS)[:n]
    return rows[:, 2], rows[:, 0:2]


def fused_transport_packed(
    packed,
    domain: str,
    x0: jnp.ndarray,
    cond_enc: jnp.ndarray,
    T: int,
    reverse: bool = False,
    with_jac: bool = True,
    tile: int = 256,
    mxu_dtype: str = "bfloat16",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """`fused_ode_transport` with prepacked weights (see prepack_velocity)."""
    w_packed, block, n_layers = packed
    n = x0.shape[0]
    pack = LANES // block
    n_pad = ((n + tile * pack - 1) // (tile * pack)) * (tile * pack)
    cond_off = 3 if domain == "disk" else 4
    s_packed = _pack_rows(x0.astype(jnp.float32), 0, block, n_pad)
    c_packed = _pack_rows(cond_enc.astype(jnp.float32), cond_off, block, n_pad)
    out = _fused_call(
        s_packed, c_packed, w_packed,
        domain=domain, T=T, n_layers=n_layers, block=block, reverse=reverse,
        with_jac=with_jac, tile=tile, mxu_dtype=mxu_dtype, compact=True,
    )
    rows = out.reshape(-1, _OUT_VALS)[:n]
    return rows[:, 0:2], rows[:, 2]


def fused_ode_transport(
    domain: str,
    v_params: List[dict],
    x0: jnp.ndarray,
    cond_enc: jnp.ndarray,
    T: int,
    reverse: bool = False,
    with_jac: bool = True,
    tile: int | None = None,
    mxu_dtype: str = "bfloat16",
    interleave: int | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Run the fused T-step Euler transport.

    Forward (reverse=False): x0 -> x_T, returns (x_T, prod_t det(I + J/T)).
    Reverse (reverse=True):  x_T -> x0, returns (x0, prod_t det(I - J/T)).
    Semantics identical to `ode/flow.py` (`mlp_brdf_sampling.py:17-51` /
    `:69-103`); that XLA path is the parity oracle in tests.
    """
    if tile is None:
        # the fori_loop scan pays a large per-trip overhead per grid
        # step: at T=256 a (256,128) tile measured 657 ms/1M samples vs
        # 120 ms at (1024,128) — 5.5x — while short unrolled transports
        # are insensitive (r5 sweep, /v5e). Amortize long scans over a
        # tall tile.
        tile = 1024 if T > _UNROLL_T else 256
    n = x0.shape[0]
    block = _block_size(v_params)
    pack = LANES // block
    n_pad = ((n + tile * pack - 1) // (tile * pack)) * (tile * pack)

    cond_off = 3 if domain == "disk" else 4
    s_packed = _pack_rows(x0.astype(jnp.float32), 0, block, n_pad)
    c_packed = _pack_rows(cond_enc.astype(jnp.float32), cond_off, block, n_pad)
    w_packed = pack_weights(v_params, block)

    if interleave is None:
        # r5: the scan-body multi-chunk variant ALSO dies in Mosaic's
        # compile helper (SIGABRT, same as the unrolled BENCH_INTERLEAVE
        # dataflow) — bit-exact in interpret mode, blocked on the
        # toolchain. Default stays single-chain; flip to 2 when a
        # toolchain bump can schedule it.
        interleave = 1
    out = _fused_call(
        s_packed,
        c_packed,
        w_packed,
        domain=domain,
        T=T,
        n_layers=len(v_params),
        block=block,
        reverse=reverse,
        with_jac=with_jac,
        tile=tile,
        mxu_dtype=mxu_dtype,
        compact=True,
        interleave=interleave,
    )
    rows = out.reshape(-1, _OUT_VALS)[:n]
    return rows[:, 0:2], rows[:, 2]


def make_fused_transport(
    domain: str,
    v_params: List[dict],
    cond_enc: jnp.ndarray,
    T: int,
    reverse: bool = False,
    with_jac: bool = True,
    tile: int | None = None,
    mxu_dtype: str = "bfloat16",
):
    """Prepacked `fused_ode_transport` closure: weights + condition packed
    once. Returns ``run(x) -> (x', det)`` whose body is one jitted dispatch
    (state pack + pallas + unpack in a single program) and zero eager ops —
    use when the same wavefront's conditions are transported repeatedly
    (rectify pair generation, spherical sample/pdf paths, benchmarks)."""
    if tile is None:
        tile = 1024 if T > _UNROLL_T else 256  # see fused_ode_transport
    n = cond_enc.shape[0]
    block = _block_size(v_params)
    pack = LANES // block
    n_pad = ((n + tile * pack - 1) // (tile * pack)) * (tile * pack)

    cond_off = 3 if domain == "disk" else 4
    c_packed = _pack_rows(cond_enc.astype(jnp.float32), cond_off, block, n_pad)
    w_packed = pack_weights(v_params, block)
    jax.block_until_ready((c_packed, w_packed))

    n_layers = len(v_params)

    def run(x: jnp.ndarray):
        return _transport_run(
            x, c_packed, w_packed,
            n=n, n_pad=n_pad, domain=domain, T=T, n_layers=n_layers,
            block=block, reverse=reverse, with_jac=with_jac, tile=tile,
            mxu_dtype=mxu_dtype,
        )

    return run


@functools.partial(
    jax.jit,
    static_argnames=("n", "n_pad", "domain", "T", "n_layers", "block",
                     "reverse", "with_jac", "tile", "mxu_dtype"),
)
def _transport_run(x, c_packed, w_packed, *, n, n_pad, domain, T, n_layers,
                   block, reverse, with_jac, tile, mxu_dtype):
    out = _fused_call(
        _pack_rows(x.astype(jnp.float32), 0, block, n_pad),
        c_packed, w_packed,
        domain=domain, T=T, n_layers=n_layers, block=block,
        reverse=reverse, with_jac=with_jac, tile=tile, mxu_dtype=mxu_dtype,
        compact=True,
    )
    m = out.reshape(-1, _OUT_VALS)[:n]
    return m[:, 0:2], m[:, 2]


# ----------------------------------------- fully fused spherical ----
#
# The spherical twin of _fused_sample_pdf_kernel (VERDICT r3 item 3): the
# Gaussian(theta) x von-Mises(phi) base draw, the T=8 transport with
# carried tangents, and the p0/det assembly in ONE kernel. The von Mises
# draw is Best-Fisher rejection with the FIXED 16 rounds of
# models/von_mises.py, unrolled in-kernel over Pallas PRNG uniforms with
# first-accept masked selection — no data-dependent control flow.

# A&S I0 polynomial coefficients (models/von_mises.py) as python floats so
# the unrolled Horner chain folds them into immediates
_I0_SMALL_C = [1.0, 3.5156229, 3.0899424, 1.2067492, 0.2659732, 0.0360768,
               0.0045813]
_I0_LARGE_C = [0.39894228, 0.01328592, 0.00225319, -0.00157565, 0.00916281,
               -0.02057706, 0.02635537, -0.01647633, 0.00392377]
_EPS_SPH = 1e-3  # base_density._EPS_SPHERICAL
_VM_ROUNDS = 16


# A&S 4.4.46 arccos polynomial (|error| <= 2e-8 rad) — Mosaic has no
# inverse-trig primitives (only sin/cos/tan lower), so the kernel builds
# arccos from sqrt + an 8-term Horner chain
_ACOS_C = [1.5707963050, -0.2145988016, 0.0889789874, -0.0501743046,
           0.0308918810, -0.0170881256, 0.0066700901, -0.0012624911]


def _acos_lanes(x):
    xa = jnp.clip(jnp.abs(x), 0.0, 1.0)
    p = jnp.zeros_like(xa)
    for c in reversed(_ACOS_C):
        p = p * xa + c
    r = jnp.sqrt(jnp.maximum(1.0 - xa, 0.0)) * p
    return jnp.where(x >= 0, r, jnp.pi - r)


def _log_i0_lanes(x):
    """log I0(x) on vector lanes (A&S 9.8.1/9.8.2 polynomial pair)."""
    x = jnp.abs(x)
    t_small = (x / 3.75) ** 2
    poly_s = jnp.zeros_like(x)
    for c in reversed(_I0_SMALL_C):
        poly_s = poly_s * t_small + c
    xs = jnp.maximum(x, 1e-6)
    t_large = 3.75 / xs
    poly_l = jnp.zeros_like(x)
    for c in reversed(_I0_LARGE_C):
        poly_l = poly_l * t_large + c
    large = xs - 0.5 * jnp.log(xs) + jnp.log(jnp.maximum(poly_l, 1e-30))
    return jnp.where(x <= 3.75, jnp.log(jnp.maximum(poly_s, 1e-30)), large)


def _spherical_ode_loop(s0, cond, w_ref, *, T, n_layers, tile, col, mxu):
    """Forward T-step spherical transport with carried tangents — the
    domain='spherical' body of _fused_ode_kernel, callable from the fused
    sample+pdf kernel. Returns (s_fin, det_fin) with det on blockcol 0."""
    f32 = jnp.float32
    h = 1.0 / T
    is0, is1 = (col == 0), (col == 1)
    tang0 = jnp.stack([jnp.where(is0, 1.0, 0.0).astype(f32),
                       jnp.where(is1, 1.0, 0.0).astype(f32)])
    ws = _hoist_weights(w_ref, n_layers, mxu)

    def body(t, carry):
        s, tang = carry
        tt = t.astype(f32) if hasattr(t, "astype") else float(t)
        alpha = tt * h
        theta = jnp.where(is0, s, 0.0)
        sin_p = jnp.where(is1, jnp.sin(s), 0.0)
        cos_p = jnp.where(is1, jnp.cos(s), 0.0)
        inp = (theta + sin_p + pltpu.roll(cos_p, shift=1, axis=1)
               + jnp.where(col == 3, alpha, 0.0) + cond)
        theta_t = jnp.where(is0, tang, 0.0)
        cos_t = cos_p[None] * tang
        sin_t = (-sin_p[None]) * tang
        tang_in = theta_t + cos_t + pltpu.roll(sin_t, shift=1, axis=2)
        v, tz = _mlp_with_tangents(inp, tang_in, ws, mxu)
        return s + h * v, tang + h * tz

    if T <= _UNROLL_T:
        carry = (s0, tang0)
        for t in range(T):
            carry = body(t, carry)
        s_fin, tang_fin = carry
    else:
        s_fin, tang_fin = jax.lax.fori_loop(0, T, body, (s0, tang0))
    return s_fin, _det2_from_tangents(tang_fin)


def _fused_sample_pdf_sph_kernel(
    seed_ref,  # (1, 1) int32 SMEM
    c_ref,  # (TILE, 128) cond at blockcols 4:26, 1.0 at blockcol block-1
    *rest_refs,  # [eps_ref if not use_prng,] bw_ref, w_ref, out_ref
    T: int,
    n_layers: int,
    block: int,
    use_prng: bool,
    mxu_dtype: str = "bfloat16",
    compact: bool = False,
):
    mxu = jnp.dtype(mxu_dtype)
    if use_prng:
        bw_ref, w_ref, out_ref = rest_refs
        eps_ref = None
    else:
        # interpret/CPU path: eps_ref carries the standard normal for
        # theta at blockcol 0 and a PRE-DRAWN von Mises phi at blockcol 1
        # (drawn with jax.random outside, so fused == XLA exactly)
        eps_ref, bw_ref, w_ref, out_ref = rest_refs
    tile = c_ref.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (tile, LANES), 1) % block
    is0, is1, is2 = (col == 0), (col == 1), (col == 2)
    f32 = jnp.float32
    cond = c_ref[:]

    def left(x, k):
        return pltpu.roll(x, shift=LANES - k, axis=1)

    # ---- base heads -> all four scalars on blockcol 0
    z = jnp.dot(cond, bw_ref[0], preferred_element_type=f32)
    a = z * jax.nn.sigmoid(z)
    heads = jnp.dot(a, bw_ref[1], preferred_element_type=f32)
    loc_t = jnp.where(is0, heads, 0.0)
    ls = left(jnp.where(is1, heads, 0.0), 1)
    loc_p = left(jnp.where(is2, heads, 0.0), 2)
    craw = left(jnp.where(col == 3, heads, 0.0), 3)
    conc = jax.nn.softplus(craw) + _EPS_SPH
    scale_t = jnp.exp(ls) + _EPS_SPH

    if use_prng:
        pltpu.prng_seed(seed_ref[0, 0] + pl.program_id(0))

        def _uniform():
            bits = pltpu.bitcast(pltpu.prng_random_bits((tile, LANES)),
                                 jnp.uint32)
            top24 = pltpu.bitcast(bits >> 8, jnp.int32)
            return top24.astype(f32) * (1.0 / (1 << 24))

        u1g = jnp.clip(_uniform(), 1e-7, 1.0 - 1e-7)
        u2g = _uniform()
        eps_g = jnp.sqrt(-2.0 * jnp.log(u1g)) * jnp.cos(2.0 * jnp.pi * u2g)
        # Best-Fisher (models/von_mises.py), unrolled, first-accept
        kappa = jnp.maximum(conc, 1e-12)
        tau = 1.0 + jnp.sqrt(1.0 + 4.0 * kappa * kappa)
        rho = (tau - jnp.sqrt(2.0 * tau)) / (2.0 * kappa)
        r = (1.0 + rho * rho) / (2.0 * rho)
        done = jnp.zeros((tile, LANES), bool)
        sel = jnp.zeros((tile, LANES), f32)
        u_first = None
        for _ in range(_VM_ROUNDS):
            u0 = jnp.clip(_uniform(), 1e-7, 1.0 - 1e-7)
            u1 = jnp.clip(_uniform(), 1e-7, 1.0 - 1e-7)
            u2 = jnp.clip(_uniform(), 1e-7, 1.0 - 1e-7)
            if u_first is None:
                u_first = u0
            zq = jnp.cos(jnp.pi * u0)
            fq = (1.0 + r * zq) / (r + zq)
            cq = kappa * (r - fq)
            accept = ((cq * (2.0 - cq) - u1) > 0.0) | (
                (jnp.log(jnp.maximum(cq, 1e-30) / u1) + 1.0 - cq) >= 0.0)
            take = accept & jnp.logical_not(done)
            ang = jnp.where(u2 >= 0.5, 1.0, -1.0) * _acos_lanes(
                jnp.clip(fq, -1.0, 1.0))
            sel = jnp.where(take, ang, sel)
            done = done | accept
        phi0 = sel + loc_p
        phi0 = jnp.mod(phi0 + jnp.pi, 2.0 * jnp.pi) - jnp.pi
        phi0 = jnp.where(kappa < 1e-6, u_first * 2.0 * jnp.pi - jnp.pi, phi0)
        eps_t = eps_g
    else:
        eps = eps_ref[:]
        eps_t = jnp.where(is0, eps, 0.0)
        phi0 = left(jnp.where(is1, eps, 0.0), 1)

    theta0 = loc_t + jnp.where(is0, eps_t, 0.0) * scale_t
    # log p0 on blockcol 0 (Gaussian(theta): z == eps by construction;
    # von Mises(phi): kappa cos(phi - loc) - log 2pi - log I0)
    kap = jnp.maximum(conc, 1e-12)
    loggau = -0.5 * jnp.log(2.0 * jnp.pi) - ls - 0.5 * eps_t * eps_t
    logvon = (kap * jnp.cos(phi0 - loc_p) - jnp.log(2.0 * jnp.pi)
              - _log_i0_lanes(kap))
    log_p0 = loggau + logvon

    s0 = jnp.where(is0, theta0, 0.0) + pltpu.roll(
        jnp.where(is0, phi0, 0.0), shift=1, axis=1)

    s_fin, det_fin = _spherical_ode_loop(
        s0, cond, w_ref, T=T, n_layers=n_layers, tile=tile, col=col, mxu=mxu)

    pdf = jnp.where(is0, jnp.exp(log_p0) / det_fin, 0.0)
    out = jnp.where(col < 2, s_fin, 0.0)
    out = out + pltpu.roll(pdf, shift=2, axis=1)
    out = out + pltpu.roll(jnp.where(col < 2, s0, 0.0), shift=4, axis=1)
    out_ref[:] = _compact_epilogue(out, block) if compact else out


@functools.partial(
    jax.jit,
    static_argnames=("T", "n_layers", "block", "tile", "use_prng",
                     "mxu_dtype", "compact"),
)
def _fused_sample_pdf_sph_call(seed, c_packed, eps_packed, bw_packed,
                               w_packed, *, T, n_layers, block, tile,
                               use_prng, mxu_dtype="bfloat16", compact=False):
    n_rows = c_packed.shape[0]
    grid = (n_rows // tile,)
    kernel = functools.partial(
        _fused_sample_pdf_sph_kernel, T=T, n_layers=n_layers, block=block,
        use_prng=use_prng, mxu_dtype=mxu_dtype, compact=compact,
    )
    rpo = (LANES // (LANES // block * _OUT_VALS)) if compact else 1
    tile_spec = pl.BlockSpec((tile, LANES), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        tile_spec,
    ]
    args = [seed, c_packed]
    if not use_prng:
        in_specs.append(tile_spec)
        args.append(eps_packed)
    in_specs += [
        pl.BlockSpec((2, LANES, LANES), lambda i: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((w_packed.shape[0], LANES, LANES), lambda i: (0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args += [bw_packed, w_packed]
    out_spec = (
        pl.BlockSpec((tile // rpo, LANES), lambda i: (i, 0),
                     memory_space=pltpu.VMEM)
        if compact
        else tile_spec
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_rows // rpo, LANES), jnp.float32),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        interpret=_INTERPRET,
    )(*args)


def prepack_spherical(v_params: List[dict], base_params: dict):
    """(w_packed, bw_packed, block, n_layers) for the spherical kernel
    (base W0 wired to the cond columns at the spherical offset 4)."""
    block = _block_size(v_params)
    return (
        pack_weights(v_params, block),
        _pack_base_weights(base_params, block, cond_off=4),
        block,
        len(v_params),
    )


def fused_sample_pdf_spherical_packed(
    packed,
    cond_enc: jnp.ndarray,
    seed,
    T: int,
    tile: int = 256,
    eps: jnp.ndarray | None = None,
    mxu_dtype: str = "bfloat16",
):
    """One-kernel spherical sample+pdf: (x, pdf, x0) for (N, 22) cond_enc.

    The whole of `network_sampling_spherical` (`mlp_brdf_sampling.py:
    106-140`) in one pallas_call: base heads, Gaussian theta + in-kernel
    Best-Fisher von Mises phi (Pallas PRNG), T-step transport with
    carried tangents, p0/det assembly. Pass `eps` (N, 2) =
    (standard normal, PRE-DRAWN von Mises phi) for the key-exact /
    interpret path (the Pallas PRNG is TPU-only)."""
    w_packed, bw_packed, block, n_layers = packed
    n = cond_enc.shape[0]
    pack = LANES // block
    n_pad = ((n + tile * pack - 1) // (tile * pack)) * (tile * pack)
    c_packed = _pack_rows(cond_enc.astype(jnp.float32), 4, block, n_pad)
    ones_col = jnp.zeros((n_pad, block), jnp.float32).at[:, block - 1].set(1.0)
    c_packed = c_packed + ones_col.reshape(n_pad // pack, LANES)
    use_prng = eps is None
    eps_packed = (
        jnp.zeros((n_pad // pack, LANES), jnp.float32)
        if use_prng
        else _pack_rows(eps.astype(jnp.float32), 0, block, n_pad)
    )
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1, 1)
    out = _fused_sample_pdf_sph_call(
        seed_arr, c_packed, eps_packed, bw_packed, w_packed,
        T=T, n_layers=n_layers, block=block, tile=tile, use_prng=use_prng,
        mxu_dtype=mxu_dtype, compact=True,
    )
    rows = out.reshape(-1, _OUT_VALS)[:n]
    return rows[:, 0:2], rows[:, 2], rows[:, 4:6]


def make_fused_sample_pdf_spherical(
    v_params: List[dict],
    base,
    base_params: dict,
    omega_i: jnp.ndarray,
    cond_enc: jnp.ndarray,
    T: int,
    tile: int = 256,
    mxu_dtype: str = "bfloat16",
):
    """Spherical-domain sample+pdf closure with a fixed wavefront: the
    base draw runs as a jitted XLA program, the transport in the fused
    kernel. SUPERSEDED for production by
    `fused_sample_pdf_spherical_packed`, which fuses the base draw
    in-kernel as well (r4); kept as the key-exact two-program variant for
    fixed-cond callers. Returns ``run(key) -> (x, pdf)``. Counterpart of
    `network_sampling_spherical` (`mlp_brdf_sampling.py:106-140`)."""
    transport = make_fused_transport(
        "spherical", v_params, cond_enc, T, tile=tile, mxu_dtype=mxu_dtype
    )

    @jax.jit
    def _draw(key):
        x0 = base.sample(base_params, omega_i, key)
        p0 = jnp.exp(base.log_prob(base_params, x0, omega_i))
        return x0, p0

    @jax.jit
    def _assemble(p0, det):
        return p0 / det

    def run(key: jax.Array):
        x0, p0 = _draw(key)
        x, det = transport(x0)
        return x, _assemble(p0, det)

    return run


# --------------------------------------------------- differentiable ----
#
# The tcnn-bindings analogue (`/root/reference/tiny-cuda-nn/bindings/torch/
# tinycudann/modules.py:120-160` ships fwd/bwd/double-bwd): the fused
# Pallas kernel runs the FORWARD transport at production speed, and the
# backward pass rematerializes the T-step transport through the XLA
# `jax.linearize` path and transposes it — reverse-over-forward autodiff,
# no saved per-step activations (HBM-free residuals, the jax.checkpoint
# trade SURVEY.md prescribes). Gradients flow to v_params, x0, AND
# cond_enc, so a pixel loss differentiates end-to-end into the velocity
# net (the BASELINE.md pixel-gradient north star).


def _xla_transport_with_det(domain, v_params, x0, cond_enc, T, reverse):
    """XLA twin of the fused transport: (x_out, det_prod). Used as the
    differentiation oracle in the custom_vjp backward (and directly
    differentiable itself)."""
    from bsdf_diffusion_sampling_tpu.ode.flow import _step_det, _velocity_and_jac

    h = 1.0 / T
    sign = -1.0 if reverse else 1.0
    x = x0
    det = jnp.ones(x0.shape[:-1], x0.dtype)
    for t in range(T):
        tt = float(t)
        alpha = (1.0 - tt * h) if reverse else (tt * h)
        v, j0, j1 = _velocity_and_jac(domain, v_params, x,
                                      jnp.asarray(alpha, x.dtype), cond_enc)
        det = det * _step_det(j0, j1, h, sign)
        x = x + sign * h * v
    return x, det


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 4, 5, 6, 7))
def fused_transport_diff(
    domain: str,
    v_params: List[dict],
    x0: jnp.ndarray,
    cond_enc: jnp.ndarray,
    T: int,
    reverse: bool = False,
    tile: int = 256,
    mxu_dtype: str = "bfloat16",
):
    """Differentiable fused transport: forward == `fused_ode_transport`
    (Pallas megakernel), backward == rematerialized XLA VJP. Returns
    (x_out, det_prod)."""
    return fused_ode_transport(domain, v_params, x0, cond_enc, T,
                               reverse=reverse, with_jac=True, tile=tile,
                               mxu_dtype=mxu_dtype)


def _fused_transport_diff_fwd(domain, v_params, x0, cond_enc, T, reverse,
                              tile, mxu_dtype):
    out = fused_ode_transport(domain, v_params, x0, cond_enc, T,
                              reverse=reverse, with_jac=True, tile=tile,
                              mxu_dtype=mxu_dtype)
    return out, (v_params, x0, cond_enc)


def _fused_transport_diff_bwd(domain, T, reverse, tile, mxu_dtype, res, g):
    v_params, x0, cond_enc = res
    _, vjp = jax.vjp(
        lambda p, x, c: _xla_transport_with_det(domain, p, x, c, T, reverse),
        v_params, x0, cond_enc,
    )
    return vjp(g)


fused_transport_diff.defvjp(_fused_transport_diff_fwd, _fused_transport_diff_bwd)
