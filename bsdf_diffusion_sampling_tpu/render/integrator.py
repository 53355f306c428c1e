"""Wavefront path tracer with next-event estimation + MIS.

TPU re-design of the reference's render loop: Mitsuba's megakernel path
integrator with an eagerly-called Python BSDF
(`/root/reference/rendering/brdf_measured_disk.py:133-164`, flags at
:21-22) becomes one jitted wavefront program — fixed-size ray batches,
per-bounce masked material dispatch (no queue compaction, SURVEY.md §7e),
film accumulation by segment-sum. Every bounce the WHOLE wavefront hits
the neural sampler in one batch: this is the "megakernel call" of the
reference (`brdf_measured_disk.py:66`), here a single XLA program.

MIS uses the power heuristic (`rendering/utils/mitsuba_helper.py:139-145`).
Light transport: NEE against the envmap + BSDF sampling with MIS on both;
Russian roulette after RR_DEPTH. Radiance clamping is the material's
firefly policy (neural.firefly_filter), not the integrator's.

The matball material is pluggable (`MatballFns`): ground-truth measured
RGL importance sampling, or the neural ODE sampler — both run through the
identical integrator, which makes neural-vs-GT image comparisons
apples-to-apples. Jit boundaries: scene arrays (BVH, envmap, camera
vectors) are pytree ARGUMENTS; film size, bounce count and the MatballFns
(a hashable tuple of functions — build it ONCE and reuse, every new
instance recompiles) are static.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from bsdf_diffusion_sampling_tpu.render.bvh import BVHArrays, Hit, intersect, occluded
from bsdf_diffusion_sampling_tpu.render.bvh8 import BVH8Arrays
from bsdf_diffusion_sampling_tpu.render.traverse8 import intersect8, occluded8
from bsdf_diffusion_sampling_tpu.render.camera import generate_rays
from bsdf_diffusion_sampling_tpu.render.envmap import EnvMap, eval_env, pdf_env, sample_env
from bsdf_diffusion_sampling_tpu.render.lambert import (
    checkerboard,
    cosine_sample,
    diffuse_eval,
    diffuse_pdf,
    make_frame,
    to_local,
    to_world,
)
from bsdf_diffusion_sampling_tpu.render.scene import MAT_BALL, MAT_PLANE, Scene

RR_DEPTH = 3
RR_MAX = 0.95
RAY_EPS = 1e-3
GRAY = 0.18  # `scene_measured.xml:46`


class MatballFns(NamedTuple):
    """Local-frame material callbacks for one preview object."""

    sample: Callable  # (key, wi_local) -> (wo_local, pdf)
    eval: Callable  # (wi_local, wo_local) -> (N, 3) f*cos
    pdf: Callable  # (wi_local, wo_local) -> (N,)
    weight_filter: Callable  # (rgb_weight) -> rgb_weight (firefly policy)
    transmissive: bool = False  # full-sphere BSDF (wo may go below surface)
    # optional fused (eval, pdf) at the same (wi, wo) — the NEE/MIS path
    # needs both and implementations can share the expensive half (the
    # measured BRDF's vndf invert). None -> separate eval + pdf calls.
    eval_pdf: Callable | None = None


def _as_tuple(matball) -> tuple:
    """Normalize to a tuple of MatballFns — ball slot i shades material id
    MAT_BALL + i (the 3x4 array scenes carry 12 distinct mybsdf hooks)."""
    return (matball,) if isinstance(matball, MatballFns) else tuple(matball)


def _ray_sort_key(rd, active):
    """Traversal-coherence sort key: direction octant for live rays, a
    sentinel for dead ones. Sorting the wavefront by this key before the
    packet kernel does two things (r5, from the r5 device trace where
    traversal was 75% of render time):

    - COMPACTION: dead rays (~80% of the wavefront by bounce 2) cluster
      into all-dead S x 128 packets, which the kernel skips at slot
      init — traversal cost scales with ALIVE rays, not wavefront size;
    - COHERENCE: rays sharing a direction octant visit far fewer distinct
      child blocks per packet, so t_best culling actually prunes.

    The key is cheap on purpose (3 comparisons); the argsort + gathers
    cost ~7 ms per traversal call at 131k rays, against 30-50 ms saved on
    divergent bounces. Results are un-permuted before returning, so
    callers (and the film) never see the sorted order."""
    ax, ay, az = jnp.abs(rd[:, 0]), jnp.abs(rd[:, 1]), jnp.abs(rd[:, 2])
    octant = (
        (rd[:, 0] > 0).astype(jnp.int32) * 4
        + (rd[:, 1] > 0).astype(jnp.int32) * 2
        + (rd[:, 2] > 0).astype(jnp.int32)
    )
    # refine within the octant by the dominant axis (a low-res cube-map
    # cell) and a grazing bit: each refinement measured another ~1-3% off
    # whole-chunk render time over octant-only keys, at zero extra sort
    # cost (the key stays a single small int)
    dom = jnp.where(ax >= jnp.maximum(ay, az), 0,
                    jnp.where(ay >= az, 1, 2))
    # one more refinement: is the larger minor axis at least half the
    # dominant one (grazing vs axis-aligned within the cell)
    mx = jnp.maximum(ax, jnp.maximum(ay, az))
    mid = ax + ay + az - mx - jnp.minimum(ax, jnp.minimum(ay, az))
    graze = (mid * 2 > mx).astype(jnp.int32)
    return jnp.where(active, (octant * 3 + dom) * 2 + graze, 48)


def _sort_perm(sort_key):
    perm = jnp.argsort(sort_key)
    inv = jnp.zeros_like(perm).at[perm].set(
        jnp.arange(perm.shape[0], dtype=perm.dtype)
    )
    return perm, inv


def _isect(accel, ro, rd, active, mesh=None, sort: bool = False):
    """Closest-hit dispatch: packet kernel for an 8-wide accel (TPU
    production path, render/traverse8.py), binary lockstep otherwise
    (CPU/oracle). Both return the same Hit contract.

    With a `mesh`, traversal runs under shard_map: each shard walks ITS
    rays against the replicated accel, so the traversal while_loop's
    stack scatters and termination test stay device-local. Left to GSPMD,
    the scatter indices were all-gathered and the loop condition
    all-reduced EVERY lockstep iteration (found by benchmarks/scaling.py's
    collective audit) — per-iteration cross-chip traffic in what should
    be an embarrassingly parallel loop. Traversal draws no randomness, so
    sharded results stay bit-equal to single-device
    (tests/test_render_sharded.py).

    The packet kernel runs under shard_map too (r5, VERDICT r4 weak #3:
    the mesh branch used to drop to the ~80x-slower binary lockstep
    traversal — multi-chip renders never met the production kernel).
    Each shard launches its own pallas_call on its local rays; the
    per-shard `truncated` safety flag is dropped (reducing it across
    shards would add the very per-bounce collective the sharded design
    exists to avoid; the single-chip path still carries it)."""
    if mesh is not None:
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        spec = P(mesh.axis_names[0])

        def local(a, ro_, rd_, act):
            # sorting is shard-local: per-ray traversal is exact, so the
            # permutation is invisible outside and needs no collectives
            if sort:
                perm, inv = _sort_perm(_ray_sort_key(rd_, act))
                ro_, rd_, act = ro_[perm], rd_[perm], act[perm]
            if isinstance(a, BVH8Arrays):
                h = intersect8(a, ro_, rd_, active=act)
            else:
                h = intersect(a, ro_, rd_, active=act)
            if sort:
                return h.t[inv], h.prim[inv], h.u[inv], h.v[inv]
            return h.t, h.prim, h.u, h.v

        t, prim, u, v = shard_map(
            local, mesh=mesh, in_specs=(P(), spec, spec, spec),
            out_specs=spec, check_vma=False,
        )(accel, ro, rd, active)
        return Hit(t, prim, u, v, False)
    if sort and isinstance(accel, BVH8Arrays):
        perm, inv = _sort_perm(_ray_sort_key(rd, active))
        h = intersect8(accel, ro[perm], rd[perm], active=active[perm])
        return Hit(h.t[inv], h.prim[inv], h.u[inv], h.v[inv], h.truncated)
    if isinstance(accel, BVH8Arrays):
        return intersect8(accel, ro, rd, active=active)
    return intersect(accel, ro, rd, active=active)


def _occl(accel, ro, rd, t_max, active, mesh=None, sort: bool = False):
    if mesh is not None:
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        spec = P(mesh.axis_names[0])

        def local(a, ro_, rd_, tm, act):
            if sort:
                perm, inv = _sort_perm(_ray_sort_key(rd_, act))
                ro_, rd_, tm, act = ro_[perm], rd_[perm], tm[perm], act[perm]
            if isinstance(a, BVH8Arrays):
                occ = occluded8(a, ro_, rd_, tm, active=act)
            else:
                occ = occluded(a, ro_, rd_, tm, active=act)
            return occ[inv] if sort else occ

        return shard_map(
            local, mesh=mesh, in_specs=(P(), spec, spec, spec, spec),
            out_specs=spec, check_vma=False,
        )(accel, ro, rd, t_max, active)
    if sort and isinstance(accel, BVH8Arrays):
        perm, inv = _sort_perm(_ray_sort_key(rd, active))
        occ = occluded8(accel, ro[perm], rd[perm], t_max[perm],
                        active=active[perm])
        return occ[inv]
    if isinstance(accel, BVH8Arrays):
        return occluded8(accel, ro, rd, t_max, active=active)
    return occluded(accel, ro, rd, t_max, active=active)


def mis_weight(pdf_a: jnp.ndarray, pdf_b: jnp.ndarray) -> jnp.ndarray:
    """Power heuristic beta=2 (`mitsuba_helper.py:139-145`)."""
    a2 = pdf_a * pdf_a
    w = a2 / jnp.maximum(a2 + pdf_b * pdf_b, 1e-20)
    return jnp.where(pdf_a > 0, w, 0.0)


def _albedo(mat_id, uv):
    plane = checkerboard(uv)
    gray = jnp.full_like(plane, GRAY)
    return jnp.where((mat_id == MAT_PLANE)[..., None], plane, gray)


# Multi-matball dispatch is masked evaluation: every ball's callbacks run
# on the whole wavefront and rows select their own material — the
# XLA-friendly alternative to queue compaction (SURVEY.md §7e). Cost is
# n_balls x the ball shading; acceptable for <= 12 balls per scene and
# trivially correct. (A future packing could route per-row weights into one
# fused kernel instead.)


def _shade_eval(matballs: tuple, mat_id, uv, wi_l, wo_l):
    """f*cos for all materials, masked by mat_id."""
    out = diffuse_eval(_albedo(mat_id, uv), wo_l)
    for i, mb in enumerate(matballs):
        ball = mb.eval(wi_l, wo_l)
        out = jnp.where((mat_id == MAT_BALL + i)[..., None], ball, out)
    return out


def _shade_eval_pdf(matballs: tuple, mat_id, uv, wi_l, wo_l):
    """(f*cos, pdf) for all materials, sharing work where the material
    provides a fused eval_pdf."""
    f = diffuse_eval(_albedo(mat_id, uv), wo_l)
    pdf = diffuse_pdf(wo_l)
    for i, mb in enumerate(matballs):
        if mb.eval_pdf is not None:
            fb, pb = mb.eval_pdf(wi_l, wo_l)
        else:
            fb, pb = mb.eval(wi_l, wo_l), mb.pdf(wi_l, wo_l)
        is_b = mat_id == MAT_BALL + i
        f = jnp.where(is_b[..., None], fb, f)
        pdf = jnp.where(is_b, pb, pdf)
    return f, pdf


def _shade_pdf(matballs: tuple, mat_id, wi_l, wo_l):
    out = diffuse_pdf(wo_l)
    for i, mb in enumerate(matballs):
        out = jnp.where(mat_id == MAT_BALL + i, mb.pdf(wi_l, wo_l), out)
    return out


def _shade_sample(matballs: tuple, key, mat_id, wi_l):
    keys = jax.random.split(key, 1 + len(matballs))
    wo, pdf = cosine_sample(keys[0], wi_l.shape[:-1])
    for i, mb in enumerate(matballs):
        wo_b, pdf_b = mb.sample(keys[1 + i], wi_l)
        is_b = mat_id == MAT_BALL + i
        wo = jnp.where(is_b[..., None], wo_b, wo)
        pdf = jnp.where(is_b, pdf_b, pdf)
    return wo, pdf


def _transmissive_mask(matballs: tuple, mat_id):
    m = jnp.zeros(mat_id.shape, bool)
    for i, mb in enumerate(matballs):
        if mb.transmissive:
            m = m | (mat_id == MAT_BALL + i)
    return m


def _ball_filter(matballs: tuple, mat_id, w_rgb):
    out = w_rgb
    for i, mb in enumerate(matballs):
        out = jnp.where((mat_id == MAT_BALL + i)[..., None],
                        mb.weight_filter(w_rgb), out)
    return out


def _bounce_body(
    bvh: BVHArrays,
    env: EnvMap,
    lights: jnp.ndarray,  # (P, 6) point lights: position, intensity
    state,
    key: jax.Array,
    depth,
    *,
    matball: tuple,
    mesh=None,
):
    """ONE path-tracing bounce for the whole wavefront — the per-bounce
    "megakernel call" of the reference (`brdf_measured_disk.py:66`), as a
    single reusable XLA program. `depth` is a traced scalar (it only
    gates MIS-on-env and Russian roulette), so every bounce of every
    pass/tile reuses one compiled executable.

    Split per-bounce rather than unrolling max_depth bounces into one
    program: the dev backend's worker dies once a single program's
    rays x bounces work crosses ~2*10^5 (bisected in round 1), and an
    unrolled program recompiles per max_depth. Note the production neural
    path (make_neural_bsdf fused=True on TPU) DOES trace fused Pallas
    pallas_calls inside this jit — one sample + one pdf kernel per matball
    — which Mosaic compiles fine at this size (measured round 2/3); only
    a fully unrolled multi-bounce megaprogram blew up compile times.
    """
    matballs = matball
    ro, rd, px, L, beta, alive, prev_pdf = state
    n = ro.shape[0]
    k_nee, k_bsdf, k_rr = jax.random.split(jax.random.fold_in(key, depth), 3)

    hit = _isect(bvh, ro, rd, alive, mesh, sort=True)
    miss = hit.t >= 1e29

    # escaped rays collect the envmap, MIS-weighted against the
    # previous bounce's BSDF pdf
    le = eval_env(env, rd)
    w_env = jnp.where(prev_pdf > 0, mis_weight(prev_pdf, pdf_env(env, rd)), 1.0)
    L = L + beta * le * (w_env * (alive & miss))[..., None]
    alive = alive & ~miss

    # surface interaction
    prim = hit.prim
    u, v = hit.u, hit.v
    w0 = 1.0 - u - v
    if getattr(bvh, "attr_rows", None) is not None:
        # one packed row gather serves normals, uvs, and material id
        a = bvh.attr_rows[prim]  # (n, 16)
        n_sh = (
            w0[:, None] * a[:, 0:3] + u[:, None] * a[:, 3:6]
            + v[:, None] * a[:, 6:9]
        )
        uv = (
            w0[:, None] * a[:, 9:11] + u[:, None] * a[:, 11:13]
            + v[:, None] * a[:, 13:15]
        )
        mat_id = a[:, 15].astype(jnp.int32)
    else:
        n_sh = (
            w0[:, None] * bvh.n0[prim]
            + u[:, None] * bvh.n1[prim]
            + v[:, None] * bvh.n2[prim]
        )
        uv = (
            w0[:, None] * bvh.uv0[prim]
            + u[:, None] * bvh.uv1[prim]
            + v[:, None] * bvh.uv2[prim]
        )
        mat_id = bvh.material_id[prim]
    n_sh = n_sh / jnp.maximum(jnp.linalg.norm(n_sh, axis=-1, keepdims=True), 1e-12)
    p_hit = ro + rd * hit.t[:, None]
    t, bt = make_frame(n_sh)
    wi_l = to_local(n_sh, t, bt, -rd)
    alive = alive & (wi_l[..., 2] > 0)

    trans_mask = _transmissive_mask(matballs, mat_id)

    # ---- NEE against the envmap: sample, shadow-test, MIS
    u_nee = jax.random.uniform(k_nee, (n, 2))
    d_env, le_nee, pdf_e = sample_env(env, u_nee)
    wo_nee_l = to_local(n_sh, t, bt, d_env)
    f_nee, pdf_b_at_nee = _shade_eval_pdf(matballs, mat_id, uv, wi_l,
                                          wo_nee_l)
    shadow_o = p_hit + n_sh * jnp.where(
        wo_nee_l[..., 2] >= 0, RAY_EPS, -RAY_EPS
    )[..., None]
    nee_cand = alive & (pdf_e > 1e-9) & ((wo_nee_l[..., 2] > 0) | trans_mask)
    occ = _occl(bvh, shadow_o, d_env, jnp.full((n,), 1e6), nee_cand, mesh,
                sort=True)
    nee_ok = nee_cand & ~occ
    contrib = beta * f_nee * (le_nee / jnp.maximum(pdf_e, 1e-9)[..., None])
    contrib = contrib * mis_weight(pdf_e, pdf_b_at_nee)[..., None]
    L = L + jnp.where(nee_ok[..., None], contrib, 0.0)

    # ---- NEE against point lights (delta emitters: deterministic
    # direction, no MIS — BSDF sampling can never hit them;
    # `disney_bsdf_array0_pointlight.xml:384-387`). Static unrolled loop
    # over the scene's (few) lights.
    for li in range(lights.shape[0]):
        lp, inten = lights[li, :3], lights[li, 3:]
        dvec = lp[None, :] - p_hit
        dist = jnp.maximum(jnp.linalg.norm(dvec, axis=-1), 1e-6)
        d_l = dvec / dist[..., None]
        wo_light_l = to_local(n_sh, t, bt, d_l)
        f_l = _shade_eval(matballs, mat_id, uv, wi_l, wo_light_l)
        sh_o = p_hit + n_sh * jnp.where(
            wo_light_l[..., 2] >= 0, RAY_EPS, -RAY_EPS
        )[..., None]
        cand = alive & ((wo_light_l[..., 2] > 0) | trans_mask)
        occ_l = _occl(bvh, sh_o, d_l, dist - 2 * RAY_EPS, cand, mesh,
                      sort=True)
        lvis = cand & ~occ_l
        contrib_l = beta * f_l * (inten[None, :] / (dist * dist)[..., None])
        L = L + jnp.where(lvis[..., None], contrib_l, 0.0)

    # ---- BSDF sampling
    wo_l, pdf_b = _shade_sample(matballs, k_bsdf, mat_id, wi_l)
    # f AND the MIS-proxy pdf at the sampled direction in one fused call.
    # pdf_b (the sampler's own pdf) stays the DIVISOR — that is what
    # unbiasedness requires — but the MIS weights on both techniques use
    # the material's eval_pdf pdf instead (for neural matballs that is the
    # MEASURED pdf the sampler was trained to match). MIS stays unbiased
    # for ANY weight pair summing to 1 per direction, and a proxy shared
    # by the NEE weight (pdf_b_at_nee above) and the env-hit weight
    # (prev_pdf below) does sum to 1. This kills the firefly tail the
    # imported spherical checkpoint's neural pdf fed into MIS (VERDICT r4
    # weak #5): an overestimated tail pdf made escaping rays claim full
    # MIS weight on bright env texels that NEE had already accounted for.
    # The reference instead papers over the tail by zeroing high-weight
    # samples (`brdf_measured_spherical.py:105-107`) — kept here too as
    # the material's firefly policy.
    f_b, pdf_mis = _shade_eval_pdf(matballs, mat_id, uv, wi_l, wo_l)
    is_ball = mat_id >= MAT_BALL
    wo_up_ok = (wo_l[..., 2] > 0) | trans_mask
    ok = alive & (pdf_b > 1e-9) & wo_up_ok
    w_rgb = f_b / jnp.maximum(pdf_b, 1e-9)[..., None]
    w_rgb = jnp.where(is_ball[..., None], _ball_filter(matballs, mat_id, w_rgb),
                      w_rgb)
    beta = jnp.where(ok[..., None], beta * w_rgb, beta)
    alive = alive & ok & (jnp.max(w_rgb, axis=-1) > 0)

    rd = to_world(n_sh, t, bt, wo_l)
    ro = p_hit + n_sh * jnp.where(wo_l[..., 2] >= 0, RAY_EPS, -RAY_EPS)[..., None]
    prev_pdf = jnp.where(alive, pdf_mis, 0.0)

    # ---- Russian roulette (no-op while depth < RR_DEPTH)
    q = jnp.where(
        depth >= RR_DEPTH, jnp.minimum(jnp.max(beta, axis=-1), RR_MAX), 1.0
    )
    live = jax.random.uniform(k_rr, (n,)) < q
    beta = beta / jnp.maximum(q, 1e-9)[..., None]
    alive = alive & live

    return ro, rd, px, L, beta, alive, prev_pdf


# standalone per-bounce entry (probes, the collective audit, and tests
# time/lower ONE bounce); the production render fuses bounces via
# lax.scan in _pass_program instead — see render_pass
_bounce_program = partial(jax.jit, static_argnames=("matball", "mesh"))(
    _bounce_body
)


@partial(
    jax.jit,
    static_argnames=("width", "height", "spp_chunk", "rows"),
)
def _init_wavefront(cam_vectors, key, row0, *, width, height, spp_chunk, rows):
    k_cam, k_path = jax.random.split(key)
    ro, rd, px = generate_rays(cam_vectors, width, height, k_cam, spp_chunk,
                               row0=row0, rows=rows)
    n = ro.shape[0]
    state = (
        ro, rd, px,
        jnp.zeros((n, 3)),
        jnp.ones((n, 3)),
        jnp.ones((n,), bool),
        jnp.zeros((n,)),  # 0 => delta/camera ray: no MIS on env hit
    )
    return state, k_path


@partial(jax.jit, static_argnames=("width", "height", "spp_chunk", "rows"))
def _finish_pass(L, row0, *, width, height, spp_chunk, rows):
    """Film accumulation WITHOUT a scatter: generate_rays lays samples out
    sample-major (`px = tile(arange(rows*w), spp) + row0*w`), so the
    segment-sum is a reshape + axis-sum + one dynamic_update_slice into
    the film. The general scatter (`camera.accumulate_film`) measured
    ~55 ms per 131k-ray pass on v5e — a fifth of the whole pass — while
    this layout-aware form is ~2 ms; TPU scatters serialize, static
    layouts don't (r5). Every sample counts toward cnt (filter importance
    sampling splats weight 1), so cnt is spp_chunk over the tile rows."""
    row0 = jnp.asarray(row0, jnp.int32)
    tile = L.reshape(spp_chunk, rows * width, 3).sum(0).reshape(rows, width, 3)
    img = jax.lax.dynamic_update_slice(
        jnp.zeros((height, width, 3), L.dtype), tile, (row0, 0, 0)
    )
    cnt = jax.lax.dynamic_update_slice(
        jnp.zeros((height, width), jnp.float32),
        jnp.full((rows, width), float(spp_chunk), jnp.float32),
        (row0, 0),
    )
    return img, cnt


@partial(
    jax.jit,
    static_argnames=("matball", "width", "height", "spp_chunk", "rows",
                     "max_depth", "mesh"),
)
def _pass_program(
    bvh,
    env,
    lights,
    cam_vectors,
    keys,  # (C,) pass keys
    row0s,  # (C,) int32 tile starts
    *,
    matball: tuple,
    width: int,
    height: int,
    spp_chunk: int,
    rows: int,
    max_depth: int,
    mesh=None,
):
    """C whole accumulation units (ray-gen + max_depth bounces + film) in
    ONE jitted program: an outer lax.scan over (key, row0) units carrying
    the film sum, an inner lax.scan over bounce depth (depth was already a
    traced scalar, so the scanned bounce body compiles once).

    This exists because the tunneled backend charges ~25-30 ms of
    turnaround per jitted call: the r4 renderer made 7 calls per pass
    (init + 4 bounces + finish + add), paying ~200 ms/pass of pure
    dispatch — measured via a max_depth=0 render that still cost
    129 ms/pass (r5). One fused program per C units makes the overhead
    ~30 ms / C. The per-bounce `_bounce_program` entry remains for probes
    and the collective audit; it runs the same `_bounce_body`.
    """
    shard = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        shard = NamedSharding(mesh, P(mesh.axis_names[0]))

    def unit(film, unit_in):
        key, row0 = unit_in
        k_cam, k_path = jax.random.split(key)
        ro, rd, px = generate_rays(cam_vectors, width, height, k_cam,
                                   spp_chunk, row0=row0, rows=rows)
        n = ro.shape[0]
        state = (
            ro, rd, px,
            jnp.zeros((n, 3)),
            jnp.ones((n, 3)),
            jnp.ones((n,), bool),
            jnp.zeros((n,)),
        )
        if shard is not None:
            state = tuple(
                jax.lax.with_sharding_constraint(x, shard) for x in state
            )

        def body(st, depth):
            return _bounce_body(bvh, env, lights, st, k_path, depth,
                                matball=matball, mesh=mesh), None

        state, _ = jax.lax.scan(body, state, jnp.arange(max_depth))
        img, cnt = _finish_pass(state[3], row0, width=width, height=height,
                                spp_chunk=spp_chunk, rows=rows)
        return (film[0] + img, film[1] + cnt), None

    film0 = (
        jnp.zeros((height, width, 3), jnp.float32),
        jnp.zeros((height, width), jnp.float32),
    )
    film, _ = jax.lax.scan(unit, film0, (keys, row0s))
    return film


def render_pass(
    bvh: BVHArrays,
    env: EnvMap,
    cam_vectors: jnp.ndarray,
    key: jax.Array,
    *,
    matball,
    width: int,
    height: int,
    spp_chunk: int = 4,
    max_depth: int = 12,
    mesh=None,
    row0: int = 0,
    rows: int | None = None,
    lights: jnp.ndarray | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One accumulation pass (`mi.render(scene, spp=4, seed=i)` equivalent,
    `brdf_measured_disk.py:151-155`): ray gen + max_depth bounce programs
    + film segment-sum. Returns (film_sum, sample_count).

    `matball` is one MatballFns or a tuple of them (ball slot i shades
    material id MAT_BALL + i — the array scenes carry 12).

    With a `mesh`, the ray wavefront is sharded over its "data" axis —
    scene arrays replicate (the matpreview scene is MBs), every bounce's
    traversal/shading runs on local shards, and only the film segment-sum
    crosses chips (the SURVEY §2.3 ray-sharding design). The wavefront
    size W*rows*spp_chunk must divide by the mesh size.
    """
    matball = _as_tuple(matball)
    if lights is None:
        lights = jnp.zeros((0, 6), jnp.float32)
    rows = height - row0 if rows is None else rows
    state, k_path = _init_wavefront(cam_vectors, key, row0, width=width,
                                    height=height, spp_chunk=spp_chunk,
                                    rows=rows)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        shard = NamedSharding(mesh, P(mesh.axis_names[0]))
        state = tuple(jax.device_put(x, shard) for x in state)

    for depth in range(max_depth):
        state = _bounce_program(bvh, env, lights, state, k_path, depth,
                                matball=matball, mesh=mesh)
    return _finish_pass(state[3], row0, width=width, height=height,
                        spp_chunk=spp_chunk, rows=rows)


def render(
    scene: Scene,
    matball,
    seed: int = 0,
    spp: int = 512,
    spp_chunk: int = 4,
    max_depth: int = 12,
    mesh=None,
    max_rays_per_pass: int | None = None,
    chunk_units: int = 8,
):
    """Full multi-pass render (the 128x accumulation loop of
    `brdf_measured_disk.py:146-163`). Returns (H, W, 3) numpy image.

    `max_rays_per_pass` bounds the wavefront of a single pass by splitting
    the film into horizontal row tiles — a peak-memory control and a
    stability requirement on the tunneled dev TPU (worker dies when one
    program's rays x bounces crosses ~2*10^5; with per-bounce programs the
    constraint is per-bounce ray count). Defaults to 2^16 on TPU,
    unbounded elsewhere.
    """
    import numpy as np

    w, h = scene.camera.width, scene.camera.height
    if max_rays_per_pass is None and jax.default_backend() == "tpu":
        max_rays_per_pass = 1 << 17  # +7% over 2^16 (r04); stable with
        # the packet traversal kernel (the r03 2^16 cap guarded the
        # binary-traversal worker crashes, gone with that code path)
    if max_rays_per_pass is not None:
        rows_per_tile = max(1, max_rays_per_pass // (w * spp_chunk))
    else:
        rows_per_tile = h
    if mesh is not None and rows_per_tile < h:
        # every tile's wavefront w*rows*spp_chunk must divide the mesh size
        # — including the remainder tile, so rows_per_tile must divide h
        n_dev = mesh.devices.size
        rpt = min(rows_per_tile, h)
        while rpt > 1 and (h % rpt != 0 or (w * rpt * spp_chunk) % n_dev != 0):
            rpt -= 1
        if (w * rpt * spp_chunk) % n_dev != 0:
            raise ValueError(
                f"cannot tile {w}x{h}@{spp_chunk}spp into mesh-divisible "
                f"wavefronts (mesh size {n_dev})"
            )
        rows_per_tile = rpt
    row_tiles = [
        (r0, min(rows_per_tile, h - r0)) for r0 in range(0, h, rows_per_tile)
    ]

    passes = max(spp // spp_chunk, 1)
    img_sum = None
    cnt_sum = None
    key = jax.random.key(seed)
    cam_vecs = scene.camera.vectors
    # production accel: the packet-traversal kernel needs a TPU (Pallas
    # DMA kernel) and an 8-wide table; the binary XLA path is the CPU
    # fallback and the parity oracle. Sharded renders use the packet
    # kernel too — one pallas_call per shard under shard_map (r5; the
    # interpret flag lets CPU-mesh tests exercise the same dispatch).
    from bsdf_diffusion_sampling_tpu.render import traverse8 as _t8

    accel = (
        scene.bvh8
        if scene.bvh8 is not None
        and (jax.default_backend() == "tpu" or _t8._INTERPRET)
        else scene.bvh
    )
    add = jax.jit(lambda a, b: (a[0] + b[0], a[1] + b[1]))
    matball = _as_tuple(matball)
    # one (key, row0) unit per accumulation pass per row tile; units with
    # equal `rows` batch into _pass_program chunks of `chunk_units` so the
    # tunneled backend's ~30 ms per-call turnaround amortizes (module
    # docstring of _pass_program). Chunks stay O(seconds) of device work.
    keys = jax.random.split(key, passes * len(row_tiles))
    units: dict[int, list] = {}
    ki = 0
    for i in range(passes):
        for (row0, rows) in row_tiles:
            units.setdefault(rows, []).append((ki, row0))
            ki += 1
    for rows, unit_list in units.items():
        for c0 in range(0, len(unit_list), chunk_units):
            chunk = unit_list[c0:c0 + chunk_units]
            k_idx = np.asarray([k for k, _ in chunk], np.int32)
            row0s = jnp.asarray([r for _, r in chunk], jnp.int32)
            img, cnt = _pass_program(
                accel, scene.envmap, scene.lights, cam_vecs,
                keys[k_idx], row0s,
                matball=matball, width=w, height=h, spp_chunk=spp_chunk,
                rows=rows, max_depth=max_depth, mesh=mesh,
            )
            if img_sum is None:
                img_sum, cnt_sum = img, cnt
            else:
                img_sum, cnt_sum = add((img_sum, cnt_sum), (img, cnt))
    return np.asarray(img_sum / jnp.maximum(cnt_sum, 1.0)[..., None])


def measured_matball(brdf, firefly_clamp: float = 30.0) -> MatballFns:
    """Ground-truth matball: the RGL measured BRDF importance-samples
    itself — the renderer's golden-image mode (stands in for the Mitsuba
    `measured` plugin renders the paper compares against)."""
    from bsdf_diffusion_sampling_tpu.bsdf.measured import (
        eval_brdf,
        eval_pdf_brdf,
        pdf_brdf,
        sample_brdf,
    )

    def sample(key, wi_l):
        u = jax.random.uniform(key, wi_l.shape[:-1] + (2,), minval=1e-6,
                               maxval=1.0 - 1e-6)
        return sample_brdf(brdf, u, wi_l)

    def clamp(w_rgb):
        lum = 0.2126 * w_rgb[..., 0] + 0.7152 * w_rgb[..., 1] + 0.0722 * w_rgb[..., 2]
        return jnp.where((lum < firefly_clamp)[..., None], w_rgb, 0.0)

    return MatballFns(
        sample=sample,
        eval=lambda wi, wo: eval_brdf(brdf, wi, wo),
        pdf=lambda wi, wo: pdf_brdf(brdf, wi, wo),
        weight_filter=clamp,
        eval_pdf=lambda wi, wo: eval_pdf_brdf(brdf, wi, wo),
    )


def neural_matball(nb) -> MatballFns:
    """Neural matball: ODE sample/pdf, measured eval — the reference's
    MyBSDF wiring (`brdf_measured_disk.py:59-124`).

    eval_pdf is the MEASURED fused (f, pdf): the integrator divides the
    sample weight by the neural sampler's own pdf (unbiasedness) but
    weights MIS with this measured proxy on both techniques — see the
    MIS note in `_bounce_body`. It also shares the vndf invert between f
    and pdf, so the NEE branch does less work than separate calls."""
    from bsdf_diffusion_sampling_tpu.bsdf.measured import eval_pdf_brdf
    from bsdf_diffusion_sampling_tpu.render.neural import (
        firefly_filter,
        neural_eval,
        neural_pdf,
        neural_sample,
    )

    return MatballFns(
        sample=lambda key, wi: neural_sample(nb, key, wi),
        eval=lambda wi, wo: neural_eval(nb, wi, wo),
        pdf=lambda wi, wo: neural_pdf(nb, wi, wo),
        weight_filter=lambda w: firefly_filter(nb, w),
        eval_pdf=lambda wi, wo: eval_pdf_brdf(nb.brdf, wi, wo),
    )


def principled_matball(mat, albedo=(1.0, 1.0, 1.0),
                       firefly_clamp: float = 3.5) -> MatballFns:
    """Ground-truth full-sphere matball: analytic principled/dielectric
    eval x albedo tint (`bsdf_myresult.py:44-46,96-97`), sampled with a
    two-sided cosine mixture (upper + lower hemisphere when the material
    transmits) — correct-by-MIS reference mode for scene_bsdf.xml."""
    from bsdf_diffusion_sampling_tpu.bsdf.materials import eval_material
    from bsdf_diffusion_sampling_tpu.bsdf.principled import PrincipledParams
    from bsdf_diffusion_sampling_tpu.render.lambert import cosine_sample

    albedo_v = jnp.asarray(albedo, jnp.float32)
    transmits = (not isinstance(mat, PrincipledParams)) or mat.spec_trans > 0
    p_up = 0.5  # upper-hemisphere probability of the two-sided mixture

    def _eval(wi, wo):
        f = eval_material(mat, wi, wo)
        if f.ndim == wi.ndim - 1:  # scalar materials broadcast to rgb
            f = f[..., None] * jnp.ones((3,), jnp.float32)
        return f * albedo_v

    def sample(key, wi):
        k1, k2 = jax.random.split(key)
        wo, pdf = cosine_sample(k1, wi.shape[:-1])
        if transmits:
            go_down = jax.random.uniform(k2, wi.shape[:-1]) > p_up
            wo = jnp.where(go_down[..., None], wo * jnp.array([1.0, 1.0, -1.0]), wo)
            pdf = jnp.abs(wo[..., 2]) / jnp.pi * 0.5  # 50/50 mirrored cosine
        return wo, pdf

    def pdf(wi, wo):
        base = jnp.abs(wo[..., 2]) / jnp.pi
        if transmits:
            return base * 0.5
        return jnp.where(wo[..., 2] > 0, base, 0.0)

    def clamp(w_rgb):
        lum = 0.2126 * w_rgb[..., 0] + 0.7152 * w_rgb[..., 1] + 0.0722 * w_rgb[..., 2]
        return jnp.where((lum < firefly_clamp)[..., None], w_rgb, 0.0)

    return MatballFns(sample=sample, eval=_eval, pdf=pdf, weight_filter=clamp,
                      transmissive=transmits)


def neural_matball_sphere(nb, mat, albedo=(1.0, 1.0, 1.0)) -> MatballFns:
    """Full-sphere neural matball: neural spherical sample/pdf + analytic
    principled eval x albedo (`bsdf_myresult.py:41-139`)."""
    from bsdf_diffusion_sampling_tpu.bsdf.materials import eval_material
    from bsdf_diffusion_sampling_tpu.render.neural import (
        firefly_filter,
        neural_pdf,
        neural_sample,
    )

    albedo_v = jnp.asarray(albedo, jnp.float32)

    def _eval(wi, wo):
        f = eval_material(mat, wi, wo)
        if f.ndim == wi.ndim - 1:
            f = f[..., None] * jnp.ones((3,), jnp.float32)
        return f * albedo_v

    return MatballFns(
        sample=lambda key, wi: neural_sample(nb, key, wi),
        eval=_eval,
        pdf=lambda wi, wo: neural_pdf(nb, wi, wo),
        weight_filter=lambda w: firefly_filter(nb, w),
        transmissive=True,
    )
