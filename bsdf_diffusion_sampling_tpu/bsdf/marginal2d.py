"""Conditional piecewise-bilinear 2D warp: eval / sample / invert.

The building block of the Dupuy-Jakob measured-BSDF parameterization —
the role Mitsuba's `Marginal2D<D>` warps play inside its `measured` plugin,
which the reference drives through `mi.load_dict({'type': 'measured', ...})`
(`/root/reference/learning_repo_cleanup/utils/mitsuba_brdf_scalar.py:75-89`).

A distribution over the unit square is stored as vertex values of a
bilinear interpolant on an (H, W) grid, one grid per conditioning-parameter
slice (the 8 theta_i incidence angles of an RGL file). Sampling draws the
y (row) coordinate from the marginal distribution, then x from the
conditional row density; `invert` is the exact inverse map (needed by
pdf/eval queries: given a half-vector, recover the unit-square sample the
luminance/rgb tables are indexed by). CDFs are linear in the density, so
linear interpolation of per-slice CDF tables across theta_i equals the CDF
of the interpolated density — slices are blended with one weight, exactly
like Mitsuba's param_weight machinery.

TPU shape discipline: per-sample CDF rows are never materialized; cell
lookups are log2(N)-step binary searches over gathered scalars, so a 1M-ray
wavefront costs O(N log W) gathers instead of O(N·W) memory.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Tuple

import jax.numpy as jnp
import numpy as np


class Warp2D(NamedTuple):
    """Per-parameter-slice normalized bilinear densities + CDF tables.

    density:  (P, H, W) vertex densities, trapezoid-integrating to 1
    cond_cdf: (P, H, W) cumulative trapezoid along x (cond_cdf[..., 0] = 0)
    marg_cdf: (P, H)    cumulative trapezoid along y of row integrals
    params:   (P,)      conditioning values (theta_i), increasing

    Anisotropic files condition on BOTH (phi_i, theta_i): `params_phi`
    (Pp,) is then the phi_i grid and the slice axis is flattened
    phi-major (P == Pp * Pt, slice p = pf * Pt + tf); slice blending is
    bilinear over the 4 bracketing (phi, theta) slices. params_phi with a
    single entry (the isotropic case) keeps the 2-slice linear blend.
    """

    density: jnp.ndarray
    cond_cdf: jnp.ndarray
    marg_cdf: jnp.ndarray
    params: jnp.ndarray
    params_phi: jnp.ndarray | None = None
    # k/k+1 row PAIRS packed side by side, (P, H, 2W), built only when
    # 2W <= 128 lanes (the luminance/rgb-resolution warps; vndf rows are
    # already a full 128-lane row so packing buys nothing): TPU gathers
    # are row-count bound, so one 2W gather replaces the two adjacent-row
    # gathers every (slice, k) blend performs — same trick as the r4
    # envmap texel-pair packing.
    density_pairs: jnp.ndarray | None = None
    cond_cdf_pairs: jnp.ndarray | None = None

    @property
    def res(self) -> Tuple[int, int]:
        return self.density.shape[-2], self.density.shape[-1]


def build_warp2d(grids: np.ndarray, params: np.ndarray) -> Warp2D:
    """grids: (P, H, W) nonnegative vertex values; params: (P,) increasing."""
    g = np.asarray(grids, np.float64)
    g = np.maximum(g, 0.0)
    P, H, W = g.shape
    dx, dy = 1.0 / (W - 1), 1.0 / (H - 1)
    # trapezoid along x: row integrals and cumulative
    seg_x = 0.5 * (g[..., :-1] + g[..., 1:]) * dx  # (P, H, W-1)
    cond = np.concatenate([np.zeros((P, H, 1)), np.cumsum(seg_x, axis=-1)], axis=-1)
    row_int = cond[..., -1]  # (P, H)
    seg_y = 0.5 * (row_int[:, :-1] + row_int[:, 1:]) * dy
    marg = np.concatenate([np.zeros((P, 1)), np.cumsum(seg_y, axis=-1)], axis=-1)
    total = marg[:, -1:]  # (P, 1)
    total = np.maximum(total, 1e-30)
    dens_n = g / total[..., None]
    cond_n = cond / total[..., None]

    def pairs(tab):
        if 2 * W > 128:
            return None
        nxt = np.concatenate([tab[:, 1:], tab[:, -1:]], axis=1)
        return jnp.asarray(np.concatenate([tab, nxt], axis=-1), jnp.float32)

    return Warp2D(
        density=jnp.asarray(dens_n, jnp.float32),
        cond_cdf=jnp.asarray(cond_n, jnp.float32),
        marg_cdf=jnp.asarray(marg / total, jnp.float32),
        params=jnp.asarray(params, jnp.float32),
        density_pairs=pairs(dens_n),
        cond_cdf_pairs=pairs(cond_n),
    )


def build_warp2d_aniso(grids: np.ndarray, theta: np.ndarray,
                       phi: np.ndarray) -> Warp2D:
    """grids: (Pp, Pt, H, W) vertex values conditioned on (phi_i, theta_i).
    Slices flatten phi-major; blending is bilinear over the 4 bracketing
    (phi, theta) slices (Mitsuba Marginal2D<2> param_weight semantics)."""
    Pp, Pt, H, W = grids.shape
    flat = build_warp2d(np.asarray(grids).reshape(Pp * Pt, H, W),
                       np.tile(np.asarray(theta), Pp))
    return flat._replace(params=jnp.asarray(theta, jnp.float32),
                         params_phi=jnp.asarray(phi, jnp.float32))


def _param_weight(warp: Warp2D, theta):
    """Bracketing slice indices + blend weight, clamped at the ends."""
    p = warp.params
    idx = jnp.clip(jnp.searchsorted(p, theta, side="right") - 1, 0, p.shape[0] - 2)
    w = (theta - p[idx]) / jnp.maximum(p[idx + 1] - p[idx], 1e-12)
    return idx, idx + 1, jnp.clip(w, 0.0, 1.0)


def _bsearch(cdf_at, n: int, target):
    """Largest cell index i in [0, n-2] with cdf(i) <= target (vectorized)."""
    lo = jnp.zeros_like(target, dtype=jnp.int32)
    hi = jnp.full_like(lo, n - 2)
    for _ in range(int(math.ceil(math.log2(max(n, 2))))):
        mid = (lo + hi + 1) // 2
        go_right = cdf_at(mid) <= target
        lo = jnp.where(go_right, mid, lo)
        hi = jnp.where(go_right, hi, mid - 1)
    return lo


def _invert_linear_cdf(c0, d0, d1, step, target):
    """Solve target = c0 + step*(d0*t + (d1-d0)*t^2/2) for t in [0,1].

    Uses the citardauq root t = 2*rhs / (d0 + sqrt(d0^2 + 2a*rhs)) — the
    textbook (sqrt(..) - d0)/a form cancels catastrophically in fp32 when
    |a*rhs| << d0^2 (flat-density cells), which shows up as ~1e-2 errors in
    sample<->invert round-trips."""
    a = d1 - d0
    rhs = jnp.maximum((target - c0) / step, 0.0)
    disc = jnp.maximum(d0 * d0 + 2.0 * a * rhs, 0.0)
    denom = d0 + jnp.sqrt(disc)
    t = 2.0 * rhs / jnp.maximum(denom, 1e-20)
    return jnp.clip(t, 0.0, 1.0)


def _eval_linear_cdf(c0, d0, d1, step, t):
    return c0 + step * (d0 * t + 0.5 * (d1 - d0) * t * t)


def _marg(warp, p0, p1, wp, k):
    return (1 - wp) * warp.marg_cdf[p0, k] + wp * warp.marg_cdf[p1, k]


def _cond(warp, p0, p1, wp, k0, k1, wk, j):
    v0 = (1 - wp) * warp.cond_cdf[p0, k0, j] + wp * warp.cond_cdf[p1, k0, j]
    v1 = (1 - wp) * warp.cond_cdf[p0, k1, j] + wp * warp.cond_cdf[p1, k1, j]
    return (1 - wk) * v0 + wk * v1


def _dens(warp, p0, p1, wp, k0, k1, wk, j):
    v0 = (1 - wp) * warp.density[p0, k0, j] + wp * warp.density[p1, k0, j]
    v1 = (1 - wp) * warp.density[p0, k1, j] + wp * warp.density[p1, k1, j]
    return (1 - wk) * v0 + wk * v1


def _row_density(warp, p0, p1, wp, k):
    """Marginal (row-integral) density at vertex row k."""
    last = warp.cond_cdf.shape[-1] - 1
    return (1 - wp) * warp.cond_cdf[p0, k, last] + wp * warp.cond_cdf[p1, k, last]


# --------------------------------------------------------- row fast path
#
# TPU gathers are ROW-count bound (~9 ns per gathered row on v5e,
# measured r04, independent of row width up to 128 lanes). The generic
# path above does O(log W) scalar gathers per binary-search probe —
# ~60-80 gathered rows per warp_sample call, ~40 ms per 64k-ray wavefront.
# When a table's rows fit the 128-lane vector width, the same math runs as:
#   - slice (theta) interpolation as a (N, P) x (P, H) matmul — zero
#     gathers (P is 8 for RGL files);
#   - ONE row gather per (slice, row) site; cell search by counting
#     cdf <= target across the in-register row (pure VPU);
#   - lane extraction by one-hot select (VPU).
# => 8 gathered rows per warp_sample (~5 ms/64k), bit-compatible blending.

_FAST_MAX = 128  # rows (W) and marginal length (H) must fit vector lanes
_FAST_MAX_P = 64  # slice-blend matmul width (flattened aniso: Pp * Pt)


def _fast_ok(warp: Warp2D) -> bool:
    H, W = warp.res
    return (W <= _FAST_MAX and H <= _FAST_MAX
            and warp.density.shape[0] <= _FAST_MAX_P)


def _bracket(grid, v):
    """Bracketing index + weight on a 1-D increasing grid, end-clamped."""
    n = grid.shape[0]
    if n == 1:
        z = jnp.zeros(jnp.shape(v), jnp.int32)
        return z, jnp.zeros(jnp.shape(v), grid.dtype)
    idx = jnp.clip(jnp.searchsorted(grid, v, side="right") - 1, 0, n - 2)
    w = jnp.clip((v - grid[idx]) / jnp.maximum(grid[idx + 1] - grid[idx],
                                               1e-12), 0.0, 1.0)
    return idx, w


def _slice_weights(warp: Warp2D, theta, phi):
    """[(flat slice index, weight)] — 2 entries for theta-only warps, 4
    for anisotropic (phi_i x theta_i) warps; weights sum to 1."""
    Pt = warp.params.shape[0]
    ti, tw = _bracket(warp.params, theta)
    t_slices = [(ti, 1.0 - tw), (jnp.minimum(ti + 1, Pt - 1), tw)]
    if warp.params_phi is None or warp.params_phi.shape[0] <= 1:
        return t_slices
    Pp = warp.params_phi.shape[0]
    if phi is None:
        phi = jnp.zeros(jnp.shape(theta), warp.params_phi.dtype)
    pi_, pw = _bracket(warp.params_phi, phi)
    out = []
    for t_idx, t_w in t_slices:
        out.append((pi_ * Pt + t_idx, (1.0 - pw) * t_w))
        out.append((jnp.minimum(pi_ + 1, Pp - 1) * Pt + t_idx, pw * t_w))
    return out


def _pblend(warp: Warp2D, theta, phi=None):
    """Slice-interpolation weight matrix (..., P) + the slice list."""
    slices = _slice_weights(warp, theta, phi)
    P = warp.density.shape[0]
    pid = jnp.arange(P, dtype=jnp.int32)
    w = jnp.zeros(jnp.shape(theta) + (P,), jnp.float32)
    for idx, wk in slices:
        w = w + jnp.where(pid == idx[..., None], wk[..., None], 0.0)
    return w, slices


def _count_cells(cdf_rows, target, n: int):
    """Largest cell i in [0, n-2] with cdf_rows[..., i] <= target: a lane
    count over the in-register row (cdf[..., 0] == 0 <= target always)."""
    j = jnp.sum((cdf_rows[..., :n] <= target[..., None]).astype(jnp.int32),
                axis=-1) - 1
    return jnp.clip(j, 0, n - 2)


def _sel(rows, j):
    """One-hot lane select rows[..., j] — predictable VPU cost, no gather."""
    W = rows.shape[-1]
    lane = jnp.arange(W, dtype=jnp.int32)
    return jnp.sum(jnp.where(lane == j[..., None], rows, 0.0), axis=-1)


def _gather_rows(table3, p, k):
    """(P, H, W)[p, k] -> (..., W): ONE row gather via flat indexing."""
    P, H, W = table3.shape
    return table3.reshape(P * H, W)[p * H + k]


def _blend_rows(table3, slices, k, k1, t_n, pairs=None):
    """(slice, row) blend of table rows: 2 row gathers per slice entry
    (2 slices isotropic, 4 anisotropic) — or ONE per slice when the
    packed k/k+1 `pairs` table exists (rows narrow enough that both fit
    one 128-lane gather; see Warp2D.density_pairs)."""
    if pairs is not None:
        W = table3.shape[-1]
        b0 = None
        t0 = None
        for idx, wk in slices:
            wn = wk[..., None]
            row = _gather_rows(pairs, idx, k)  # (..., 2W): k and k+1
            gb = wn * row[..., :W]
            gt = wn * row[..., W:]
            b0 = gb if b0 is None else b0 + gb
            t0 = gt if t0 is None else t0 + gt
        return (1.0 - t_n) * b0 + t_n * t0
    b0 = None
    t0 = None
    for idx, wk in slices:
        wn = wk[..., None]
        gb = wn * _gather_rows(table3, idx, k)
        gt = wn * _gather_rows(table3, idx, k1)
        b0 = gb if b0 is None else b0 + gb
        t0 = gt if t0 is None else t0 + gt
    return (1.0 - t_n) * b0 + t_n * t0


def _warp_sample_fast(warp: Warp2D, u: jnp.ndarray, theta: jnp.ndarray,
                      phi=None):
    H, W = warp.res
    dx, dy = 1.0 / (W - 1), 1.0 / (H - 1)
    u1, u2 = u[..., 0], u[..., 1]
    wmat, slices = _pblend(warp, theta, phi)

    marg_rows = jnp.einsum("...p,ph->...h", wmat, warp.marg_cdf)
    rt_rows = jnp.einsum("...p,ph->...h", wmat, warp.cond_cdf[..., -1])
    k = _count_cells(marg_rows, u2, H)
    m0 = _sel(rt_rows, k)
    m1 = _sel(rt_rows, k + 1)
    t = _invert_linear_cdf(_sel(marg_rows, k), m0, m1, dy, u2)
    y = (k.astype(u2.dtype) + t) * dy

    row_total = (1 - t) * m0 + t * m1
    target = u1 * row_total
    t_n = t[..., None]
    cond_rows = _blend_rows(warp.cond_cdf, slices, k, k + 1, t_n,
                            pairs=warp.cond_cdf_pairs)
    j = _count_cells(cond_rows, target, W)
    dens_rows = _blend_rows(warp.density, slices, k, k + 1, t_n,
                            pairs=warp.density_pairs)
    d0 = _sel(dens_rows, j)
    d1 = _sel(dens_rows, j + 1)
    s = _invert_linear_cdf(_sel(cond_rows, j), d0, d1, dx, target)
    x = (j.astype(u1.dtype) + s) * dx

    pdf = (1 - s) * d0 + s * d1
    return jnp.stack([x, y], axis=-1), pdf


def _warp_invert_fast(warp: Warp2D, pos: jnp.ndarray, theta: jnp.ndarray,
                      phi=None):
    H, W = warp.res
    dx, dy = 1.0 / (W - 1), 1.0 / (H - 1)
    x, y = pos[..., 0], pos[..., 1]
    wmat, slices = _pblend(warp, theta, phi)

    yk = jnp.clip(y * (H - 1), 0.0, H - 1 - 1e-6)
    k = yk.astype(jnp.int32)
    t = yk - k.astype(yk.dtype)
    marg_rows = jnp.einsum("...p,ph->...h", wmat, warp.marg_cdf)
    rt_rows = jnp.einsum("...p,ph->...h", wmat, warp.cond_cdf[..., -1])
    m0 = _sel(rt_rows, k)
    m1 = _sel(rt_rows, k + 1)
    u2 = _eval_linear_cdf(_sel(marg_rows, k), m0, m1, dy, t)

    xj = jnp.clip(x * (W - 1), 0.0, W - 1 - 1e-6)
    j = xj.astype(jnp.int32)
    s = xj - j.astype(xj.dtype)
    t_n = t[..., None]
    cond_rows = _blend_rows(warp.cond_cdf, slices, k, k + 1, t_n,
                            pairs=warp.cond_cdf_pairs)
    dens_rows = _blend_rows(warp.density, slices, k, k + 1, t_n,
                            pairs=warp.density_pairs)
    d0 = _sel(dens_rows, j)
    d1 = _sel(dens_rows, j + 1)
    cx = _eval_linear_cdf(_sel(cond_rows, j), d0, d1, dx, s)
    row_total = (1 - t) * m0 + t * m1
    u1 = cx / jnp.maximum(row_total, 1e-20)

    pdf = (1 - s) * d0 + s * d1
    return jnp.stack([u1, u2], axis=-1), pdf


def _warp_eval_fast(warp: Warp2D, pos: jnp.ndarray, theta: jnp.ndarray,
                    phi=None):
    H, W = warp.res
    x, y = pos[..., 0], pos[..., 1]
    slices = _slice_weights(warp, theta, phi)
    yk = jnp.clip(y * (H - 1), 0.0, H - 1 - 1e-6)
    k = yk.astype(jnp.int32)
    t = yk - k.astype(yk.dtype)
    xj = jnp.clip(x * (W - 1), 0.0, W - 1 - 1e-6)
    j = xj.astype(jnp.int32)
    s = xj - j.astype(xj.dtype)
    dens_rows = _blend_rows(warp.density, slices, k, k + 1, t[..., None],
                            pairs=warp.density_pairs)
    d0 = _sel(dens_rows, j)
    d1 = _sel(dens_rows, j + 1)
    return (1 - s) * d0 + s * d1


_WIDE1_MAX = 1024


def _wide1_ok(warp: Warp2D) -> bool:
    H, W = warp.res
    return (
        warp.params.shape[0] == 1 and H <= _WIDE1_MAX and W <= _WIDE1_MAX
    )


def _warp_sample_wide1(warp: Warp2D, u: jnp.ndarray):
    """Single-slice (P == 1) variant for tables too wide for the row fast
    path — the envmap's 256 x 512 luminance warp. The marginal CDF (H
    values) broadcasts to the whole wavefront (compare-count + one-hot
    select, zero gathers); the conditional needs 2 wide row gathers for
    the CDF rows and 2 for the density rows."""
    H, W = warp.res
    dx, dy = 1.0 / (W - 1), 1.0 / (H - 1)
    u1, u2 = u[..., 0], u[..., 1]
    marg = warp.marg_cdf[0]  # (H,) broadcast
    rt = warp.cond_cdf[0, :, -1]  # (H,)

    # (1, H) rows broadcast against (N, 1) targets inside the helpers
    k = _count_cells(marg[None, :], u2, H)
    m0 = _sel(rt[None, :], k)
    m1 = _sel(rt[None, :], k + 1)
    c0 = _sel(marg[None, :], k)
    t = _invert_linear_cdf(c0, m0, m1, dy, u2)
    y = (k.astype(u2.dtype) + t) * dy

    row_total = (1 - t) * m0 + t * m1
    target = u1 * row_total
    t_n = t[..., None]
    if warp.cond_cdf_pairs is not None:
        cp = warp.cond_cdf_pairs[0][k]  # one gather: k and k+1 rows
        cond_rows = (1 - t_n) * cp[..., :W] + t_n * cp[..., W:]
        dp = warp.density_pairs[0][k]
        dens_rows = (1 - t_n) * dp[..., :W] + t_n * dp[..., W:]
    else:
        cond = warp.cond_cdf[0]  # (H, W)
        dens = warp.density[0]
        cond_rows = (1 - t_n) * cond[k] + t_n * cond[k + 1]  # 2 row gathers
        dens_rows = (1 - t_n) * dens[k] + t_n * dens[k + 1]  # 2 row gathers
    j = _count_cells(cond_rows, target, W)
    d0 = _sel(dens_rows, j)
    d1 = _sel(dens_rows, j + 1)
    s = _invert_linear_cdf(_sel(cond_rows, j), d0, d1, dx, target)
    x = (j.astype(u1.dtype) + s) * dx
    pdf = (1 - s) * d0 + s * d1
    return jnp.stack([x, y], axis=-1), pdf


def _require_fast_for_aniso(warp: Warp2D, phi):
    if phi is not None and warp.params_phi is not None and not _fast_ok(warp):
        raise NotImplementedError(
            "anisotropic warps require the row fast path (rows <= 128 lanes)"
        )


def warp_sample(warp: Warp2D, u: jnp.ndarray, theta: jnp.ndarray, phi=None):
    """u: (..., 2) uniforms; theta: (...,) parameter (+ phi for aniso
    warps). Returns ((..., 2) pos, (...,) density at pos)."""
    _require_fast_for_aniso(warp, phi)
    if _fast_ok(warp):
        return _warp_sample_fast(warp, u, theta, phi)
    if _wide1_ok(warp):
        return _warp_sample_wide1(warp, u)
    H, W = warp.res
    dx, dy = 1.0 / (W - 1), 1.0 / (H - 1)
    u1, u2 = u[..., 0], u[..., 1]
    p0, p1, wp = _param_weight(warp, theta)

    # --- marginal along y
    k = _bsearch(lambda i: _marg(warp, p0, p1, wp, i), H, u2)
    m0 = _row_density(warp, p0, p1, wp, k)
    m1 = _row_density(warp, p0, p1, wp, k + 1)
    t = _invert_linear_cdf(_marg(warp, p0, p1, wp, k), m0, m1, dy, u2)
    y = (k.astype(u2.dtype) + t) * dy

    # --- conditional along x (row blended by t)
    row_total = (1 - t) * m0 + t * m1
    target = u1 * row_total
    j = _bsearch(lambda i: _cond(warp, p0, p1, wp, k, k + 1, t, i), W, target)
    d0 = _dens(warp, p0, p1, wp, k, k + 1, t, j)
    d1 = _dens(warp, p0, p1, wp, k, k + 1, t, j + 1)
    s = _invert_linear_cdf(_cond(warp, p0, p1, wp, k, k + 1, t, j), d0, d1, dx, target)
    x = (j.astype(u1.dtype) + s) * dx

    pdf = (1 - s) * d0 + s * d1
    return jnp.stack([x, y], axis=-1), pdf


def warp_invert(warp: Warp2D, pos: jnp.ndarray, theta: jnp.ndarray,
                phi=None):
    """Exact inverse of warp_sample: (pos, theta) -> ((..., 2) u, density)."""
    _require_fast_for_aniso(warp, phi)
    if _fast_ok(warp):
        return _warp_invert_fast(warp, pos, theta, phi)
    H, W = warp.res
    dx, dy = 1.0 / (W - 1), 1.0 / (H - 1)
    x, y = pos[..., 0], pos[..., 1]
    p0, p1, wp = _param_weight(warp, theta)

    yk = jnp.clip(y * (H - 1), 0.0, H - 1 - 1e-6)
    k = yk.astype(jnp.int32)
    t = yk - k.astype(yk.dtype)
    m0 = _row_density(warp, p0, p1, wp, k)
    m1 = _row_density(warp, p0, p1, wp, k + 1)
    u2 = _eval_linear_cdf(_marg(warp, p0, p1, wp, k), m0, m1, dy, t)

    xj = jnp.clip(x * (W - 1), 0.0, W - 1 - 1e-6)
    j = xj.astype(jnp.int32)
    s = xj - j.astype(xj.dtype)
    d0 = _dens(warp, p0, p1, wp, k, k + 1, t, j)
    d1 = _dens(warp, p0, p1, wp, k, k + 1, t, j + 1)
    cx = _eval_linear_cdf(_cond(warp, p0, p1, wp, k, k + 1, t, j), d0, d1, dx, s)
    row_total = (1 - t) * m0 + t * m1
    u1 = cx / jnp.maximum(row_total, 1e-20)

    pdf = (1 - s) * d0 + s * d1
    return jnp.stack([u1, u2], axis=-1), pdf


def _warp_eval_wide1(warp: Warp2D, pos: jnp.ndarray):
    """P == 1 wide-table density eval: 2 row gathers + lane selects."""
    H, W = warp.res
    x, y = pos[..., 0], pos[..., 1]
    yk = jnp.clip(y * (H - 1), 0.0, H - 1 - 1e-6)
    k = yk.astype(jnp.int32)
    t = yk - k.astype(yk.dtype)
    xj = jnp.clip(x * (W - 1), 0.0, W - 1 - 1e-6)
    j = xj.astype(jnp.int32)
    s = xj - j.astype(xj.dtype)
    t_n = t[..., None]
    if warp.density_pairs is not None:
        dp = warp.density_pairs[0][k]  # one gather: k and k+1 rows
        dens_rows = (1 - t_n) * dp[..., :W] + t_n * dp[..., W:]
    else:
        dens = warp.density[0]
        dens_rows = (1 - t_n) * dens[k] + t_n * dens[k + 1]
    d0 = _sel(dens_rows, j)
    d1 = _sel(dens_rows, j + 1)
    return (1 - s) * d0 + s * d1


def warp_eval(warp: Warp2D, pos: jnp.ndarray, theta: jnp.ndarray, phi=None):
    """Normalized density at pos (unit-square measure)."""
    _require_fast_for_aniso(warp, phi)
    if _fast_ok(warp):
        return _warp_eval_fast(warp, pos, theta, phi)
    if _wide1_ok(warp):
        return _warp_eval_wide1(warp, pos)
    H, W = warp.res
    x, y = pos[..., 0], pos[..., 1]
    p0, p1, wp = _param_weight(warp, theta)
    yk = jnp.clip(y * (H - 1), 0.0, H - 1 - 1e-6)
    k = yk.astype(jnp.int32)
    t = yk - k.astype(yk.dtype)
    xj = jnp.clip(x * (W - 1), 0.0, W - 1 - 1e-6)
    j = xj.astype(jnp.int32)
    s = xj - j.astype(xj.dtype)
    d0 = _dens(warp, p0, p1, wp, k, k + 1, t, j)
    d1 = _dens(warp, p0, p1, wp, k, k + 1, t, j + 1)
    return (1 - s) * d0 + s * d1
