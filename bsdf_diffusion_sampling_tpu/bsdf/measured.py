"""RGL measured-BSDF evaluator (Dupuy & Jakob 2018 parameterization).

Native replacement for Mitsuba's `measured` plugin, which the reference
uses both as a training oracle
(`/root/reference/learning_repo_cleanup/utils/mitsuba_brdf_scalar.py:75-89`)
and as the ground-truth `eval` inside its BSDF plugin at render time
(`/root/reference/rendering/brdf_measured_disk.py:103-110`).

Data model (per .bsdf tensor file, isotropic):
  theta_i (T,)           incidence grid
  sigma   (2, W)         projected microfacet area sigma(wi), lookup table
  ndf     (2, W)         microfacet NDF D(wm), lookup table
  vndf    (1, T, H, W)   visible-NDF warp over u_wm = (theta2u(th_m),
                         phi2u(phi_m - phi_i)), per theta_i
  luminance (1, T, h, w) sampling density over the vndf-warped unit square
  rgb     (1, T, 3, h, w) measured BRDF ratio tables

Mappings (square-root elevation spacing):
  u = theta2u(th) = sqrt(2 th / pi) over the hemisphere,
  u2theta(u) = u^2 pi/2, phi2u(phi) = phi/(2 pi) + 0.5.

Evaluation chain (wi, wo upward):
  wm = normalize(wi + wo);  u_wm = (theta2u(th_m), phi2u(phi_m - phi_i))
  (s, vndf_pdf) = vndf.invert(u_wm | theta_i)
  f        = rgb[s] * D(u_wm) / (4 sigma(u_wi))        # includes cos(th_o),
                                                        # Mitsuba convention
  pdf(wo)  = vndf_pdf * lum_pdf(s) / (4 |wo.wm| * 2 pi^2 u_x sin th_m)
  sample(u): s = lum.sample(u); u_wm = vndf.sample(s); reflect(wi, wm)

The change-of-measure factor 2 pi^2 u_x sin th_m is |d omega_m / d u_wm|
under the sqrt-elevation parameterization; 4 |wo.wm| is the half-vector
reflection Jacobian. Self-consistency (sample histogram == pdf, and
invert(sample) == id) is enforced by tests/test_measured.py; Mitsuba is
not available in this image, so parity with its plugin is structural
(same tables, same parameterization) rather than bit-level.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from bsdf_diffusion_sampling_tpu.bsdf.marginal2d import (
    Warp2D,
    build_warp2d,
    warp_eval,
    warp_invert,
    warp_sample,
)
from bsdf_diffusion_sampling_tpu.bsdf.tensorfile import read_tensor_file

_TWO_OVER_PI = 2.0 / np.pi


def theta2u(theta):
    return jnp.sqrt(jnp.maximum(theta * _TWO_OVER_PI, 0.0))


def u2theta(u):
    return u * u * (np.pi / 2.0)


def phi2u(phi):
    return phi / (2.0 * np.pi) + 0.5


def u2phi(u):
    return (u - 0.5) * (2.0 * np.pi)


def rgb_to_luminance(rgb):
    """Rec.709 luminance (`mitsuba_brdf_scalar.py:8-10`)."""
    return 0.2126 * rgb[..., 0] + 0.7152 * rgb[..., 1] + 0.0722 * rgb[..., 2]


class MeasuredBRDF(NamedTuple):
    theta_i_grid: jnp.ndarray  # (T,)
    sigma: jnp.ndarray  # (2, W) lookup
    ndf: jnp.ndarray  # (2, W) lookup
    vndf: Warp2D
    luminance: Warp2D
    rgb: jnp.ndarray  # (P_flat, 3, h, w); P_flat = |phi_i| * |theta_i|
    # channel-packed rgb rows, (P_flat, h, 3*w): row y of slice p holds the
    # R/G/B rows back to back (lane c*w + x) when 3*w <= 128 — ONE row
    # gather then serves all three channels' bilinear corners (TPU gathers
    # are row-count bound, ~9 ns/row on v5e regardless of width). None
    # when the rows don't fit (falls back to per-channel lookups).
    rgb_rows: jnp.ndarray | None = None
    # anisotropic files: the phi_i grid (Pp,); tables condition on
    # (phi_i, theta_i) with slices flattened phi-major (bvh8-style row
    # packing keeps the per-query gather count at 2x the isotropic cost).
    # None for the 14 shipped isotropic files.
    phi_i_grid: jnp.ndarray | None = None
    name: str = ""


def measured_from_tensors(tf: dict, name: str = "") -> MeasuredBRDF:
    """Build the evaluator from raw RGL tensor-file entries. Split from
    load_measured so tests can synthesize anisotropic tensors (none of the
    14 shipped .bsdf files has |phi_i| > 1)."""
    theta_i = np.asarray(tf["theta_i"], np.float32)
    phi_i = np.asarray(tf["phi_i"], np.float32)
    aniso = phi_i.shape[0] > 1
    vndf_g = np.asarray(tf["vndf"], np.float64)
    lum_g = np.asarray(tf["luminance"], np.float64)
    rgb = np.asarray(tf["rgb"], np.float32)  # (Pp, T, 3, h, w)
    if aniso:
        from bsdf_diffusion_sampling_tpu.bsdf.marginal2d import build_warp2d_aniso

        vndf = build_warp2d_aniso(vndf_g, theta_i, phi_i)
        lum = build_warp2d_aniso(lum_g, theta_i, phi_i)
        rgb_flat = rgb.reshape((-1,) + rgb.shape[2:])  # (Pp*T, 3, h, w)
    else:
        vndf = build_warp2d(vndf_g[0], theta_i)
        lum = build_warp2d(lum_g[0], theta_i)
        rgb_flat = rgb[0]
    p_, _, h_, w_ = rgb_flat.shape
    rgb_rows = (
        jnp.asarray(
            np.transpose(rgb_flat, (0, 2, 1, 3)).reshape(p_, h_, 3 * w_)
        )
        if 3 * w_ <= 128
        else None
    )
    return MeasuredBRDF(
        theta_i_grid=jnp.asarray(theta_i),
        sigma=jnp.asarray(np.asarray(tf["sigma"], np.float32)),
        ndf=jnp.asarray(np.asarray(tf["ndf"], np.float32)),
        vndf=vndf,
        luminance=lum,
        rgb=jnp.asarray(rgb_flat),
        rgb_rows=rgb_rows,
        phi_i_grid=jnp.asarray(phi_i) if aniso else None,
        name=name,
    )


def load_measured(path: str) -> MeasuredBRDF:
    return measured_from_tensors(
        read_tensor_file(path),
        name=path.rsplit("/", 1)[-1].removesuffix(".bsdf"),
    )


def _sel_lane(row, j):
    """One-hot lane select row[..., j] — no gather (TPU gathers are
    row-count bound; a (2, 128) table's rows broadcast for free)."""
    W = row.shape[-1]
    lane = jnp.arange(W, dtype=jnp.int32)
    return jnp.sum(jnp.where(lane == j[..., None], row, 0.0), axis=-1)


def _lookup_2d(table: jnp.ndarray, u_x, u_y):
    """Bilinear lookup of a (Hy, Wx) vertex table at unit coords.

    The ndf/sigma tables are (2, <=128): both rows broadcast to the whole
    wavefront and corners come from one-hot lane selects — zero gathers.
    Larger tables fall back to corner gathers."""
    Hy, Wx = table.shape
    xf = jnp.clip(u_x * (Wx - 1), 0.0, Wx - 1 - 1e-6)
    yf = jnp.clip(u_y * (Hy - 1), 0.0, Hy - 1 - 1e-6)
    x0 = xf.astype(jnp.int32)
    y0 = yf.astype(jnp.int32)
    fx = xf - x0
    fy = yf - y0
    if Hy == 2 and Wx <= 128:
        r0, r1 = table[0], table[1]
        v00 = _sel_lane(r0, x0)
        v01 = _sel_lane(r0, x0 + 1)
        v10 = _sel_lane(r1, x0)
        v11 = _sel_lane(r1, x0 + 1)
    else:
        v00 = table[y0, x0]
        v01 = table[y0, x0 + 1]
        v10 = table[y0 + 1, x0]
        v11 = table[y0 + 1, x0 + 1]
    return (
        v00 * (1 - fx) * (1 - fy)
        + v01 * fx * (1 - fy)
        + v10 * (1 - fx) * fy
        + v11 * fx * fy
    )


def _slice_list(brdf: MeasuredBRDF, theta_i, phi_i):
    """[(flat slice, weight)] over the rgb/table slice axis: 2 entries for
    isotropic files, 4 (bilinear over phi_i x theta_i) for anisotropic."""
    from bsdf_diffusion_sampling_tpu.bsdf.marginal2d import _bracket

    grid = brdf.theta_i_grid
    Pt = grid.shape[0]
    ti, tw = _bracket(grid, theta_i)
    t_slices = [(ti, 1.0 - tw), (jnp.minimum(ti + 1, Pt - 1), tw)]
    if brdf.phi_i_grid is None:
        return t_slices
    Pp = brdf.phi_i_grid.shape[0]
    pi_, pw = _bracket(brdf.phi_i_grid, phi_i)
    out = []
    for t_idx, t_w in t_slices:
        out.append((pi_ * Pt + t_idx, (1.0 - pw) * t_w))
        out.append((jnp.minimum(pi_ + 1, Pp - 1) * Pt + t_idx, pw * t_w))
    return out


def _rgb_lookup(brdf: MeasuredBRDF, s: jnp.ndarray, theta_i, phi_i=None):
    """(N, 3) rgb table value at unit-square s, interpolated over theta_i
    (and phi_i for anisotropic files).

    Channel-packed path: 2 row gathers per slice entry (each row holding
    all three channels) instead of 24+ scalar gathers — the corners come
    from lane selects on the gathered rows."""
    slices = _slice_list(brdf, theta_i, phi_i)
    if brdf.rgb_rows is not None:
        P, h, w3 = brdf.rgb_rows.shape
        wx = w3 // 3
        flat = brdf.rgb_rows.reshape(P * h, w3)
        xf = jnp.clip(s[..., 0] * (wx - 1), 0.0, wx - 1 - 1e-6)
        yf = jnp.clip(s[..., 1] * (h - 1), 0.0, h - 1 - 1e-6)
        x0 = xf.astype(jnp.int32)
        y0 = yf.astype(jnp.int32)
        fx = (xf - x0)[..., None]
        fy = (yf - y0)[..., None]
        row_lo = None
        row_hi = None
        for p_idx, p_w in slices:
            wn = p_w[..., None]
            lo = wn * flat[p_idx * h + y0]
            hi = wn * flat[p_idx * h + y0 + 1]
            row_lo = lo if row_lo is None else row_lo + lo
            row_hi = hi if row_hi is None else row_hi + hi
        chan_off = jnp.arange(3, dtype=jnp.int32) * wx  # (3,)
        jj0 = chan_off[None, :] + x0[..., None]  # (N, 3)
        lane = jnp.arange(w3, dtype=jnp.int32)

        def sel3(rows, jj):  # (N, 3w), (N, 3) -> (N, 3)
            return jnp.sum(
                jnp.where(lane[None, None, :] == jj[..., None], rows[:, None, :], 0.0),
                axis=-1,
            )

        v0 = sel3(row_lo, jj0)
        v1 = sel3(row_lo, jj0 + 1)
        v2 = sel3(row_hi, jj0)
        v3 = sel3(row_hi, jj0 + 1)
        return (
            v0 * (1 - fx) * (1 - fy)
            + v1 * fx * (1 - fy)
            + v2 * (1 - fx) * fy
            + v3 * fx * fy
        )

    out = []
    for c in range(3):
        acc = None
        for p_idx, p_w in slices:
            v = p_w * _lookup_2d_batch(brdf.rgb[:, c], p_idx, s[..., 0],
                                       s[..., 1])
            acc = v if acc is None else acc + v
        out.append(acc)
    return jnp.stack(out, axis=-1)


def _lookup_2d_batch(tables: jnp.ndarray, p_idx, u_x, u_y):
    """Bilinear lookup in (P, Hy, Wx) with a per-sample slice index."""
    _, Hy, Wx = tables.shape
    xf = jnp.clip(u_x * (Wx - 1), 0.0, Wx - 1 - 1e-6)
    yf = jnp.clip(u_y * (Hy - 1), 0.0, Hy - 1 - 1e-6)
    x0 = xf.astype(jnp.int32)
    y0 = yf.astype(jnp.int32)
    fx = xf - x0
    fy = yf - y0
    v00 = tables[p_idx, y0, x0]
    v01 = tables[p_idx, y0, x0 + 1]
    v10 = tables[p_idx, y0 + 1, x0]
    v11 = tables[p_idx, y0 + 1, x0 + 1]
    return (
        v00 * (1 - fx) * (1 - fy)
        + v01 * fx * (1 - fy)
        + v10 * (1 - fx) * fy
        + v11 * fx * fy
    )


def _spherical(w):
    theta = jnp.arccos(jnp.clip(w[..., 2], -1.0, 1.0))
    phi = jnp.arctan2(w[..., 1], w[..., 0])
    return theta, phi


def _half_vector(wi, wo):
    h = wi + wo
    return h / jnp.maximum(jnp.linalg.norm(h, axis=-1, keepdims=True), 1e-12)


def _u_wm(theta_m, phi_m, phi_i):
    u_x = theta2u(theta_m)
    u_y = phi2u(phi_m - phi_i)
    u_y = u_y - jnp.floor(u_y)  # wrap to [0, 1)
    return u_x, u_y


def eval_brdf(brdf: MeasuredBRDF, wi: jnp.ndarray, wo: jnp.ndarray) -> jnp.ndarray:
    """(N, 3) BSDF value * cos(theta_o) (Mitsuba eval convention); zero
    outside the upper hemisphere."""
    active = (wi[..., 2] > 0) & (wo[..., 2] > 0)
    wm = _half_vector(wi, wo)
    theta_i, phi_i = _spherical(wi)
    theta_m, phi_m = _spherical(wm)
    u_x, u_y = _u_wm(theta_m, phi_m, phi_i)
    pos = jnp.stack([u_x, u_y], axis=-1)

    s, _ = warp_invert(brdf.vndf, pos, theta_i, phi_i)
    fr = _rgb_lookup(brdf, s, theta_i, phi_i)

    d = _lookup_2d(brdf.ndf, u_x, u_y)
    sig = _lookup_2d(brdf.sigma, theta2u(theta_i), phi2u(phi_i))
    scale = d / jnp.maximum(4.0 * sig, 1e-12)
    fr = jnp.maximum(fr * scale[..., None], 0.0)
    return jnp.where(active[..., None], fr, 0.0)


def _solid_angle_jacobian(u_x, theta_m, wo, wm):
    """|d omega_o / d u_wm| = 4 |wo.wm| * 2 pi^2 u_x sin(theta_m)."""
    dot = jnp.abs(jnp.sum(wo * wm, axis=-1))
    return 4.0 * dot * jnp.maximum(
        2.0 * np.pi**2 * u_x * jnp.sin(theta_m), 1e-6
    )


def pdf_brdf(brdf: MeasuredBRDF, wi: jnp.ndarray, wo: jnp.ndarray) -> jnp.ndarray:
    """Solid-angle pdf of wo under sample_brdf."""
    active = (wi[..., 2] > 0) & (wo[..., 2] > 0)
    wm = _half_vector(wi, wo)
    theta_i, phi_i = _spherical(wi)
    theta_m, phi_m = _spherical(wm)
    u_x, u_y = _u_wm(theta_m, phi_m, phi_i)
    pos = jnp.stack([u_x, u_y], axis=-1)

    s, vndf_pdf = warp_invert(brdf.vndf, pos, theta_i, phi_i)
    lum_pdf = warp_eval(brdf.luminance, s, theta_i, phi_i)
    jac = _solid_angle_jacobian(u_x, theta_m, wo, wm)
    pdf = vndf_pdf * lum_pdf / jac
    return jnp.where(active, pdf, 0.0)


def eval_pdf_brdf(
    brdf: MeasuredBRDF, wi: jnp.ndarray, wo: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(eval, pdf) in one pass: the NEE/MIS path needs both at the same
    (wi, wo), and they share the vndf invert (the expensive half — 8
    gathered rows). Equals (eval_brdf(..), pdf_brdf(..)) exactly."""
    active = (wi[..., 2] > 0) & (wo[..., 2] > 0)
    wm = _half_vector(wi, wo)
    theta_i, phi_i = _spherical(wi)
    theta_m, phi_m = _spherical(wm)
    u_x, u_y = _u_wm(theta_m, phi_m, phi_i)
    pos = jnp.stack([u_x, u_y], axis=-1)

    s, vndf_pdf = warp_invert(brdf.vndf, pos, theta_i, phi_i)
    fr = _rgb_lookup(brdf, s, theta_i, phi_i)
    d = _lookup_2d(brdf.ndf, u_x, u_y)
    sig = _lookup_2d(brdf.sigma, theta2u(theta_i), phi2u(phi_i))
    scale = d / jnp.maximum(4.0 * sig, 1e-12)
    fr = jnp.maximum(fr * scale[..., None], 0.0)
    fr = jnp.where(active[..., None], fr, 0.0)

    lum_pdf = warp_eval(brdf.luminance, s, theta_i, phi_i)
    jac = _solid_angle_jacobian(u_x, theta_m, wo, wm)
    pdf = jnp.where(active, vndf_pdf * lum_pdf / jac, 0.0)
    return fr, pdf


def sample_brdf(
    brdf: MeasuredBRDF, u: jnp.ndarray, wi: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Importance-sample wo given wi and uniforms u (N, 2).

    Returns (wo, pdf). Invalid (downward) results carry pdf 0.
    """
    theta_i, phi_i = _spherical(wi)
    s, lum_pdf = warp_sample(brdf.luminance, u, theta_i, phi_i)
    u_wm, vndf_pdf = warp_sample(brdf.vndf, s, theta_i, phi_i)
    theta_m = u2theta(u_wm[..., 0])
    phi_m = u2phi(u_wm[..., 1]) + phi_i
    st, ct = jnp.sin(theta_m), jnp.cos(theta_m)
    wm = jnp.stack([st * jnp.cos(phi_m), st * jnp.sin(phi_m), ct], axis=-1)
    dot = jnp.sum(wi * wm, axis=-1, keepdims=True)
    wo = 2.0 * dot * wm - wi
    jac = _solid_angle_jacobian(u_wm[..., 0], theta_m, wo, wm)
    pdf = vndf_pdf * lum_pdf / jac
    valid = (wo[..., 2] > 0) & (wi[..., 2] > 0)
    return wo, jnp.where(valid, pdf, 0.0)


def eval_lum(brdf: MeasuredBRDF, wi: jnp.ndarray, wo: jnp.ndarray) -> jnp.ndarray:
    """Luminance of eval_brdf — the scalar target density the MCMC dataset
    generator uses (`mitsuba_brdf_scalar.py:84-89`)."""
    return rgb_to_luminance(eval_brdf(brdf, wi, wo))
