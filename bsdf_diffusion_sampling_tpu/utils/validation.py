"""Validation metrics (P21): KL grids, histogram comparisons, image MSE.

JAX/numpy re-design of the reference's plotting-oriented utilities:
- `export_withpdf_2d` KL divergence between learned and ground-truth pdf
  grids (`/root/reference/learning_repo_cleanup/utils/utils.py:206-211`)
- `export_2d_result_pdf` learned-vs-GT grids + difference
  (`utils.py:104-135`)
- `compute_mse` between rendered EXRs
  (`/root/reference/rendering/utils/mitsuba_brdf_draw.py:32-34`)

No matplotlib dependency in the metrics themselves; callers can plot the
returned grids however they like.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax.numpy as jnp
import numpy as np


def kl_divergence_grid(p: np.ndarray, q: np.ndarray, eps: float = 1e-12) -> float:
    """KL(p || q) for two nonnegative grids, each normalized to sum 1
    (the reference's metric, `utils.py:206-211`)."""
    p = np.maximum(np.asarray(p, np.float64), 0)
    q = np.maximum(np.asarray(q, np.float64), 0)
    p = p / max(p.sum(), eps)
    q = q / max(q.sum(), eps)
    mask = p > eps
    return float(np.sum(p[mask] * np.log(p[mask] / np.maximum(q[mask], eps))))


def pdf_grid_2d(
    pdf_fn: Callable[[jnp.ndarray], jnp.ndarray],
    lo: Tuple[float, float],
    hi: Tuple[float, float],
    bins: int = 64,
) -> np.ndarray:
    """Evaluate a batched 2-D density on a bins x bins cell-center grid."""
    cx = np.linspace(lo[0], hi[0], bins + 1)
    cy = np.linspace(lo[1], hi[1], bins + 1)
    cx = 0.5 * (cx[1:] + cx[:-1])
    cy = 0.5 * (cy[1:] + cy[:-1])
    gx, gy = np.meshgrid(cx, cy, indexing="ij")
    pts = jnp.asarray(np.stack([gx.ravel(), gy.ravel()], -1), jnp.float32)
    return np.asarray(pdf_fn(pts)).reshape(bins, bins)


def histogram_grid_2d(
    samples: np.ndarray,
    lo: Tuple[float, float],
    hi: Tuple[float, float],
    bins: int = 64,
) -> np.ndarray:
    """Density-normalized 2-D histogram on the same grid as pdf_grid_2d."""
    h, _, _ = np.histogram2d(
        samples[:, 0], samples[:, 1], bins=bins,
        range=[[lo[0], hi[0]], [lo[1], hi[1]]], density=True,
    )
    return h


def sampler_vs_pdf_kl(
    samples: np.ndarray,
    pdf_fn: Callable,
    lo: Tuple[float, float],
    hi: Tuple[float, float],
    bins: int = 64,
) -> float:
    """KL(sample-histogram || pdf grid) — the reference's learned-vs-GT
    check, usable in both directions (samples from learned vs analytic
    pdf, or analytic samples vs learned pdf)."""
    return kl_divergence_grid(
        histogram_grid_2d(samples, lo, hi, bins), pdf_grid_2d(pdf_fn, lo, hi, bins)
    )


def image_mse(a: np.ndarray, b: np.ndarray) -> float:
    """MSE between two HDR images (`mitsuba_brdf_draw.py:32-34`)."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    if a.shape != b.shape:
        raise ValueError(f"shape mismatch {a.shape} vs {b.shape}")
    return float(np.mean((a - b) ** 2))


def relative_mse(a: np.ndarray, b: np.ndarray, eps: float = 1e-2) -> float:
    """Relative MSE (tonemap-insensitive variant used for HDR compares)."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return float(np.mean((a - b) ** 2 / (b * b + eps)))
