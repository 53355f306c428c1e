"""Analytic microfacet shading densities (training targets / test oracles).

JAX implementation of the GGX + Smith-Schlick + Schlick-Fresnel specular
model the reference uses as its analytic oracle
(`/root/reference/learning_repo_cleanup/utils/analytical_brdf_torch.py:3-78`),
in both the projected-disk and spherical parameterizations. These are
*unnormalized* target densities: BRDF x cos(theta_o) (plus the domain
Jacobian handled by the caller), exactly what the MCMC data generator and
the KL validation grids consume.
"""

from __future__ import annotations

import jax.numpy as jnp

from bsdf_diffusion_sampling_tpu.geometry.coords import disk_to_cart, spher_to_cart


def _ndf_ggx(n_dot_h: jnp.ndarray, roughness: float) -> jnp.ndarray:
    # alpha = roughness^2, D = alpha^2 / (pi ((n.h)^2 (alpha^2-1) + 1)^2)
    # (`analytical_brdf_torch.py:3-5`; note the reference folds the square
    # into NdotH*(a^2-1)+1 without squaring n.h — we mirror that so the two
    # oracles agree bit-for-bit on the same inputs).
    alpha = roughness**2
    return alpha**2 / (jnp.pi * (n_dot_h * (alpha**2 - 1.0) + 1.0) ** 2)


def _g_smith_schlick(n_dot_l, n_dot_v, roughness):
    k = (roughness + 1.0) ** 2 / 8.0
    g1 = n_dot_l / (n_dot_l * (1.0 - k) + k)
    g2 = n_dot_v / (n_dot_v * (1.0 - k) + k)
    return g1 * g2


def _fresnel_schlick(cos_theta, f0):
    return f0 + (1.0 - f0) * (1.0 - cos_theta) ** 5


def _shading(light_dir, view_dir, roughness, f0, diffuse_prob):
    half = light_dir + view_dir
    half = half / jnp.linalg.norm(half, axis=-1, keepdims=True)
    n_dot_h = half[..., 2]
    n_dot_l = light_dir[..., 2]
    n_dot_v = view_dir[..., 2]
    v_dot_h = jnp.sum(view_dir * half, axis=-1)
    d = _ndf_ggx(n_dot_h, roughness)
    g = _g_smith_schlick(n_dot_l, n_dot_v, roughness)
    f = _fresnel_schlick(v_dot_h, f0)
    f_spec = (d * g * f) / (4.0 * n_dot_l * n_dot_v + 1e-10)
    cos_term = jnp.maximum(n_dot_v, 0.0)
    return (1.0 - diffuse_prob) * f_spec * cos_term + diffuse_prob * cos_term / jnp.pi


def ggx_shading_disk(
    omega_i: jnp.ndarray,
    omega_o: jnp.ndarray,
    roughness: float,
    f0: float = 0.04,
    diffuse_prob: float = 0.0,
) -> jnp.ndarray:
    """Unnormalized target density over disk coords
    (`classic_shading_pdf_disk`, `analytical_brdf_torch.py:34-55`)."""
    return _shading(disk_to_cart(omega_i), disk_to_cart(omega_o), roughness, f0, diffuse_prob)


def ggx_shading_spherical(
    omega_i: jnp.ndarray,
    omega_o: jnp.ndarray,
    roughness: float,
    f0: float = 0.04,
    diffuse_prob: float = 0.0,
) -> jnp.ndarray:
    """Unnormalized target density over (theta, phi)
    (`classic_shading_pdf_spherical`, `analytical_brdf_torch.py:57-78`)."""
    li = spher_to_cart(omega_i[..., 0], omega_i[..., 1])
    vo = spher_to_cart(omega_o[..., 0], omega_o[..., 1])
    return _shading(li, vo, roughness, f0, diffuse_prob)
