"""Neural BSDF adapter — the reference's `MyBSDF` plugin re-designed as
pure functions over the ODE sampler.

Reference semantics (`/root/reference/rendering/brdf_measured_disk.py:31-130`):
- sample(): draw omega_o from the rectified flow in disk coords given the
  local incident direction, reject samples outside the valid disk
  (r^2 > 0.995), lift to a direction, convert the disk-area pdf to solid
  angle (x cos_theta_o), weight = f_measured / pdf, and zero out fireflies
  where luminance(f/pdf) >= 30.
- pdf(): reverse-ODE query x cos_theta_o.
- eval(): the measured RGL BRDF (ground truth), `brdf_measured_disk.py:103-110`.

The spherical variant works in (theta, phi) with a 1/sin(theta) solid-angle
factor and pole guards (`brdf_measured_spherical.py:79-91`).

All functions take LOCAL (shading-frame) directions, batched (N, 3).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from bsdf_diffusion_sampling_tpu.bsdf.measured import MeasuredBRDF, eval_brdf
from bsdf_diffusion_sampling_tpu.core.config import ModelConfig, SamplerConfig
from bsdf_diffusion_sampling_tpu.geometry.coords import (
    cart_to_spher,
    disk_to_cart,
    spher_to_cart,
)
from bsdf_diffusion_sampling_tpu.models.base_density import get_base
from bsdf_diffusion_sampling_tpu.models.velocity import encode_condition
from bsdf_diffusion_sampling_tpu.ode import ode_pdf, ode_sample
from bsdf_diffusion_sampling_tpu.ops.fused_ode import (
    fused_pdf_disk_packed,
    fused_sample_pdf_disk_packed,
    fused_sample_pdf_spherical_packed,
    fused_transport_packed,
    prepack_disk,
    prepack_spherical,
)


class NeuralBSDF(NamedTuple):
    domain: str  # "disk" | "spherical"
    cfg: ModelConfig
    v_params: list  # rectified velocity net
    base_params: dict
    brdf: MeasuredBRDF  # ground-truth eval
    T: int
    firefly_clamp: float
    disk_valid_r2: float = 0.995
    pole_sin_eps: float = 5e-5
    fused: bool = False  # run sample/pdf through the Pallas fused kernels
    tile: int = 256  # Pallas batch tile (sublane rows per grid step)
    pdf_exact: bool = False  # Newton exact-inverse pdf queries (fused + XLA)
    pdf_newton_iters: int = 2
    # prepacked kernel weights (prepack_disk / prepack_velocity output):
    # packed ONCE here so the per-bounce render jit takes them as inputs
    # instead of re-materializing the kron-expanded stacks every call
    # (VERDICT r3 item 7)
    packed: tuple | None = None
    # draw base normals with the in-kernel Pallas PRNG (TPU production;
    # saves a separate XLA normal() program + eps packing per bounce).
    # False keeps the key-exact eps path the fused-vs-XLA parity tests and
    # interpret mode need.
    in_kernel_prng: bool = False


def make_neural_bsdf(
    domain: str,
    cfg: ModelConfig,
    v_params,
    base_params,
    brdf: MeasuredBRDF,
    sampler_cfg: SamplerConfig = SamplerConfig(),
    fused: bool | None = None,
    tile: int = 256,
) -> NeuralBSDF:
    """`fused=None` auto-selects the Pallas fused sample/pdf kernels on TPU
    and the XLA `lax.scan` path elsewhere (the parity oracle). The fused
    path is the production render configuration — the tcnn analogue the
    reference deploys for its 5-10x (`tiny-cuda-nn/README.md:5`)."""
    T = sampler_cfg.T_disk if domain == "disk" else sampler_cfg.T_spherical
    clamp = (
        sampler_cfg.firefly_clamp_sphere  # `bsdf_myresult.py:102`
        if domain == "sphere_full"
        else sampler_cfg.firefly_clamp_disk  # `brdf_measured_disk.py:98`
    )
    if fused is None:
        fused = jax.default_backend() == "tpu"
    packed = None
    if fused:
        packed = (
            prepack_disk(v_params, base_params)
            if domain == "disk"
            else prepack_spherical(v_params, base_params)
        )
    return NeuralBSDF(
        domain=domain,
        cfg=cfg,
        v_params=v_params,
        base_params=base_params,
        brdf=brdf,
        T=T,
        firefly_clamp=clamp,
        disk_valid_r2=sampler_cfg.disk_valid_r2,
        pole_sin_eps=sampler_cfg.pole_sin_eps,
        fused=fused,
        tile=tile,
        pdf_exact=sampler_cfg.pdf_exact,
        pdf_newton_iters=sampler_cfg.pdf_newton_iters,
        packed=packed,
        in_kernel_prng=fused and jax.default_backend() == "tpu",
    )


def _wi_coords(nb: NeuralBSDF, wi_local: jnp.ndarray) -> jnp.ndarray:
    if nb.domain == "disk":
        return wi_local[..., :2]
    return cart_to_spher(wi_local)


def _sample_x_pdf(nb: NeuralBSDF, key, omega_i, cond):
    """Domain-coordinate draw + pdf, via Pallas fused kernels (production)
    or the XLA scan path (oracle). Both consume the key identically (the
    disk base draw is loc + eps*exp(ls) with eps = normal(key)), so fused
    and XLA agree to kernel rounding."""
    if not nb.fused:
        return ode_sample(nb.domain, nb.v_params, nb.base_params, omega_i,
                          cond, key, nb.T)
    if nb.domain == "disk":
        if nb.in_kernel_prng:
            seed = jax.random.bits(key, dtype=jnp.uint32).astype(jnp.int32)
            x, pdf, _ = fused_sample_pdf_disk_packed(
                nb.packed, cond, seed, nb.T, tile=nb.tile
            )
        else:
            eps = jax.random.normal(key, omega_i.shape[:-1] + (2,))
            x, pdf, _ = fused_sample_pdf_disk_packed(
                nb.packed, cond, 0, nb.T, tile=nb.tile, eps=eps
            )
        return x, pdf
    # spherical: the WHOLE sample+pdf runs in one kernel — base heads,
    # Gaussian theta + in-kernel Best-Fisher von Mises phi, transport,
    # p0/det (`network_sampling_spherical`, mlp_brdf_sampling.py:106-140)
    if nb.in_kernel_prng:
        seed = jax.random.bits(key, dtype=jnp.uint32).astype(jnp.int32)
        x, pdf, _ = fused_sample_pdf_spherical_packed(
            nb.packed, cond, seed, nb.T, tile=nb.tile)
        return x, pdf
    # key-exact path (CPU/interpret parity): replicate the XLA base
    # draw's key consumption, pass (eps_gauss, phi) into the kernel
    from bsdf_diffusion_sampling_tpu.models.base_density import _spherical_heads
    from bsdf_diffusion_sampling_tpu.models.von_mises import von_mises_sample

    k_gauss, k_von = jax.random.split(key)
    loc, _, loc_von, conc = _spherical_heads(nb.base_params, omega_i)
    eps_g = jax.random.normal(k_gauss, loc.shape, loc.dtype)
    phi = von_mises_sample(k_von, loc_von, conc)
    x, pdf, _ = fused_sample_pdf_spherical_packed(
        nb.packed, cond, 0, nb.T, tile=nb.tile,
        eps=jnp.stack([eps_g, phi], axis=-1))
    return x, pdf


def _pdf_query(nb: NeuralBSDF, x, omega_i, cond):
    """Reverse-ODE pdf in domain coordinates, fused or XLA. With
    nb.pdf_exact the XLA path uses the Newton exact-inverse query
    (ode_pdf_exact) — sample<->pdf consistent to ~1e-5 instead of the
    reverse-Euler ~25% (see SamplerConfig.pdf_exact)."""
    if not nb.fused:
        if nb.pdf_exact:
            from bsdf_diffusion_sampling_tpu.ode import ode_pdf_exact

            return ode_pdf_exact(nb.domain, nb.v_params, nb.base_params, x,
                                 omega_i, cond, nb.T,
                                 newton_iters=nb.pdf_newton_iters)
        return ode_pdf(nb.domain, nb.v_params, nb.base_params, x, omega_i,
                       cond, nb.T)
    if nb.domain == "disk":
        pdf, _ = fused_pdf_disk_packed(
            nb.packed, x, cond, nb.T, tile=nb.tile, exact=nb.pdf_exact,
            newton_iters=nb.pdf_newton_iters,
        )
        return pdf
    if nb.pdf_exact:
        # the spherical fused kernel has no in-kernel Newton branch yet;
        # exact queries route through the XLA Newton solve (same math the
        # disk kernel fuses) so production MIS stays sample-consistent
        from bsdf_diffusion_sampling_tpu.ode import ode_pdf_exact

        return ode_pdf_exact(nb.domain, nb.v_params, nb.base_params, x,
                             omega_i, cond, nb.T,
                             newton_iters=nb.pdf_newton_iters)
    base = get_base(nb.domain)
    vel_packed = (nb.packed[0], nb.packed[2], nb.packed[3])
    x0, det = fused_transport_packed(vel_packed, "spherical", x, cond, nb.T,
                                     reverse=True, tile=nb.tile)
    p0 = jnp.exp(base.log_prob(nb.base_params, x0, omega_i))
    return p0 * det


def neural_sample(
    nb: NeuralBSDF, key: jax.Array, wi_local: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(wo_local, pdf_solid_angle). Invalid draws carry pdf 0."""
    omega_i = _wi_coords(nb, wi_local)
    cond = encode_condition(omega_i, nb.cfg)
    x, pdf = _sample_x_pdf(nb, key, omega_i, cond)
    if nb.domain == "disk":
        r2 = jnp.sum(x**2, axis=-1)
        valid = r2 <= nb.disk_valid_r2  # `brdf_measured_disk.py:69-71`
        wo = disk_to_cart(x)
        pdf_sa = pdf * jnp.maximum(wo[..., 2], 0.0)  # `:82`
    else:
        theta, phi = x[..., 0], x[..., 1]
        sin_t = jnp.sin(theta)
        # hemisphere for BRDFs, full sphere for transmissive BSDFs
        # (`bsdf_correct_sampling.py` trains theta in [0, pi])
        theta_max = jnp.pi if nb.domain == "sphere_full" else jnp.pi / 2
        valid = (sin_t > nb.pole_sin_eps) & (theta > 0) & (theta < theta_max)
        wo = spher_to_cart(theta, phi)
        pdf_sa = pdf * jnp.clip(
            1.0 / jnp.maximum(sin_t, nb.pole_sin_eps), 0.0, 1e6
        )  # `brdf_measured_spherical.py:89-91`
    valid &= wi_local[..., 2] > 0
    return wo, jnp.where(valid, jnp.maximum(pdf_sa, 0.0), 0.0)


def neural_pdf(nb: NeuralBSDF, wi_local: jnp.ndarray, wo_local: jnp.ndarray) -> jnp.ndarray:
    omega_i = _wi_coords(nb, wi_local)
    cond = encode_condition(omega_i, nb.cfg)
    if nb.domain == "disk":
        x = wo_local[..., :2]
        jac = jnp.maximum(wo_local[..., 2], 0.0)
    else:
        x = cart_to_spher(wo_local)
        sin_t = jnp.sin(x[..., 0])
        jac = jnp.clip(1.0 / jnp.maximum(sin_t, nb.pole_sin_eps), 0.0, 1e6)
    pdf = _pdf_query(nb, x, omega_i, cond)
    valid = wi_local[..., 2] > 0
    if nb.domain != "sphere_full":
        valid &= wo_local[..., 2] > 0
    return jnp.where(valid, jnp.maximum(pdf * jac, 0.0), 0.0)


def neural_eval(nb: NeuralBSDF, wi_local: jnp.ndarray, wo_local: jnp.ndarray) -> jnp.ndarray:
    """(N, 3) ground-truth measured f * cos (`brdf_measured_disk.py:103-110`)."""
    return eval_brdf(nb.brdf, wi_local, wo_local)


def firefly_filter(nb: NeuralBSDF, weight_rgb: jnp.ndarray) -> jnp.ndarray:
    """Zero the sample when luminance(f/pdf) exceeds the clamp
    (`brdf_measured_disk.py:97-100`)."""
    lum = (
        0.2126 * weight_rgb[..., 0]
        + 0.7152 * weight_rgb[..., 1]
        + 0.0722 * weight_rgb[..., 2]
    )
    ok = lum < nb.firefly_clamp
    return jnp.where(ok[..., None], weight_rgb, 0.0)
