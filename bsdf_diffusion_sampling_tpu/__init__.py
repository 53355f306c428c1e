"""TPU-native diffusion-model BSDF importance sampling framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
fzy28/BSDF_diffusion_sampling (SIGGRAPH Asia 2024, "BSDF importance sampling
using a diffusion model"):

- per-material conditional flow-matching models mapping a learned base
  density (Gaussian on the projected disk / Gaussian x von-Mises on the
  sphere) to the BSDF outgoing-direction distribution,
- few-step Euler probability-flow ODE sampling with exact per-sample PDFs
  via accumulated 2x2 Jacobian determinants (forward-mode, not autograd VJPs),
- fused Pallas TPU kernels for the whole T-step sampler (the tiny-cuda-nn
  FullyFusedMLP equivalent),
- a JAX wavefront path tracer whose per-bounce sample()/pdf() are batched
  megakernel calls, sharded over a TPU mesh,
- pjit data-parallel training (pretrain / diffusion / rectify stages) with
  a JAX-native ensemble-MCMC data generator (the emcee equivalent).

Reference behavior documented throughout via `/root/reference` file:line cites.
"""

__version__ = "0.1.0"

from bsdf_diffusion_sampling_tpu.core import config  # noqa: F401
