"""gs2m_tpu — a TPU-native (JAX/XLA/Pallas) framework for material-aware
differentiable Gaussian splatting and high-fidelity mesh reconstruction.

Re-designed from scratch with the capabilities of the GS-2M reference
(arXiv 2509.22276): a tile-binned differentiable rasterizer blending RGB plus
a 10-channel feature buffer (alpha, plane distance, world normal, albedo,
roughness, metallic), staged training (RGB warmup -> geometry -> material),
PGSR-style multi-view losses, split-sum PBR shading against a learned cubemap
environment light, adaptive densification, and TSDF mesh extraction.

The compute path is JAX/XLA with Pallas TPU kernels for the hot blend loops;
scale-out is jax.sharding over a device mesh (tiles sharded, Gaussians
replicated, per-Gaussian grads psum-reduced).
"""

import jax as _jax

# TPU lowers f32 matmuls/convs to bf16 by default; covariance projection,
# SSIM blurs, and the PBR prefilter matmuls all need true f32 (bf16 SSIM is
# numerically unbounded). The Pallas kernels set their own
# preferred_element_type and are unaffected.
_jax.config.update("jax_default_matmul_precision", "highest")

__version__ = "0.1.0"
