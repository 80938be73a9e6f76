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

__version__ = "0.1.0"
