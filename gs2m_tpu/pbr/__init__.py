"""PBR subsystem: learned cubemap environment light + split-sum shading.

Behavioral reference: /root/reference/pbr/{__init__,light,shade}.py and the
render-utils cubemap prefilter kernels (c_src/cubemap.cu). See cubemap.py for
the TPU-native prefilter design (dense weight-matrix matmuls).
"""
from gs2m_tpu.pbr.cubemap import (CubemapConfig, build_mips, cube_dirs,
                                  cube_lookup, cubemap_to_latlong,
                                  init_cubemap, pad_cube)
from gs2m_tpu.pbr.shade import (aces_film, get_brdf_lut, get_mip,
                                linear_to_srgb, pbr_shading, srgb_to_linear)
from gs2m_tpu.pbr.render import make_pbr_fns, pbr_render

__all__ = ["CubemapConfig", "build_mips", "cube_dirs", "cube_lookup", "pad_cube",
           "cubemap_to_latlong", "init_cubemap", "aces_film", "get_brdf_lut",
           "get_mip", "linear_to_srgb", "pbr_shading", "srgb_to_linear",
           "make_pbr_fns", "pbr_render"]
