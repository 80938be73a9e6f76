from gs2m_tpu.core.camera import Camera
from gs2m_tpu.core.gaussians import Gaussians
from gs2m_tpu.core.config import ModelConfig, PipelineConfig, OptimConfig

__all__ = ["Camera", "Gaussians", "ModelConfig", "PipelineConfig", "OptimConfig"]
