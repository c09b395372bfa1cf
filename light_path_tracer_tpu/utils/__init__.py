from light_path_tracer_tpu.utils.config import SceneConfig, RenderConfig
from light_path_tracer_tpu.utils.timing import StageTimer

__all__ = ["SceneConfig", "RenderConfig", "StageTimer"]
