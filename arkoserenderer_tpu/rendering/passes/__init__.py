from arkoserenderer_tpu.rendering.passes.scenepass import ScenePass  # noqa: F401
from arkoserenderer_tpu.rendering.passes.geometry import GeometryPass  # noqa: F401
from arkoserenderer_tpu.rendering.passes.shadow import SunShadowPass  # noqa: F401
from arkoserenderer_tpu.rendering.passes.shading import VisibilityShadingPass  # noqa: F401
from arkoserenderer_tpu.rendering.passes.sky import SkyPass  # noqa: F401
from arkoserenderer_tpu.rendering.passes.taa import TAAPass  # noqa: F401
from arkoserenderer_tpu.rendering.passes.bloom import BloomPass  # noqa: F401
from arkoserenderer_tpu.rendering.passes.output import OutputPass  # noqa: F401
from arkoserenderer_tpu.rendering.passes.post import (  # noqa: F401
    CASPass,
    DepthOfFieldPass,
    FXAAPass,
    FogPass,
    LightingComposePass,
    MotionBlurPass,
    SSAOPass,
)
