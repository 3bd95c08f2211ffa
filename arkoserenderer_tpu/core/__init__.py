from arkoserenderer_tpu.core.logging import get_logger  # noqa: F401
