from tmv_tpu.serving.app import create_app, DetectionService  # noqa: F401
