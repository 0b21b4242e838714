from tmv_tpu.core.config import Config, eval_str_fn  # noqa: F401
