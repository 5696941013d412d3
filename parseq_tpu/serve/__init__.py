from parseq_tpu.serve.server import InferenceServer  # noqa: F401
