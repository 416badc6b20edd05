from online_neural_cdes_tpu.data import toy  # noqa: F401
