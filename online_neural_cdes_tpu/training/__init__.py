from online_neural_cdes_tpu.training import metrics, loop  # noqa: F401
