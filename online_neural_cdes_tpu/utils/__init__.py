from online_neural_cdes_tpu.utils import params  # noqa: F401
