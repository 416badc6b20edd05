from online_neural_cdes_tpu.ops import fill, interpolation, solvers, cdeint  # noqa: F401
