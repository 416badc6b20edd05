from online_neural_cdes_tpu.data import builders, common, loader, prefetch, toy, ts_format  # noqa: F401
