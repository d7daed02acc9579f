from artist_tpu.optim import losses, regularizers, training  # noqa: F401
