from dmvio_tpu.parallel import dist_ba  # noqa: F401
