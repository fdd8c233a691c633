from clearvae_tpu.parallel import mesh, tp  # noqa: F401
