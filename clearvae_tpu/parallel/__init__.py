from clearvae_tpu.parallel import mesh  # noqa: F401
