from clearvae_tpu.train import steps, trainers, factories  # noqa: F401
