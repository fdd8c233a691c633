from clearvae_tpu.ops import losses, schedules, group, metrics  # noqa: F401
