from clearvae_tpu.utils import visual  # noqa: F401
