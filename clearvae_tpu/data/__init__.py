from clearvae_tpu.data import mnist, styled  # noqa: F401
