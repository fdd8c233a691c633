from clearvae_tpu.models import vae, cnn, mi_estimators, mlp  # noqa: F401
