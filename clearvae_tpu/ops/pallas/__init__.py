from clearvae_tpu.ops.pallas import fused_loss  # noqa: F401
