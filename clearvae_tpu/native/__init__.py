from clearvae_tpu.native.bindings import (  # noqa: F401
    available,
    corrupt_batch_native,
    ksg_mi_cd_native,
    mutual_info_classif_native,
)
