from m2trans_tpu.models.m2trans import (  # noqa: F401
    ComputePolicy,
    init_m2trans,
    m2trans_apply,
    m2trans_apply_microbatched,
    MICRO_BATCH,
    policy_from_config,
)
