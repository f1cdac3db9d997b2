from m2trans_tpu.models.m2trans import (  # noqa: F401
    ComputePolicy,
    init_m2trans,
    m2trans_apply,
    policy_from_config,
)
