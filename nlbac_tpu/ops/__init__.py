from nlbac_tpu.ops.node_kernel import (  # noqa: F401
    fused_euler_step,
    pack_params,
)
