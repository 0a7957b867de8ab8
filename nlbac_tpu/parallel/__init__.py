from nlbac_tpu.parallel.mesh import (  # noqa: F401
    init_distributed,
    is_rank0,
    make_async_seed_runner,
    make_dp_episode_runner,
    make_dp_update,
    make_mesh,
    make_seed_parallel_runner,
    make_tp_episode_runner,
    proc_id,
    shard_params_tp,
    shard_state_tp,
    statistics_scalar,
)
