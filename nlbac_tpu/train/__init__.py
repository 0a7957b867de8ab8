from nlbac_tpu.train.driver import (  # noqa: F401
    EpisodeMetrics,
    create_replays,
    make_episode_runner,
)
from nlbac_tpu.train.supervisor import (  # noqa: F401
    SupervisorState,
    backup_active,
    init_supervisor,
    post_step,
    pre_action,
)
from nlbac_tpu.train.logging import (  # noqa: F401
    EpochLogger,
    MetricsSink,
    StepTimer,
    colorize,
)
from nlbac_tpu.train.checkpoint import (  # noqa: F401
    load_model_weights,
    restore_checkpoint,
    save_checkpoint,
    save_model_weights,
)
