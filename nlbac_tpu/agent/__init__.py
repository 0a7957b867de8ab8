from nlbac_tpu.agent.state import (  # noqa: F401
    TrainState,
    action_spec,
    create_train_state,
    make_optimizers,
)
from nlbac_tpu.agent.update import Agent, make_agent  # noqa: F401
