from nlbac_tpu.replay.buffer import (  # noqa: F401
    Replay,
    create,
    push,
    record_from_step,
    sample,
    unpack_rows,
)
