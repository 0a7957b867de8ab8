from nlbac_tpu.constraints import cars, learned_barrier, pvtol, unicycle
from nlbac_tpu.constraints.common import (  # noqa: F401
    LagrangianState,
    ascend_multipliers,
    backup_loss,
    filtered_means,
    grow_rho,
    init_lagrangian,
    primary_loss,
)

_BUILDERS = {
    "unicycle": unicycle,
    "cars": cars,
    "pvtol": pvtol,
    "learned_barrier": learned_barrier,
}


def get_builder(kind: str):
    """kind -> constraint-builder module (terms, NUM_PRIMARY, NUM_BACKUP).

    This registry is where the reference's five code copies collapse into
    configuration (SURVEY.md §7 item 5)."""
    if kind not in _BUILDERS:
        raise ValueError(
            f"unknown constraint kind {kind!r}; options: {list(_BUILDERS)}")
    return _BUILDERS[kind]
