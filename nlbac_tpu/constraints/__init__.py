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
            f"unknown constraint kind {kind!r}; options: "
            f"{list(_BUILDERS)}. Third-party builders must be "
            "registered with nlbac_tpu.constraints.register_builder in "
            "EVERY process (registration is per-process, not persisted)")
    return _BUILDERS[kind]


def uses_barrier(kind: str) -> bool:
    """Whether the builder trains a learned barrier critic (the NBC
    family): the agent runs barrier TD updates + target soft-updates,
    and the CLI saves/loads ``barrier.pkl``.  Declared by the builder
    itself via ``USES_BARRIER = True`` (set on the built-in
    ``learned_barrier`` module), so runtime-registered NBC-style
    builders get the same treatment as the built-in one."""
    return bool(getattr(get_builder(kind), "USES_BARRIER", False))


def register_builder(kind: str, module) -> None:
    """Register a third-party constraint builder so
    ``ConstraintConfig(kind=...)`` resolves to it (the companion of
    :func:`nlbac_tpu.envs.register_env`; examples/custom_env.py).

    ``module`` exposes::

        terms(ccfg, ncfg, node_params, field, lyap_params, obs, action,
              lyap_t, key, dt, include_clf=True, **extras) -> (B, K)
        NUM_PRIMARY: int   # K with the CLF column
        NUM_BACKUP: int    # K of the backup (CBF-only) branch

    Optional: ``USES_BARRIER = True`` marks an NBC-family builder —
    ``terms`` then receives live ``barrier_params`` (+ a ``resample``
    closure over the current policy) in its extras, and the agent TD-
    trains the barrier critic on the env's ``barrier_signal`` channel
    (the env must emit it; see examples/custom_barrier_env.py).

    Same collision semantics as register_env: re-registering the same
    object is a no-op, shadowing a different one fails loudly."""
    if kind in _BUILDERS and _BUILDERS[kind] is not module:
        raise ValueError(f"constraint kind {kind!r} is already registered")
    required = ("terms", "NUM_PRIMARY", "NUM_BACKUP")
    missing = [a for a in required if not hasattr(module, a)]
    if missing:
        raise ValueError(
            f"constraint builder for {kind!r} is missing required "
            f"attributes {missing}")
    _BUILDERS[kind] = module
