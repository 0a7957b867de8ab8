"""Augmented-Lagrangian machinery shared by all constraint builders.

Reference semantics (UNI/sac_cbf_clf/sac_cbf_clf.py:494-528, and the
per-variant equivalents):

1. Residual matrix (B, K) -> ReLU-filter -> per-constraint batch-mean
   c in R^K (the CLF residual is the LAST column for primary losses).
2. A balance ratio |mean(c_cbf)| / |c_clf| rescales the CLF term
   (non-differentiable: the reference casts through ``float()``; here
   ``stop_gradient``), optionally floored at 0.002 (CARS/PVTOL).
3. Multiplier ascent lam <- clip(lam + rho * stop_grad(c), 0.01, lam_max)
   every ``lambda_update_interval`` updates, INSIDE the loss computation,
   using rho BEFORE its growth bump.
4. rho <- min(rho * 1.0005, 200) — bumped on EVERY loss evaluation, so
   twice per update when the backup loss shares rho (UNI/CARS) and
   separately when the backup keeps its own rho (PVTOL's
   backup_augmented_term, PVTOL/sac_cbf_clf/sac_cbf_clf.py:62,1033-1034).
5. loss = sum_i lam'_i (c_i - cl) + rho'/2 (c_i - cl)^2, with the CLF term
   scaled by ratio (linear) and ratio^2 (quadratic).

All of it is device-side state — no Python floats mutated between steps.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from nlbac_tpu.config import ConstraintConfig


class LagrangianState(NamedTuple):
    """Device-side multiplier/penalty state (per controller pair)."""

    lam: jnp.ndarray  # (K_primary,) primary multipliers (CLF last)
    backup_lam: jnp.ndarray  # (K_backup,) backup multipliers
    rho: jnp.ndarray  # f32 shared/primary augmented coefficient
    backup_rho: jnp.ndarray  # f32 separate backup coefficient (PVTOL)


def init_lagrangian(num_primary: int, num_backup: int,
                    rho_init: float = 1.0) -> LagrangianState:
    return LagrangianState(
        lam=jnp.zeros((num_primary,), jnp.float32),
        backup_lam=jnp.zeros((max(num_backup, 1),), jnp.float32),
        rho=jnp.float32(rho_init),
        backup_rho=jnp.float32(rho_init),
    )


def filtered_means(terms: jnp.ndarray, batch_size: int) -> jnp.ndarray:
    """ReLU-filter then batch-mean each constraint column: (B, K) -> (K,).

    The reference divides by the configured batch_size, not terms.shape[0]
    (identical here since batches are exact)."""
    return jnp.sum(jnp.maximum(terms, 0.0), axis=0) / batch_size


def ascend_multipliers(cfg: ConstraintConfig, lam, c, rho, do_update):
    """lam <- clip(lam + rho * stop_grad(c), lambda_min, lambda_max) when
    ``do_update``; identity otherwise."""
    c = jax.lax.stop_gradient(c)
    new = jnp.clip(lam + rho * c, cfg.lambda_min, cfg.lambda_max)
    return jnp.where(do_update, new, lam)


def grow_rho(cfg: ConstraintConfig, rho):
    return jnp.minimum(rho * cfg.rho_growth, cfg.rho_max)


def _maybe_grow_rho(cfg: ConstraintConfig, rho, do_rho_growth):
    """rho bump, optionally gated (lagrangian_warmup_episodes, lever 10).

    ``do_rho_growth is True`` (the default, every reference preset) keeps
    the canonical growth op with NO extra select — the unicycle program's
    StableHLO size is pinned by an op-count regression test."""
    if do_rho_growth is True:
        return grow_rho(cfg, rho)
    return jnp.where(do_rho_growth, grow_rho(cfg, rho), rho)


def primary_loss(cfg: ConstraintConfig, terms: jnp.ndarray, lam, rho,
                 do_lambda_update, batch_size: int, do_rho_growth=True
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Primary controller's constraint loss (CBFs + CLF-last).

    Returns (loss, lam', rho').  Transition order matches the reference:
    ascent with rho_in, THEN rho bump, THEN loss with (lam', rho')."""
    # Operand split per the reference: multiplier ascent uses the RAW
    # filtered means (required_matrix_copy, UNI/sac_cbf_clf/sac_cbf_clf.py
    # :516-519), while BOTH the ratio and the loss use the cost_limit-
    # shifted means (ratio at :506-509 divides |mean(m[:-1]-cl)| by
    # |m[-1]-cl|; loss at :524-528). Identical when cost_limit=0 (every
    # preset), but the split matters if cost_limit is configured.
    m = filtered_means(terms, batch_size)  # (K,) raw: ascent only
    c = m - cfg.cost_limit  # (K,) shifted: ratio + loss
    if cfg.use_ratio and terms.shape[1] < 2:
        # a CLF-only builder (no CBF columns) has nothing to balance —
        # jnp.mean over the empty c[:-1] slice would be NaN and poison
        # the whole policy loss. Loud failure at trace time instead
        # (reachable only through register_builder extensions; every
        # reference family has >= 2 columns).
        raise ValueError(
            "use_ratio=True requires at least one CBF column before "
            f"the CLF (builder produced {terms.shape[1]} column(s)); "
            "set ConstraintConfig(use_ratio=False) for a CLF-only "
            "builder")
    if cfg.use_ratio:
        other = jnp.abs(jnp.mean(c[:-1]))
        lya = jnp.abs(c[-1])
        # Guard: the reference divides by |c_clf| unprotected; a zero CLF
        # residual would NaN its loss. We clamp the denominator instead.
        ratio = jax.lax.stop_gradient(other / jnp.maximum(lya, 1e-12))
        if cfg.ratio_floor > 0:
            ratio = jnp.maximum(ratio, cfg.ratio_floor)
    else:
        ratio = jnp.float32(1.0)

    lam_new = ascend_multipliers(cfg, lam, m, rho, do_lambda_update)
    rho_new = _maybe_grow_rho(cfg, rho, do_rho_growth)

    lam_const = jax.lax.stop_gradient(lam_new)
    cbf_part = jnp.sum(lam_const[:-1] * c[:-1]
                       + 0.5 * rho_new * jnp.square(c[:-1]))
    clf_part = (lam_const[-1] * ratio * c[-1]
                + 0.5 * rho_new * jnp.square(ratio) * jnp.square(c[-1]))
    return cbf_part + clf_part, lam_new, rho_new


def backup_loss(cfg: ConstraintConfig, terms: jnp.ndarray, backup_lam, rho,
                do_lambda_update, batch_size: int, do_rho_growth=True
                ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Backup controller's CBF-only constraint loss.

    ``rho`` is whichever coefficient this variant wires in: the shared one
    after the primary bump (UNI/CARS) or the separate backup_rho (PVTOL).
    Returns (loss, backup_lam', rho')."""
    m = filtered_means(terms, batch_size)  # raw means: ascent (ref parity)
    c = m - cfg.cost_limit  # shifted: loss only
    lam_new = ascend_multipliers(cfg, backup_lam, m, rho, do_lambda_update)
    rho_new = _maybe_grow_rho(cfg, rho, do_rho_growth)
    lam_const = jax.lax.stop_gradient(lam_new)
    loss = jnp.sum(lam_const * c + 0.5 * rho_new * jnp.square(c))
    return loss, lam_new, rho_new
