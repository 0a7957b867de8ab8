"""Deployment export: the trained policy as ONE self-contained artifact.

``export_policy`` serializes the DETERMINISTIC policy head (the
evaluate=True semantics of the reference's ``select_action``,
UNI/sac_cbf_clf/sac_cbf_clf.py:149-152) — obs batch in, env-space action
batch out, weights baked in — as a ``jax.export`` StableHLO module with
a SYMBOLIC batch dimension.  The artifact is loadable with plain jax
(``jax.export.deserialize(blob).call``): serving needs **no nlbac_tpu
code, no checkpoint format, no config tree**, and the module compiles
for whatever backend the consumer runs (TPU/CPU/GPU).

This is the missing deployment half of checkpointing: ``train/aot.py``
caches the *training* program for restarts; this exports the *policy*
for serving.  The reference's nearest analog is handing someone
``actor.pkl`` plus the whole codebase to rebuild the network around it.

CLI:
    python -m nlbac_tpu.utils.export_policy RUN_DIR --preset unicycle \
        -o policy.nlbac   # RUN_DIR holds actor.pkl etc. (save_model_weights)

Serving (anywhere, framework-free):
    import jax
    exported = jax.export.deserialize(open("policy.nlbac", "rb").read())
    act = jax.jit(exported.call)          # (B, obs_dim) -> (B, action_dim)
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Optional

import jax
import jax.numpy as jnp

# JSON sidecar magic: the artifact self-describes (dims, preset, policy
# type) without deserializing the module
_MANIFEST_SUFFIX = ".json"


def make_policy_fn(cfg, ts, deterministic: bool = True):
    """The closed-over (obs) -> action serving function.

    Deterministic: ``tanh(mean) * scale + bias`` — the reference's
    evaluate=True head. Stochastic serving (exploration at deployment)
    additionally takes a PRNG key."""
    from nlbac_tpu.agent import action_spec
    from nlbac_tpu.nn import (deterministic_policy_sample,
                              gaussian_policy_forward,
                              gaussian_policy_sample)

    spec = action_spec(cfg)
    policy = ts.policy
    if cfg.sac.policy_type == "deterministic":
        if deterministic:
            def fn(obs):
                from nlbac_tpu.nn import mlp_apply
                mean = mlp_apply(policy, obs)
                return jnp.tanh(mean) * spec.scale + spec.bias
            return fn

        def fn(obs, key):
            a, _, _ = deterministic_policy_sample(policy, obs, key, spec)
            return a
        return fn
    if deterministic:
        def fn(obs):
            mean, _ = gaussian_policy_forward(policy, obs)
            return jnp.tanh(mean) * spec.scale + spec.bias
        return fn

    def fn(obs, key):
        a, _, _ = gaussian_policy_sample(policy, obs, key, spec)
        return a
    return fn


def export_policy(cfg, ts, path: str, deterministic: bool = True,
                  batch: Optional[int] = None) -> None:
    """Serialize the policy head to ``path`` (+ a ``.json`` manifest).

    ``batch=None`` exports with a SYMBOLIC batch dimension (any batch
    size at serving time); pass an int to pin a static batch (slightly
    faster compile on some backends)."""
    from jax import export as jexport

    fn = make_policy_fn(cfg, ts, deterministic=deterministic)
    obs_dim = cfg.obs_dim
    if batch is None:
        (bdim,) = jexport.symbolic_shape("b")
        obs_aval = jax.ShapeDtypeStruct((bdim, obs_dim), jnp.float32)
    else:
        obs_aval = jax.ShapeDtypeStruct((batch, obs_dim), jnp.float32)
    if deterministic:
        exported = jexport.export(jax.jit(fn))(obs_aval)
    else:
        key_aval = jax.ShapeDtypeStruct((2,), jnp.uint32)
        exported = jexport.export(jax.jit(fn))(obs_aval, key_aval)

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tmp = f"{path}.{os.getpid()}.tmp"
    with open(tmp, "wb") as f:
        f.write(exported.serialize())
    os.replace(tmp, path)
    manifest = {
        "format": "nlbac-policy-export-v1",
        "env": cfg.env.name,
        "policy_type": cfg.sac.policy_type,
        "deterministic": deterministic,
        "obs_dim": cfg.obs_dim,
        "action_dim": cfg.action_dim,
        "batch": batch,  # None = symbolic
        "jax_version": jax.__version__,
    }
    # same tmp+replace pattern as the blob: a crash mid-export must not
    # leave a fresh blob paired with a truncated/stale manifest
    mtmp = f"{path}{_MANIFEST_SUFFIX}.{os.getpid()}.tmp"
    with open(mtmp, "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(mtmp, path + _MANIFEST_SUFFIX)


def load_policy(path: str):
    """Load an exported policy: returns (jitted_fn, manifest_dict).

    Needs only jax — kept in this module for convenience, but the
    two-line body is all a consumer requires (see the module
    docstring)."""
    from jax import export as jexport

    with open(path, "rb") as f:
        exported = jexport.deserialize(f.read())
    manifest = {}
    if os.path.exists(path + _MANIFEST_SUFFIX):
        with open(path + _MANIFEST_SUFFIX) as f:
            manifest = json.load(f)
    return jax.jit(exported.call), manifest


def main(argv=None):
    p = argparse.ArgumentParser(
        description="export a trained policy as a self-contained "
                    "jax.export artifact")
    p.add_argument("run_dir", help="directory with actor.pkl etc. "
                                   "(save_model_weights layout)")
    p.add_argument("--preset", required=True,
                   help="preset the run was trained with")
    p.add_argument("-o", "--out", default=None,
                   help="output path (default <run_dir>/policy.nlbac)")
    p.add_argument("--stochastic", action="store_true",
                   help="export the sampling head (takes a PRNG key) "
                        "instead of the deterministic head")
    p.add_argument("--batch", type=int, default=None,
                   help="pin a static batch size (default: symbolic)")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend")
    args = p.parse_args(argv)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from nlbac_tpu.agent import create_train_state
    from nlbac_tpu.config import get_config
    from nlbac_tpu.constraints import uses_barrier
    from nlbac_tpu.train.checkpoint import load_model_weights

    cfg = get_config(args.preset)
    ts = create_train_state(cfg, jax.random.PRNGKey(0))
    ts = load_model_weights(args.run_dir, ts,
                            include_barrier=uses_barrier(
                                cfg.constraint.kind))
    out = args.out or os.path.join(args.run_dir, "policy.nlbac")
    export_policy(cfg, ts, out, deterministic=not args.stochastic,
                  batch=args.batch)
    print(f"exported {args.preset} policy "
          f"({'stochastic' if args.stochastic else 'deterministic'}, "
          f"batch={'symbolic' if args.batch is None else args.batch}) "
          f"-> {out} (+{_MANIFEST_SUFFIX})")


if __name__ == "__main__":
    main()
