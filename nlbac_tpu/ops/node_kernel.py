"""Pallas TPU kernel: fused control-affine NODE Euler step.

The hot op of the framework is the NODE vector-field evaluation
x' = x + dt * (f(x) + g(x) u): a 5-matmul f_net and a 4-matmul g_net of
width 100 over batches up to 32768, evaluated on every gradient update
(constraint rollouts) and every NODE fit (SURVEY.md §7 item 1).

This kernel fuses ALL layers of both MLPs plus the g·u contraction and
the Euler update into a single pallas_call: the batch tile stays resident
in VMEM across the nine matmuls, so HBM traffic is one read of x,u and
one write of x' instead of 11 intermediate round-trips.  Weights are
zero-padded once to MXU-aligned (128, 128) tiles; padding is exact
(padded input lanes are zero and padded weight rows are zero).

Gradients: ``fused_euler_step`` carries a custom VJP whose backward
re-evaluates the mathematically identical pure-JAX field under jax.vjp —
training numerics are bit-equal to the reference path while the forward
(rollout/eval/serving) takes the fused kernel.

Enable via NodeConfig(use_pallas=True); requires form='control_affine'.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp

from nlbac_tpu.config import NodeConfig

LANES = 128
TILE_B = 256


def _pad2(w):
    out = jnp.zeros((LANES, LANES), w.dtype)
    return out.at[:w.shape[0], :w.shape[1]].set(w)


def _pad1(b):
    out = jnp.zeros((1, LANES), b.dtype)
    return out.at[0, :b.shape[0]].set(b)


def pack_params(cfg: NodeConfig, params) -> dict:
    """Zero-pad every layer of f_net/g_net to (128,128)/(1,128) and stack
    per-net so the kernel indexes layers by leading axis."""
    fw = jnp.stack([_pad2(w) for w in params["f"]["w"]])
    fb = jnp.stack([_pad1(b) for b in params["f"]["b"]])
    gw = jnp.stack([_pad2(w) for w in params["g"]["w"]])
    gb = jnp.stack([_pad1(b) for b in params["g"]["b"]])
    return {"fw": fw, "fb": fb, "gw": gw, "gb": gb}


def _kernel(n_s: int, n_u: int, n_f: int, n_g: int, dt: float,
            x_ref, fw_ref, fb_ref, gw_ref, gb_ref, out_ref):
    """One batch tile: x_ref (TILE_B, 128) carries [x | u | 0...]."""
    xin = x_ref[:]

    def run_net(wref, bref, n_layers):
        h = xin
        for i in range(n_layers):
            h = jnp.dot(h, wref[i], preferred_element_type=jnp.float32)
            h = h + bref[i]
            if i < n_layers - 1:
                h = jnp.maximum(h, 0.0)
        return h

    f_out = run_net(fw_ref, fb_ref, n_f)  # lanes [0, n_s) valid
    g_out = run_net(gw_ref, gb_ref, n_g)  # lanes [0, n_s*n_u) valid

    # g(x) @ u with static lane slices (n_s * n_u <= 12 of them):
    # dx_j += g[:, j*n_u + k] * u_k, u_k living in input lane n_s + k.
    col = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    dx = f_out
    for j in range(n_s):
        acc = jnp.zeros((xin.shape[0], 1), jnp.float32)
        for k in range(n_u):
            u_k = xin[:, n_s + k][:, None]  # (TILE_B, 1)
            g_jk = g_out[:, j * n_u + k][:, None]
            acc = acc + g_jk * u_k
        dx = dx + jnp.where(col == j, acc, 0.0)

    # Euler step on the state lanes; control lanes pass through unchanged
    # (ZOH control, zero derivative — model.py:208-217 semantics).
    state_mask = col < n_s
    out_ref[:] = jnp.where(state_mask, xin + dt * dx, xin)


def fused_field_euler_raw(cfg: NodeConfig, packed, xu_padded, dt: float):
    """pallas_call over batch tiles. xu_padded: (B, 128) with B a multiple
    of TILE_B; returns the stepped padded state."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B = xu_padded.shape[0]
    n_f = packed["fw"].shape[0]
    n_g = packed["gw"].shape[0]
    kern = functools.partial(_kernel, cfg.state_dim, cfg.action_dim,
                             n_f, n_g, dt)
    grid = (B // TILE_B,)
    flops = 2 * B * LANES * LANES * (n_f + n_g)
    interpret = jax.default_backend() != "tpu"  # CPU tests run interpreted
    return pl.pallas_call(
        kern,
        interpret=interpret,
        out_shape=jax.ShapeDtypeStruct((B, LANES), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((TILE_B, LANES), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n_f, LANES, LANES), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n_f, 1, LANES), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n_g, LANES, LANES), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n_g, 1, LANES), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TILE_B, LANES), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=2 * B * LANES * 4,
            transcendentals=0),
    )(xu_padded, packed["fw"], packed["fb"], packed["gw"], packed["gb"])


def _reference_step(cfg: NodeConfig, params, x, u, dt):
    from nlbac_tpu.nn.node import make_field, pack_input
    field = make_field(cfg)
    s = pack_input(cfg, x, u)
    return (s + dt * field(params, 0.0, s))[..., :cfg.state_dim]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 4))
def fused_euler_step(cfg: NodeConfig, params, x, u, dt: float):
    """x_{t+1} = x + dt (f(x) + g(x) u), fused on TPU via Pallas.

    x: (B, state_dim), u: (B, action_dim) -> (B, state_dim).
    Forward runs the fused kernel; backward differentiates the identical
    pure-JAX computation."""
    B = x.shape[0]
    pad_b = (-B) % TILE_B
    xu = jnp.zeros((B + pad_b, LANES), jnp.float32)
    xu = xu.at[:B, :cfg.state_dim].set(x)
    xu = xu.at[:B, cfg.state_dim:cfg.state_dim + cfg.action_dim].set(u)
    packed = pack_params(cfg, params)
    out = fused_field_euler_raw(cfg, packed, xu, dt)
    return out[:B, :cfg.state_dim]


def _fwd(cfg, params, x, u, dt):
    return fused_euler_step(cfg, params, x, u, dt), (params, x, u)


def _bwd(cfg, dt, res, g):
    params, x, u = res
    _, vjp = jax.vjp(lambda p, xx, uu: _reference_step(cfg, p, xx, uu, dt),
                     params, x, u)
    return vjp(g)


fused_euler_step.defvjp(_fwd, _bwd)
