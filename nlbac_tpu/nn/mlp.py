"""Minimal pure-functional MLP with Xavier-uniform init.

Parity: the reference initializes every Linear with
``torch.nn.init.xavier_uniform_(w, gain=1)`` and zero bias
(UNI/sac_cbf_clf/model.py:14-17); ``xavier_uniform`` here draws from the
same U(-a, a) with a = sqrt(6 / (fan_in + fan_out)).

Params are plain pytrees: ``{"w": [(in,out) arrays], "b": [(out,) arrays]}``
— no framework lock-in beyond jax.  Weights are stored (in, out) so the hot
path is a single ``x @ w`` that XLA tiles onto the MXU; all math is float32
with an optional bfloat16 compute path for large batches.
"""

from __future__ import annotations

from typing import Callable, List, Sequence

import jax
import jax.numpy as jnp


def xavier_uniform(key, shape, gain: float = 1.0, dtype=jnp.float32):
    fan_in, fan_out = shape[0], shape[1]
    a = gain * jnp.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, minval=-a, maxval=a)


def mlp_init(key, sizes: Sequence[int], dtype=jnp.float32):
    """Initialize an MLP with layer widths ``sizes`` = [in, h1, ..., out]."""
    n = len(sizes) - 1
    keys = jax.random.split(key, n)
    ws = [xavier_uniform(keys[i], (sizes[i], sizes[i + 1]), dtype=dtype)
          for i in range(n)]
    bs = [jnp.zeros((sizes[i + 1],), dtype) for i in range(n)]
    return {"w": ws, "b": bs}


def mlp_apply(params, x, *, activation: Callable = jax.nn.relu,
              final_activation: Callable | None = None,
              compute_dtype=None):
    """Apply the MLP. ReLU between layers, linear (or ``final_activation``)
    output — matching the reference's model zoo throughout."""
    ws, bs = params["w"], params["b"]
    orig_dtype = x.dtype
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
    n = len(ws)
    for i in range(n):
        w, b = ws[i], bs[i]
        if compute_dtype is not None:
            w = w.astype(compute_dtype)
            b = b.astype(compute_dtype)
        x = x @ w + b
        if i < n - 1:
            x = activation(x)
        elif final_activation is not None:
            x = final_activation(x)
    if compute_dtype is not None:
        x = x.astype(orig_dtype)
    return x


def mlp_sizes(in_dim: int, hidden: int, depth: int, out_dim: int) -> List[int]:
    """[in, hidden * depth, out] layer-width helper."""
    return [in_dim] + [hidden] * depth + [out_dim]
