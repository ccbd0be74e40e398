"""Flax IV-surface network.

Rebuilds ImprovedIVNetwork (NN_training_stock_iv.py:109-155): 2 -> hidden
projection, ``num_hidden_layers`` residual blocks of
Dense -> LayerNorm -> GELU -> Dropout, linear head, output floored at
``epsilon``. The output bias is initialized to the target-mean IV by the
trainer (reference :487-492).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from options_model_tpu.core.config import SurfaceTrainConfig


class IVNetwork(nn.Module):
    hidden_dim: int = 64
    num_hidden_layers: int = 4
    dropout: float = 0.1
    epsilon: float = 1e-4

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        h = nn.gelu(nn.Dense(self.hidden_dim)(x))
        for _ in range(self.num_hidden_layers):
            b = nn.Dense(self.hidden_dim)(h)
            b = nn.LayerNorm()(b)
            b = nn.gelu(b)
            if self.dropout > 0:
                b = nn.Dropout(self.dropout, deterministic=deterministic)(b)
            h = h + b
        out = nn.Dense(1, name="head")(h)
        return jnp.maximum(out, self.epsilon)


def make_network(cfg: SurfaceTrainConfig) -> IVNetwork:
    return IVNetwork(hidden_dim=cfg.hidden_dim,
                     num_hidden_layers=cfg.num_hidden_layers,
                     dropout=cfg.dropout, epsilon=cfg.epsilon)


def init_params(cfg: SurfaceTrainConfig, key: jax.Array, target_mean_iv: float):
    """Init with output bias = mean target IV (NN_training_stock_iv.py:487-492)."""
    net = make_network(cfg)
    params = net.init(key, jnp.zeros((1, 2)), deterministic=True)
    params = jax.tree_util.tree_map(lambda x: x, params)  # unfreeze-safe copy
    params["params"]["head"]["bias"] = (
        params["params"]["head"]["bias"] + jnp.asarray(target_mean_iv, jnp.float32))
    return params
