"""SIREN: sinusoidal representation network (secondary model).

(reference: networks.py:18-118 SineLayer/Siren — first-layer weights
U(-1/in, 1/in), hidden U(-sqrt(6/in)/w0, sqrt(6/in)/w0), activation
sin(w0 (Wx+b)), optional final linear layer.)
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class SirenConfig:
    in_features: int = 2
    hidden_features: int = 256
    hidden_layers: int = 3
    out_features: int = 1
    outermost_linear: bool = True
    first_omega_0: float = 30.0
    hidden_omega_0: float = 30.0


def init_siren(key, cfg: SirenConfig, dtype=jnp.float32):
    layers = []

    def uniform(k, shape, bound):
        return jax.random.uniform(k, shape, dtype, -bound, bound)

    sizes = [cfg.in_features] + [cfg.hidden_features] * (cfg.hidden_layers + 1)
    for i in range(cfg.hidden_layers + 1):
        key, kw, kb = jax.random.split(key, 3)
        fan_in = sizes[i]
        if i == 0:
            bound = 1.0 / fan_in
        else:
            bound = np.sqrt(6.0 / fan_in) / cfg.hidden_omega_0
        W = uniform(kw, (sizes[i + 1], fan_in), bound)
        # torch Linear default bias init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))
        b = uniform(kb, (sizes[i + 1],), 1.0 / np.sqrt(fan_in))
        layers.append({"w": W, "b": b})

    key, kw, kb = jax.random.split(key, 3)
    fan_in = cfg.hidden_features
    bound = np.sqrt(6.0 / fan_in) / cfg.hidden_omega_0
    final = {
        "w": uniform(kw, (cfg.out_features, fan_in), bound),
        "b": uniform(kb, (cfg.out_features,), 1.0 / np.sqrt(fan_in)),
    }
    layers.append(final)
    return {"layers": layers}


def siren_apply(params, x, cfg: SirenConfig):
    layers = params["layers"]
    h = x
    for i, lyr in enumerate(layers):
        pre = h @ lyr["w"].T + lyr["b"]
        is_last = i == len(layers) - 1
        if is_last and cfg.outermost_linear:
            h = pre
        else:
            w0 = cfg.first_omega_0 if i == 0 else cfg.hidden_omega_0
            h = jnp.sin(w0 * pre)
    return h
