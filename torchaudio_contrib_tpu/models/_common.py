"""Shared parameter-init and normalization helpers for the model zoo.

Single source for the Glorot-uniform dense/conv initializers and the
parametrized last-axis layernorm that every ``models/`` module uses —
previously copy-pasted per file, so an eps or init-scale fix had to be
applied eight times.  Semantics are pinned by each model's own tests
(sharded-vs-replicated equality, grad coverage, overfit runs).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

__all__ = ["_dense", "_conv", "_ln", "_ln_p"]


def _dense(key, cin, cout):
    """Glorot-uniform (cin, cout) dense kernel."""
    s = math.sqrt(6.0 / (cin + cout))
    return jax.random.uniform(key, (cin, cout), jnp.float32, -s, s)


def _conv(key, k, cin, cout):
    """Glorot-uniform (k, cin, cout) 1-D conv kernel (TIO layout)."""
    s = math.sqrt(6.0 / (k * cin + k * cout))
    return jax.random.uniform(key, (k, cin, cout), jnp.float32, -s, s)


def _ln(x, p):
    """LayerNorm over the last axis with ``{"g", "b"}`` params."""
    mu = jnp.mean(x, -1, keepdims=True)
    var = jnp.var(x, -1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + 1e-5) * p["g"] + p["b"]


def _ln_p(d):
    """Identity-init layernorm params for feature width ``d``."""
    return {"g": jnp.ones((d,)), "b": jnp.zeros((d,))}
