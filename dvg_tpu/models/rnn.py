"""Recurrent latent predictors: lstm / gru / rnn / gaussian_lstm.

Behavioral parity with /root/reference/models/lstm.py:
  * `lstm` (lstm.py:42-72): Linear embed → n_layers stacked LSTMCells →
    Linear + Tanh output. Only the embed/output Linears get the N(0, 0.02)
    init (utils.py:304-311 matches on 'Linear'/'Conv' classnames only);
    cell weights keep torch's default U(-1/sqrt(H), 1/sqrt(H)).
  * `gru` (lstm.py:75-104) and `rnn` (lstm.py:107-136): same wrapper around
    GRU/vanilla-tanh cells. Unused by the reference drivers, shipped for
    capability parity.
  * `gaussian_lstm` (lstm.py:140-175): LSTM trunk + mu/logvar heads +
    reparameterized sample, returning (z, mu, logvar).

The reference mutates `self.hidden` and re-creates it per sequence
(lstm.py:21-27, train.py:206). Here hidden state is an explicit value —
`*_hidden_init` builds the per-sequence zero state and `*_apply` returns the
next state — so a rollout is `lax.scan(step, hidden0, xs)` with the state as
carry, and batching over 100 futures is a plain `vmap` over the carry.

Cell math follows the torch cell definitions (gate order i, f, g, o for LSTM)
so numerics match a faithful port even though weights are stored fused
(in_dim, 4H) for one MXU matmul per cell step.
"""

from __future__ import annotations

import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from dvg_tpu.models import layers as L


def _cell_uniform(key, shape, hidden_size):
    bound = 1.0 / math.sqrt(hidden_size)
    return jax.random.uniform(key, shape, jnp.float32, -bound, bound)


# ---------------------------------------------------------------------------
# cells
# ---------------------------------------------------------------------------

def lstm_cell_init(key, in_dim: int, hidden: int) -> Dict:
    k = jax.random.split(key, 4)
    return {
        "w_ih": _cell_uniform(k[0], (in_dim, 4 * hidden), hidden),
        "w_hh": _cell_uniform(k[1], (hidden, 4 * hidden), hidden),
        "b_ih": _cell_uniform(k[2], (4 * hidden,), hidden),
        "b_hh": _cell_uniform(k[3], (4 * hidden,), hidden),
    }


def lstm_cell_apply(p, x, state):
    h, c = state
    at = L.acc_type(x.dtype)
    gates = (jnp.dot(x, p["w_ih"], preferred_element_type=at)
             + jnp.dot(h, p["w_hh"], preferred_element_type=at)
             + p["b_ih"] + p["b_hh"]).astype(x.dtype)
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
    g = jnp.tanh(g)
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    return h_new, (h_new, c_new)


def gru_cell_init(key, in_dim: int, hidden: int) -> Dict:
    k = jax.random.split(key, 4)
    return {
        "w_ih": _cell_uniform(k[0], (in_dim, 3 * hidden), hidden),
        "w_hh": _cell_uniform(k[1], (hidden, 3 * hidden), hidden),
        "b_ih": _cell_uniform(k[2], (3 * hidden,), hidden),
        "b_hh": _cell_uniform(k[3], (3 * hidden,), hidden),
    }


def gru_cell_apply(p, x, h):
    at = L.acc_type(x.dtype)
    gi = (jnp.dot(x, p["w_ih"], preferred_element_type=at)
          + p["b_ih"]).astype(x.dtype)
    gh = (jnp.dot(h, p["w_hh"], preferred_element_type=at)
          + p["b_hh"]).astype(x.dtype)
    i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
    h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
    r = jax.nn.sigmoid(i_r + h_r)
    z = jax.nn.sigmoid(i_z + h_z)
    n = jnp.tanh(i_n + r * h_n)
    h_new = (1.0 - z) * n + z * h
    return h_new, h_new


def rnn_cell_init(key, in_dim: int, hidden: int) -> Dict:
    k = jax.random.split(key, 4)
    return {
        "w_ih": _cell_uniform(k[0], (in_dim, hidden), hidden),
        "w_hh": _cell_uniform(k[1], (hidden, hidden), hidden),
        "b_ih": _cell_uniform(k[2], (hidden,), hidden),
        "b_hh": _cell_uniform(k[3], (hidden,), hidden),
    }


def rnn_cell_apply(p, x, h):
    at = L.acc_type(x.dtype)
    h_new = jnp.tanh(jnp.dot(x, p["w_ih"], preferred_element_type=at)
                     + p["b_ih"]
                     + jnp.dot(h, p["w_hh"], preferred_element_type=at)
                     + p["b_hh"]).astype(x.dtype)
    return h_new, h_new


# ---------------------------------------------------------------------------
# the `lstm` predictor (embed → stacked cells → Linear+Tanh)
# ---------------------------------------------------------------------------

def lstm_init(key, input_size: int, output_size: int, hidden_size: int,
              n_layers: int) -> Dict:
    keys = jax.random.split(key, n_layers + 2)
    return {
        "embed": L.linear_init(keys[0], input_size, hidden_size),
        "cells": [lstm_cell_init(k, hidden_size, hidden_size)
                  for k in keys[1:-1]],
        "output": L.linear_init(keys[-1], hidden_size, output_size),
    }


def lstm_hidden_init(batch_size: int, hidden_size: int, n_layers: int,
                     dtype=jnp.float32) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-sequence zero state (reference lstm.py:21-27): (h, c) stacked
    over layers as (n_layers, B, H) arrays — a clean scan carry."""
    z = jnp.zeros((n_layers, batch_size, hidden_size), dtype)
    return (z, z)


def lstm_apply(params, hidden, x):
    """One step. x: (B, input_size) → (out: (B, output_size), new hidden)."""
    h_stack, c_stack = hidden
    h_in = L.linear_apply(params["embed"], x)
    hs, cs = [], []
    for i, cell in enumerate(params["cells"]):
        h_in, (h_new, c_new) = lstm_cell_apply(cell, h_in,
                                               (h_stack[i], c_stack[i]))
        hs.append(h_new)
        cs.append(c_new)
    out = jnp.tanh(L.linear_apply(params["output"], h_in))
    return out, (jnp.stack(hs), jnp.stack(cs))


# ---------------------------------------------------------------------------
# gru / rnn predictors (reference lstm.py:75-136)
# ---------------------------------------------------------------------------

def gru_init(key, input_size, output_size, hidden_size, n_layers) -> Dict:
    keys = jax.random.split(key, n_layers + 2)
    return {
        "embed": L.linear_init(keys[0], input_size, hidden_size),
        "cells": [gru_cell_init(k, hidden_size, hidden_size)
                  for k in keys[1:-1]],
        "output": L.linear_init(keys[-1], hidden_size, output_size),
    }


def gru_hidden_init(batch_size: int, hidden_size: int, n_layers: int,
                    dtype=jnp.float32) -> jnp.ndarray:
    """Per-sequence zero state — same dtype contract as lstm_hidden_init
    (callers thread the rollout compute dtype, e.g. rollout.py:100)."""
    return jnp.zeros((n_layers, batch_size, hidden_size), dtype)


def gru_apply(params, hidden, x):
    h_in = L.linear_apply(params["embed"], x)
    hs = []
    for i, cell in enumerate(params["cells"]):
        h_in, h_new = gru_cell_apply(cell, h_in, hidden[i])
        hs.append(h_new)
    out = jnp.tanh(L.linear_apply(params["output"], h_in))
    return out, jnp.stack(hs)


def rnn_init(key, input_size, output_size, hidden_size, n_layers) -> Dict:
    keys = jax.random.split(key, n_layers + 2)
    return {
        "embed": L.linear_init(keys[0], input_size, hidden_size),
        "cells": [rnn_cell_init(k, hidden_size, hidden_size)
                  for k in keys[1:-1]],
        "output": L.linear_init(keys[-1], hidden_size, output_size),
    }


rnn_hidden_init = gru_hidden_init


def rnn_apply(params, hidden, x):
    h_in = L.linear_apply(params["embed"], x)
    hs = []
    for i, cell in enumerate(params["cells"]):
        h_in, h_new = rnn_cell_apply(cell, h_in, hidden[i])
        hs.append(h_new)
    out = jnp.tanh(L.linear_apply(params["output"], h_in))
    return out, jnp.stack(hs)


# ---------------------------------------------------------------------------
# gaussian_lstm (reference lstm.py:140-175)
# ---------------------------------------------------------------------------

def gaussian_lstm_init(key, input_size, output_size, hidden_size,
                       n_layers) -> Dict:
    keys = jax.random.split(key, n_layers + 3)
    return {
        "embed": L.linear_init(keys[0], input_size, hidden_size),
        "cells": [lstm_cell_init(k, hidden_size, hidden_size)
                  for k in keys[1:-2]],
        "mu": L.linear_init(keys[-2], hidden_size, output_size),
        "logvar": L.linear_init(keys[-1], hidden_size, output_size),
    }


gaussian_lstm_hidden_init = lstm_hidden_init


def gaussian_lstm_apply(params, hidden, x, rng):
    h_stack, c_stack = hidden
    h_in = L.linear_apply(params["embed"], x)
    hs, cs = [], []
    for i, cell in enumerate(params["cells"]):
        h_in, (h_new, c_new) = lstm_cell_apply(cell, h_in,
                                               (h_stack[i], c_stack[i]))
        hs.append(h_new)
        cs.append(c_new)
    mu = L.linear_apply(params["mu"], h_in)
    logvar = L.linear_apply(params["logvar"], h_in)
    eps = jax.random.normal(rng, mu.shape, mu.dtype)
    z = mu + jnp.exp(0.5 * logvar) * eps
    return (z, mu, logvar), (jnp.stack(hs), jnp.stack(cs))
