"""Transformer building blocks (Flax Linen).

TPU-native counterparts of the reference's encoder stack (reference:
models/transformer/{Encoder,Attention,Sublayers}.py). Architectural parity:

* scaled embeddings (x sqrt(dm)) + sinusoidal positional encoding, with the
  reference's additive quirk preserved: the input to the first layer is
  ``dropout(x + dropout(x + pe))`` -- i.e. the embedding is added twice at
  eval time -- because PositionalEncoding itself returns x + pe
  (Sublayers.py:58-62) and the encoder adds it to x again (Encoder.py:31).
* pre-LN residual sublayers with NO final layer norm after the stack
  (Sublayers.py:5-17, Encoder.py:28-33); optional post-LN variant
  (the reference exposes a --postnorm flag, train.py:489-491).
* multi-head attention with mask -> -inf before softmax and dropout on the
  attention probabilities (Attention.py:5-69).

All modules accept a ``dtype`` (activation/computation dtype): bfloat16
feeds the MXU at full rate while parameters stay float32 (flax param_dtype).
Softmax and layer norm stay in float32 for stability; the reference is
float32 throughout (torch default), so parity testing uses float32.
"""
from __future__ import annotations

from typing import Callable

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def sinusoidal_positions(max_len: int, dim: int) -> np.ndarray:
    """Precomputed sinusoidal positional encodings (Sublayers.py:48-57)."""
    pe = np.zeros((max_len, dim), np.float32)
    position = np.arange(max_len, dtype=np.float32)[:, None]
    div = np.exp(np.arange(0, dim, 2, dtype=np.float32)
                 * -(np.log(10000.0) / dim))
    pe[:, 0::2] = np.sin(position * div)
    pe[:, 1::2] = np.cos(position * div[: pe[:, 1::2].shape[1]])
    return pe


class PositionalEncoding(nn.Module):
    """Returns dropout(x + pe), matching Sublayers.PositionalEncoding."""
    dim: int
    max_len: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        pe = jnp.asarray(sinusoidal_positions(self.max_len, self.dim),
                         self.dtype)
        out = x + pe[None, : x.shape[1], :]
        return nn.Dropout(self.dropout)(out, deterministic=deterministic)


class Embeddings(nn.Module):
    """Scaled token embedding (Sublayers.py:65-72)."""
    vocab_size: int
    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, ids):
        emb = nn.Embed(self.vocab_size, self.dim, dtype=self.dtype,
                       embedding_init=nn.initializers.xavier_uniform())(ids)
        return emb * jnp.sqrt(jnp.asarray(self.dim, emb.dtype))


class MultiHeadedAttention(nn.Module):
    """Multi-head attention (Attention.py:24-69).

    mask: broadcastable to (B, 1, Lq, Lk); masked positions get -inf scores.

    impl: 'xla' materializes the (B, H, Lq, Lk) probs (reference
    semantics, required when dropout hits the probs); 'flash' routes
    key-padding-masked self-attention with no probs dropout (any
    deterministic call, or dropout == 0) through the Pallas TPU flash
    kernel (ops/attention.py) and silently falls back to 'xla' anywhere
    else -- so a single setting is safe for a whole model.
    """
    dim: int
    n_heads: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32
    impl: str = "xla"

    @nn.compact
    def __call__(self, q_in, k_in, v_in, mask=None, deterministic=True):
        assert self.dim % self.n_heads == 0
        dk = self.dim // self.n_heads
        dense = lambda name: nn.Dense(
            self.dim, dtype=self.dtype,
            kernel_init=nn.initializers.xavier_uniform(), name=name)
        q, k, v = dense("wq")(q_in), dense("wk")(k_in), dense("wv")(v_in)

        def split(x):
            b, l, _ = x.shape
            return x.reshape(b, l, self.n_heads, dk).transpose(0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)
        if (self.impl == "flash"
                and (deterministic or self.dropout == 0.0)
                and mask is not None and getattr(mask, "ndim", 0) == 4
                and mask.shape[1] == 1 and mask.shape[2] == 1
                and q_in is k_in):
            from protein_transformer_tpu.ops.attention import (
                flash_available, flash_self_attention)
            if flash_available():
                out = flash_self_attention(
                    q, k, v, mask[:, 0, 0, :],
                    sm_scale=float(1.0 / np.sqrt(dk)))
                b, h, l, _ = out.shape
                out = out.transpose(0, 2, 1, 3).reshape(b, l, self.dim)
                return dense("wo")(out)
        # scores/softmax in float32 for numerical stability
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        scores = scores / jnp.sqrt(jnp.asarray(dk, jnp.float32))
        if mask is not None:
            big_neg = jnp.finfo(jnp.float32).min
            scores = jnp.where(mask, scores, big_neg)
        probs = jax.nn.softmax(scores, axis=-1)
        probs = nn.Dropout(self.dropout)(probs, deterministic=deterministic)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(self.dtype),
                         v.astype(self.dtype))
        b, h, l, _ = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, l, self.dim)
        return dense("wo")(out)


class PositionwiseFeedForward(nn.Module):
    """ReLU MLP with dropout on the hidden layer (Sublayers.py:20-34)."""
    dim: int
    hidden: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True):
        h = nn.Dense(self.hidden, dtype=self.dtype,
                     kernel_init=nn.initializers.xavier_uniform())(x)
        h = nn.Dropout(self.dropout)(nn.relu(h), deterministic=deterministic)
        return nn.Dense(self.dim, dtype=self.dtype,
                        kernel_init=nn.initializers.xavier_uniform())(h)


class SublayerConnection(nn.Module):
    """Residual + layer norm around a sublayer (Sublayers.py:5-17).

    prenorm: x + dropout(f(norm(x)))   [reference default]
    postnorm: norm(x + dropout(f(x)))  [original Transformer figure]
    """
    dim: int
    dropout: float = 0.1
    prenorm: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, sublayer: Callable, deterministic=True):
        drop = nn.Dropout(self.dropout)
        norm = lambda y: nn.LayerNorm(dtype=self.dtype)(y)
        if self.prenorm:
            return x + drop(sublayer(norm(x)), deterministic=deterministic)
        return norm(x + drop(sublayer(x), deterministic=deterministic))


class EncoderLayer(nn.Module):
    """Self-attention + FFN encoder layer (Encoder.py:36-54)."""
    dim: int
    dff: int
    n_heads: int
    dropout: float = 0.1
    prenorm: bool = True
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "xla"

    @nn.compact
    def __call__(self, x, mask, deterministic=True):
        attn = MultiHeadedAttention(self.dim, self.n_heads, self.dropout,
                                    self.dtype, impl=self.attn_impl)
        ff = PositionwiseFeedForward(self.dim, self.dff, self.dropout,
                                     self.dtype)
        sub = lambda: SublayerConnection(self.dim, self.dropout,
                                         self.prenorm, self.dtype)
        x = sub()(x, lambda y: attn(y, y, y, mask, deterministic),
                  deterministic)
        x = sub()(x, lambda y: ff(y, deterministic), deterministic)
        return x


class Encoder(nn.Module):
    """Embedding + PE + N encoder layers (Encoder.py:8-33)."""
    vocab_size: int
    dim: int
    dff: int
    n_heads: int
    n_layers: int
    max_len: int
    dropout: float = 0.1
    prenorm: bool = True
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "xla"

    @nn.compact
    def __call__(self, ids, mask, deterministic=True):
        x = Embeddings(self.vocab_size, self.dim, self.dtype)(ids)
        # Reference quirk: x + PositionalEncoding(x) where PE already adds x
        # (Encoder.py:31) -> embedding enters twice.
        pe = PositionalEncoding(self.dim, self.max_len, self.dropout,
                                self.dtype)
        x = nn.Dropout(self.dropout)(x + pe(x, deterministic),
                                     deterministic=deterministic)
        for _ in range(self.n_layers):
            x = EncoderLayer(self.dim, self.dff, self.n_heads, self.dropout,
                             self.prenorm, self.dtype,
                             self.attn_impl)(x, mask, deterministic)
        return x


class DecoderLayer(nn.Module):
    """Masked self-attn + cross-attn + FFN (Decoder.py:36-55)."""
    dim: int
    dff: int
    n_heads: int
    dropout: float = 0.1
    prenorm: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, enc_out, tgt_mask, src_mask, deterministic=True):
        self_attn = MultiHeadedAttention(self.dim, self.n_heads, self.dropout,
                                         self.dtype)
        cross_attn = MultiHeadedAttention(self.dim, self.n_heads,
                                          self.dropout, self.dtype)
        ff = PositionwiseFeedForward(self.dim, self.dff, self.dropout,
                                     self.dtype)
        sub = lambda: SublayerConnection(self.dim, self.dropout, self.prenorm,
                                         self.dtype)
        x = sub()(x, lambda y: self_attn(y, y, y, tgt_mask, deterministic),
                  deterministic)
        x = sub()(x, lambda y: cross_attn(y, enc_out, enc_out, src_mask,
                                          deterministic), deterministic)
        x = sub()(x, lambda y: ff(y, deterministic), deterministic)
        return x


class Decoder(nn.Module):
    """Linear input embedding + PE + N decoder layers (Decoder.py:8-33)."""
    d_out: int
    dim: int
    dff: int
    n_heads: int
    n_layers: int
    max_len: int
    dropout: float = 0.1
    prenorm: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tgt, enc_out, tgt_mask, src_mask, deterministic=True):
        x = nn.Dense(self.dim, dtype=self.dtype,
                     kernel_init=nn.initializers.xavier_uniform())(tgt)
        pe = PositionalEncoding(self.dim, self.max_len, self.dropout,
                                self.dtype)
        x = nn.Dropout(self.dropout)(x + pe(x, deterministic),
                                     deterministic=deterministic)
        for _ in range(self.n_layers):
            x = DecoderLayer(self.dim, self.dff, self.n_heads, self.dropout,
                             self.prenorm, self.dtype)(x, enc_out, tgt_mask,
                                                       src_mask,
                                                       deterministic)
        return x
