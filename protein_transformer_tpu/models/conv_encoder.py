"""Convolutional encoder model (reference: models/convolutional_encoder.py).

'conv-enc' family: up-to-3 length-preserving odd-kernel 1-D convolutions
between the (optional) embedding and the attention stack, with per-layer
channel reduction factors. Channel-dim bookkeeping mirrors the reference
exactly (convolutional_encoder.py:84-104): layer i maps din -> int(din //
reduction_i), except the last layer maps to d_model when
``conv_out_matches_dm``; ``conv_out_size`` uses repeated true division. When
no embedding is used, the input is a one-hot encoding and the positional
encoding is applied *after* the convolutions (convolutional_encoder.py:106-119).

TPU note: flax convolutions are feature-last (NLC), so no transposes are
needed around the conv stack, unlike the torch NCL layout.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from protein_transformer_tpu.models.encoder_only import AngleProjection
from protein_transformer_tpu.models.transformer import (
    Embeddings, EncoderLayer, PositionalEncoding)


def conv_out_size(d_model: int, d_in: int, use_embedding: bool,
                  conv_dim_reductions: Sequence[float],
                  conv_out_matches_dm: bool) -> int:
    """Channel count entering the attention stack
    (convolutional_encoder.py:84-90)."""
    if conv_out_matches_dm:
        return d_model
    d = float(d_model if use_embedding else d_in)
    for dr in conv_dim_reductions:
        d /= dr
    return int(d)


def conv_layer_dims(d_model: int, d_in: int, use_embedding: bool,
                    conv_kernel_sizes: Sequence[int],
                    conv_dim_reductions: Sequence[float],
                    conv_out_matches_dm: bool) -> list[tuple[int, int, int]]:
    """(kernel, din, dout) per conv layer (convolutional_encoder.py:92-104)."""
    dims = []
    din = d_model if use_embedding else d_in
    n = len(conv_kernel_sizes)
    for i, (k, dr) in enumerate(zip(conv_kernel_sizes, conv_dim_reductions)):
        if i == n - 1 and conv_out_matches_dm:
            dout = d_model
        else:
            dout = int(din // dr)
        dims.append((k, din, dout))
        din = dout
    return dims


class ConvEncoderOnlyTransformer(nn.Module):
    """'conv-enc' model family (conv-enc|k1,k2,k3|r1,r2,r3 spec sugar)."""
    n_layers: int
    n_heads: int
    d_model: int
    d_ff: int
    max_len: int
    vocab_size: int
    angle_means: tuple
    conv_kernel_sizes: tuple
    conv_dim_reductions: tuple
    use_tanh_out: bool = True
    use_embedding: bool = True
    conv_out_matches_dm: bool = True
    dropout: float = 0.1
    pad_id: int = 20
    prenorm: bool = True
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "xla"

    @nn.compact
    def __call__(self, ids, dec_input=None, deterministic: bool = True):
        mask = (ids != self.pad_id)[:, None, None, :]
        d_attn = conv_out_size(self.d_model, self.vocab_size,
                               self.use_embedding, self.conv_dim_reductions,
                               self.conv_out_matches_dm)

        if self.use_embedding:
            x = Embeddings(self.vocab_size, self.d_model, self.dtype)(ids)
            pe = PositionalEncoding(self.d_model, self.max_len, self.dropout,
                                    self.dtype)
            # Reference quirk: x + PE(x) (PE itself returns x + pe), then
            # dropout (convolutional_encoder.py:107-109).
            x = nn.Dropout(self.dropout)(x + pe(x, deterministic),
                                         deterministic=deterministic)
        else:
            x = jnp.eye(self.vocab_size, dtype=self.dtype)[ids]

        for k, _din, dout in conv_layer_dims(
                self.d_model, self.vocab_size, self.use_embedding,
                self.conv_kernel_sizes, self.conv_dim_reductions,
                self.conv_out_matches_dm):
            assert k % 2 == 1, "kernel size must be odd to preserve length"
            x = nn.Conv(dout, (k,), padding="SAME", dtype=self.dtype,
                        kernel_init=nn.initializers.xavier_uniform())(x)

        if not self.use_embedding:
            pe = PositionalEncoding(d_attn, self.max_len, self.dropout,
                                    self.dtype)
            x = x + pe(x, deterministic)

        for _ in range(self.n_layers):
            x = EncoderLayer(d_attn, self.d_ff, self.n_heads, self.dropout,
                             self.prenorm, self.dtype,
                             self.attn_impl)(x, mask, deterministic)
        return AngleProjection(tuple(self.angle_means), self.use_tanh_out)(x)

    def predict(self, ids):
        return self(ids, deterministic=True)
