"""Encoder-only sequence->angles model (reference: models/encoder_only.py).

Signature parity with EncoderOnlyTransformer (encoder_only.py:10-45):
embed -> PE -> N pre-LN encoder layers -> Linear(dm -> 24) -> tanh (optional).
The output head starts at the dataset's mean angles: zero kernel and
arctanh(angle_means) bias (encoder_only.py:24-34), so the untrained model
predicts the mean structure.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from protein_transformer_tpu.models.transformer import Encoder
from protein_transformer_tpu.protein.constants import NUM_PREDICTED_ANGLES


def angle_mean_bias_init(angle_means, use_tanh: bool):
    """Output-head bias init: arctanh(angle_means) when a tanh follows."""
    am = np.asarray(angle_means, np.float32)
    if use_tanh:
        am = np.arctanh(np.clip(am, -1 + 1e-7, 1 - 1e-7))

    def init(key, shape, dtype=jnp.float32):
        assert shape == am.shape, (shape, am.shape)
        return jnp.asarray(am, dtype)

    return init


class AngleProjection(nn.Module):
    """Zero-kernel output head with angle-mean bias + optional tanh.

    Always computes in float32 regardless of the trunk dtype: the angle
    head feeds the geometric losses, which need full precision.
    """
    angle_means: tuple
    use_tanh_out: bool = True

    @nn.compact
    def __call__(self, x):
        x = x.astype(jnp.float32)
        out = nn.Dense(
            NUM_PREDICTED_ANGLES * 2,
            kernel_init=nn.initializers.zeros,
            bias_init=angle_mean_bias_init(self.angle_means,
                                           self.use_tanh_out),
            name="output_projection")(x)
        if self.use_tanh_out:
            out = jnp.tanh(out)
        return out


class EncoderOnlyTransformer(nn.Module):
    """'enc-only' model family (also 'enc-only-linear-out' via use_tanh_out)."""
    n_layers: int
    n_heads: int
    d_model: int
    d_ff: int
    max_len: int
    vocab_size: int
    angle_means: tuple
    use_tanh_out: bool = True
    dropout: float = 0.1
    pad_id: int = 20
    prenorm: bool = True
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "xla"

    @nn.compact
    def __call__(self, ids, dec_input=None, deterministic: bool = True):
        # src mask shaped (B, 1, 1, L): broadcasts over heads and query
        # positions, masking attention *keys* at padding
        # (encoder_only.py:37, Attention.py:60-62).
        mask = (ids != self.pad_id)[:, None, None, :]
        x = Encoder(self.vocab_size, self.d_model, self.d_ff, self.n_heads,
                    self.n_layers, self.max_len, self.dropout,
                    self.prenorm, self.dtype,
                    self.attn_impl)(ids, mask, deterministic)
        return AngleProjection(tuple(self.angle_means), self.use_tanh_out)(x)

    def predict(self, ids):
        return self(ids, deterministic=True)
