"""Encoder-decoder transformer with teacher forcing (reference:
models/transformer/Transformer.py, deprecated per README but still wired in
train.py:303-318).

Decoder input = target sin/cos angles shifted right one step with an SOS row
of -0.1, NaN (missing residue) entries replaced by the missing-coord filler 0
(Transformer.py:34,58-66). Three decode modes:

* ``forward_tf``: complete teacher forcing, one decoder pass under a causal
  mask (Transformer.py:42-52).
* ``__call__``: with probability ``fraction_complete_tf`` use full TF;
  otherwise run scheduled sampling, where each timestep's input is replaced
  by the model's own previous prediction with probability
  1 - ``fraction_subseq_tf`` (Transformer.py:69-100). The reference's
  per-timestep Python loop re-decodes a growing prefix; here each step
  decodes the full padded length under the causal mask (identical outputs for
  positions < t) inside ``lax.scan``, keeping shapes static for XLA.
* ``predict``: fully autoregressive decoding (Transformer.py:125-154).

Deviation from the reference (documented): the reference's scheduled-sampling
path returns only L-1 positions (Transformer.py:100), which cannot be
compared against L-length targets; we return all L positions from a final
full-length decode. The reference's target-padding mask compares float angle
rows against the integer pad id (Transformer.py:49), which is vacuously true;
we use the causal mask alone, which is equivalent.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from protein_transformer_tpu.models.encoder_only import angle_mean_bias_init
from protein_transformer_tpu.models.transformer import Decoder, Encoder
from protein_transformer_tpu.protein.constants import NUM_PREDICTED_ANGLES

SOS_VALUE = -0.1
MISSING_COORD_FILLER = 0.0


class Transformer(nn.Module):
    """'enc-dec' model family."""
    n_enc_layers: int
    n_dec_layers: int
    n_heads: int
    d_model: int
    d_ff: int
    max_len: int
    vocab_size: int
    angle_means: tuple
    dropout: float = 0.1
    pad_id: int = 20
    prenorm: bool = True
    dtype: jnp.dtype = jnp.float32
    fraction_complete_tf: float = 1.0
    fraction_subseq_tf: float = 1.0
    # decoder attention is causal/cross (flash-ineligible); the flag only
    # affects the encoder's key-padding self-attention
    attn_impl: str = "xla"

    def setup(self):
        self.encoder = Encoder(self.vocab_size, self.d_model, self.d_ff,
                               self.n_heads, self.n_enc_layers, self.max_len,
                               self.dropout, self.prenorm, self.dtype,
                               self.attn_impl)
        self.decoder = Decoder(NUM_PREDICTED_ANGLES * 2, self.d_model,
                               self.d_ff, self.n_heads, self.n_dec_layers,
                               self.max_len, self.dropout, self.prenorm,
                               self.dtype)
        # Xavier with tiny gain on the kernel, angle-mean bias
        # (Transformer.py:104-113; the reference enc-dec uses raw angle means
        # as bias even though a tanh follows).
        self.output_projection = nn.Dense(
            NUM_PREDICTED_ANGLES * 2,
            kernel_init=nn.initializers.variance_scaling(
                1e-10, "fan_avg", "uniform"),
            bias_init=angle_mean_bias_init(self.angle_means, use_tanh=False))

    def _masks(self, ids):
        src_mask = (ids != self.pad_id)[:, None, None, :]
        l = ids.shape[1]
        causal = jnp.tril(jnp.ones((l, l), bool))[None, None]
        return src_mask, causal

    def _shift_right(self, tgt):
        tgt = jnp.nan_to_num(tgt, nan=MISSING_COORD_FILLER)
        shifted = jnp.roll(tgt, 1, axis=1)
        return shifted.at[:, 0, :].set(SOS_VALUE)

    def _decode(self, dec_input, enc_out, causal, src_mask, deterministic):
        out = self.decoder(dec_input, enc_out, causal, src_mask, deterministic)
        return jnp.tanh(self.output_projection(out.astype(jnp.float32)))

    def forward_tf(self, ids, tgt_angles, deterministic: bool = True):
        src_mask, causal = self._masks(ids)
        enc_out = self.encoder(ids, src_mask, deterministic)
        dec_input = self._shift_right(tgt_angles)
        return self._decode(dec_input, enc_out, causal, src_mask, deterministic)

    def __call__(self, ids, tgt_angles, deterministic: bool = True):
        if self.fraction_complete_tf >= 1.0 or self.fraction_subseq_tf >= 1.0:
            return self.forward_tf(ids, tgt_angles, deterministic)

        use_full_tf = jax.random.bernoulli(
            self.make_rng("sampling"), self.fraction_complete_tf)
        full = self.forward_tf(ids, tgt_angles, deterministic)
        sampled = self._scheduled_sampling(ids, tgt_angles, deterministic)
        return jnp.where(use_full_tf, full, sampled)

    def _scheduled_sampling(self, ids, tgt_angles, deterministic):
        src_mask, causal = self._masks(ids)
        enc_out = self.encoder(ids, src_mask, deterministic)
        work = self._shift_right(tgt_angles)
        l = ids.shape[1]
        feed_pred = jax.random.uniform(
            self.make_rng("sampling"), (l,)) > self.fraction_subseq_tf

        def step(work_t, t):
            out = self._decode(work_t, enc_out, causal, src_mask,
                               deterministic)
            pred_t = out[:, t - 1]
            new_row = jnp.where(feed_pred[t], pred_t, work_t[:, t])
            work_t = jax.lax.dynamic_update_slice_in_dim(
                work_t, new_row[:, None], t, axis=1)
            return work_t, None

        # scan over timesteps 1..L-1 (Transformer.py:84-98)
        work, _ = jax.lax.scan(step, work, jnp.arange(1, l))
        return self._decode(work, enc_out, causal, src_mask, deterministic)

    def predict(self, ids):
        src_mask, causal = self._masks(ids)
        enc_out = self.encoder(ids, src_mask, True)
        b, l = ids.shape
        work = jnp.full((b, l, NUM_PREDICTED_ANGLES * 2), SOS_VALUE,
                        jnp.float32)

        def step(work_t, t):
            out = self._decode(work_t, enc_out, causal, src_mask, True)
            work_t = jax.lax.dynamic_update_slice_in_dim(
                work_t, out[:, t - 1][:, None], t, axis=1)
            return work_t, None

        work, _ = jax.lax.scan(step, work, jnp.arange(1, l))
        return self._decode(work, enc_out, causal, src_mask, True)
