"""Model construction from a training config (reference: train.py:274-338).

Supports the reference's model-name sugar: a 'conv-enc' name may encode its
convolution topology as ``conv-enc|k1,k2,k3|r1,r2,r3`` and a 'linear-out'
substring disables the output tanh (train.py:288,298,323-338,588-600).
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from protein_transformer_tpu.models.conv_encoder import ConvEncoderOnlyTransformer
from protein_transformer_tpu.models.enc_dec import Transformer
from protein_transformer_tpu.models.encoder_only import EncoderOnlyTransformer


def parse_conv_kernel_info_from_model_name(mname: str):
    """'conv-enc|3,7,11|2,2,2' -> ([3, 7, 11], [2.0, 2.0, 2.0]).

    Parity: train.parse_conv_kernel_info_from_model_name (train.py:323-338).
    """
    try:
        _, kernel_sizes, dim_reducs = mname.split("|")
    except ValueError:
        return [], []
    return ([int(k) for k in kernel_sizes.split(",")],
            [float(r) for r in dim_reducs.split(",")])


def resolve_attention_impl(impl: str) -> str:
    """'auto' -> 'xla'. Measured on the real chip (tools/
    bench_attention.py): at this framework's shapes (L <= 500, head dim
    64-128) the Pallas flash kernel is SLOWER than XLA's fused masked
    softmax (eval step 0.7x, op-level fwd 0.45x at B=64 L=500) -- the
    [B,H,L,L] probs it avoids are cheap at these L while its block
    machinery is not. 'flash' stays available explicitly for
    long-context experiments; it is TPU-only (ops/attention.py)."""
    if impl == "auto":
        return "xla"
    return impl


def make_model(cfg, angle_means) -> nn.Module:
    """Build the model requested by cfg (a TrainConfig or equivalent)."""
    name = cfg.model
    use_tanh = "linear-out" not in name
    common = dict(
        n_layers=cfg.n_layers,
        n_heads=cfg.n_heads,
        d_model=cfg.d_model,
        d_ff=cfg.d_ff,
        max_len=cfg.max_seq_len,
        vocab_size=cfg.vocab_size,
        angle_means=tuple(float(a) for a in angle_means),
        dropout=cfg.dropout,
        pad_id=cfg.pad_id,
        prenorm=not cfg.postnorm,
        dtype=jnp.dtype(getattr(cfg, "compute_dtype", "float32")),
        attn_impl=resolve_attention_impl(
            getattr(cfg, "attention_impl", "auto")),
    )
    if name.startswith("enc-only"):
        return EncoderOnlyTransformer(use_tanh_out=use_tanh, **common)
    if "conv-enc" in name:
        kernels, reducs = parse_conv_kernel_info_from_model_name(name)
        if not kernels:
            kernels = [k for k in (cfg.conv1_size, cfg.conv2_size,
                                   cfg.conv3_size) if k]
            reducs = [r for r in (cfg.conv1_reduc, cfg.conv2_reduc,
                                  cfg.conv3_reduc) if r]
        assert len(kernels) <= 3, "at most 3 convolution layers supported"
        return ConvEncoderOnlyTransformer(
            conv_kernel_sizes=tuple(kernels),
            conv_dim_reductions=tuple(reducs),
            use_tanh_out=use_tanh,
            use_embedding=cfg.use_embedding,
            conv_out_matches_dm=cfg.conv_out_matches_dm,
            **common)
    if name == "enc-dec":
        common.pop("n_layers")
        return Transformer(
            n_enc_layers=cfg.n_layers,
            n_dec_layers=cfg.n_layers,
            fraction_complete_tf=cfg.fraction_complete_tf,
            fraction_subseq_tf=cfg.fraction_subseq_tf,
            **common)
    raise ValueError(f"Unknown model architecture: {name}")
