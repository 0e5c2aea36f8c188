"""Analytic FLOPs model + MFU accounting for the training step.

Counts the dense work of one optimizer step (forward + backward) at a given
(B, L) for any TrainConfig: conv front-end, attention stack, FFNs, output
head, and -- for dRMSD-family losses -- the on-device NeRF build and the
O(M^2) pairwise-distance sweep. Matmul convention: one (m,n)x(n,k) product
is 2*m*n*k FLOPs; training multiplies the forward count by 3 (backward
recomputes both matmul operands' gradients, 2x forward).

MFU is reported against the chip's bf16 dense peak regardless of the
configured compute dtype (the PaLM/scaling-book convention): an fp32 run
showing low MFU against the bf16 peak is exactly the signal that switching
the trunk to bf16 has headroom.

The reference has no FLOPs accounting at all (its perf statistic is
residues/sec, log.py:423-430); this module exists so every benchmark in
bench.py / tools/bench_ladder.py can place itself on the hardware roofline.
"""
from __future__ import annotations

from typing import Optional

# Dense bf16 peak FLOP/s per chip, by jax device_kind substring. Sources:
# public TPU spec sheets (per chip, not per pod).
_PEAK_BF16 = (
    ("v6e", 918e12), ("v6", 918e12),
    ("v5p", 459e12),
    ("v5 lite", 197e12), ("v5e", 197e12), ("v5litepod", 197e12),
    ("v4", 275e12),
    ("v3", 123e12),
    ("v2", 45e12),
)
_DEFAULT_PEAK = 197e12  # assume v5e-class when the kind string is unknown


def peak_flops_per_chip(device_kind: Optional[str] = None) -> float:
    """Dense bf16 peak FLOP/s for one chip of the given device kind."""
    if device_kind is None:
        import jax
        device_kind = jax.devices()[0].device_kind
    kind = device_kind.lower()
    for sub, peak in _PEAK_BF16:
        if sub in kind:
            return peak
    return _DEFAULT_PEAK


def _encoder_layer_flops(b: int, l: int, d: int, d_ff: int) -> float:
    """Forward FLOPs of one attention encoder/decoder self-attn + FFN block."""
    proj = 4 * 2 * b * l * d * d           # q, k, v, out projections
    attn = 2 * 2 * b * l * l * d           # scores (QK^T) + apply (PV)
    ffn = 2 * 2 * b * l * d * d_ff         # two FFN matmuls
    return proj + attn + ffn


def _cross_attn_flops(b: int, l: int, d: int) -> float:
    return 4 * 2 * b * l * d * d + 2 * 2 * b * l * l * d


def model_forward_flops(cfg, b: int, l: int) -> float:
    """Forward-pass FLOPs of the configured model at batch (b, l)."""
    d, d_ff, nl = cfg.d_model, cfg.d_ff, cfg.n_layers
    f = 0.0
    if cfg.model.startswith("conv-enc"):
        from protein_transformer_tpu.models.conv_encoder import (
            conv_layer_dims, conv_out_size)
        kernels = [k for k in (cfg.conv1_size, cfg.conv2_size, cfg.conv3_size)
                   if k]
        reducs = [r for r in (cfg.conv1_reduc, cfg.conv2_reduc,
                              cfg.conv3_reduc) if r]
        for k, din, dout in conv_layer_dims(d, cfg.vocab_size,
                                            cfg.use_embedding, kernels,
                                            reducs, cfg.conv_out_matches_dm):
            f += 2 * b * l * k * din * dout
        d_attn = conv_out_size(d, cfg.vocab_size, cfg.use_embedding,
                               reducs, cfg.conv_out_matches_dm)
    else:
        d_attn = d
    f += nl * _encoder_layer_flops(b, l, d_attn, d_ff)
    if cfg.model == "enc-dec":
        # decoder: self-attn + cross-attn + FFN per layer, same depth
        f += nl * (_encoder_layer_flops(b, l, d_attn, d_ff)
                   + _cross_attn_flops(b, l, d_attn))
    f += 2 * b * l * d_attn * 24            # angle projection head
    return f


def loss_forward_flops(cfg, b: int, l: int) -> float:
    """Forward FLOPs of the loss path: NeRF build + dRMSD pair sweep.

    The pair sweep dominates: M = 3L (backbone_loss without full_metrics)
    or 14L points per protein, ~10 FLOPs per pairwise distance (3 sub,
    3 mul, 2 add, rsqrt~2), computed for BOTH pred and true coordinate
    sets, plus the |D_pred - D_true| reduction (~3/pair).
    """
    if cfg.loss not in ("drmsd", "lndrmsd", "combined"):
        return 0.0
    full = (not cfg.backbone_loss) or getattr(cfg, "full_metrics", False)
    m = (14 if full else 3) * l
    sweep = b * m * m * (2 * 10 + 3)
    nerf = b * l * 14 * 60                  # per-atom frame compose + place
    return sweep + nerf


def train_step_flops(cfg, b: int, l: int) -> float:
    """Total FLOPs of one training step (forward + backward ~= 3x forward;
    the optimizer update is O(params), negligible)."""
    return 3.0 * (model_forward_flops(cfg, b, l)
                  + loss_forward_flops(cfg, b, l))


def mfu(cfg, b: int, l: int, step_seconds: float,
        n_chips: int = 1, device_kind: Optional[str] = None) -> float:
    """Model FLOPs utilization of a measured step time, vs bf16 peak."""
    peak = peak_flops_per_chip(device_kind) * n_chips
    return train_step_flops(cfg, b, l) / (step_seconds * peak)
