"""Typed training configuration.

One dataclass with the same surface as the reference's argparse monolith
(reference: train.py:396-529), CLI-overridable via training/cli.py. Derived
fields follow train.py main()'s post-processing (train.py:574-600):
conv topology parsed from 'conv-enc|k,k,k|r,r,r' names, 'linear-out'
substring toggles tanh, early-stopping metric defaults to 'train-<loss>',
sos/eos enabled only for enc-dec.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

from protein_transformer_tpu.protein.constants import MAX_SEQ_LEN

VALID_SPLITS = (10, 20, 30, 40, 50, 70, 90)

LOSSES = ("mse", "drmsd", "lndrmsd", "combined")


@dataclasses.dataclass
class TrainConfig:
    # Required
    data: str = "data/casp12.pt"
    name: Optional[str] = None

    # Training
    learning_rate: float = 1e-4
    epochs: int = 10
    batch_size: int = 8
    early_stopping: int = 20
    n_warmup_steps: int = 10_000
    clip: float = 1.0
    loss: str = "combined"
    train_only: bool = False
    lr_scheduling: str = "plateau"          # noam | plateau
    patience: int = 10
    early_stopping_threshold: float = 0.001
    early_stopping_metric: Optional[str] = None
    without_angle_means: bool = False
    eval_train: bool = False
    optimizer: str = "sgd"                   # adam | sgd
    fraction_complete_tf: float = 1.0
    fraction_subseq_tf: float = 1.0
    skip_missing_res_train: bool = False
    repeat_train: int = 1
    seed: int = 11_731
    combined_drmsd_weight: float = 0.5
    # Training-gradient semantics for dRMSD-family losses:
    #   "mean"      -- differentiate the reported batch-mean scalar (this
    #                  framework's default; the mathematically clean choice);
    #   "reference" -- inject d(sum over proteins of per-protein ln-dRMSD)
    #                  like the reference's CPU-pool gradient stitching
    #                  (losses.py:91-92,166-167), plus the MSE term for
    #                  "combined" (train.py:84-86). A/B measured equivalent
    #                  on the dev dataset (see STATUS.md round 3).
    grad_semantics: str = "mean"
    batching_order: str = "binned-random"
    backbone_loss: bool = False
    # Under --backbone_loss the reference computes every dRMSD/RMSD metric
    # on backbone-reduced coordinates (its 'full' columns report backbone
    # values; losses.py:69-71). full_metrics=True restores genuinely
    # full-atom reporting (superset; pays the O((14L)^2) sweep per step).
    full_metrics: bool = False
    bins: int = -1                           # -1 -> 'auto'
    train_eval_downsample: float = 0.10
    # Probe the largest batch size that fits (HBM OOM frontier) before
    # training and use 0.8x of it (reference: train.py:532-551 + -adbs).
    automatically_determine_batch_size: bool = False

    # Model
    model: str = "enc-only"
    d_model: int = 512
    d_ff: int = 2048
    n_heads: int = 8
    n_layers: int = 6
    dropout: float = 0.1
    postnorm: bool = False
    weight_decay: bool = True
    conv1_size: Optional[int] = None
    conv2_size: Optional[int] = None
    conv3_size: Optional[int] = None
    conv1_reduc: Optional[float] = None
    conv2_reduc: Optional[float] = None
    conv3_reduc: Optional[float] = None
    use_embedding: bool = True
    conv_out_matches_dm: bool = True

    # Saving / logging
    log_structure_step: int = 10
    log_val_struct_step: int = 50
    log_wandb_step: int = 1
    save_pngs: bool = False
    restart: bool = False
    restart_opt: bool = False
    checkpoint_time_interval: float = 0.0
    load_chkpt: Optional[str] = None
    out_dir: str = "runs"
    use_wandb: bool = False
    # HPC/limited-I/O mode (reference -c/--cluster, train.py:518-520):
    # disables the live per-batch status line; epoch prints only.
    cluster: bool = False

    # TPU-native additions
    max_seq_len: int = MAX_SEQ_LEN
    bucket_sizes: Sequence[int] = (64, 128, 192, 256, 320, 384, 448, 512)
    mesh_shape: Sequence[int] = (-1,)        # data-parallel mesh; -1 = all
    mesh_axes: Sequence[str] = ("data",)
    compute_dtype: str = "float32"           # float32 | bfloat16
    drmsd_impl: str = "auto"                 # auto | xla | pallas
    # Encoder self-attention implementation (ops/attention.py): 'flash'
    # routes probs-dropout-free attention (eval/predict, dropout=0
    # training) through the Pallas TPU flash kernel; dropout>0 training
    # always keeps 'xla' (reference dropout-on-probs semantics).
    # auto = xla: the kernel measured SLOWER than XLA at L<=500
    # (tools/bench_attention.py); flash is an explicit opt-in.
    attention_impl: str = "auto"             # auto | xla | flash
    # PRNG implementation for dropout/sampling bits. threefry's per-call
    # key-derivation chains + bit generation cost ~3 ms/step at the flagship
    # config (~2300 scalar HLO ops for 19 dropout sites); the TPU hardware
    # rbg generator removes that. auto = rbg on TPU, threefry elsewhere.
    prng_impl: str = "auto"                  # auto | threefry2x32 | rbg
    profile_dir: Optional[str] = None
    # Device-resident data path (data/device_store.py): splits live on
    # device, batches are assembled by a jitted gather. auto = on when
    # single-process and the footprint fits device_data_max_mb.
    device_data: str = "auto"                # auto | true | false
    device_data_max_mb: int = 4096

    # Derived (filled by finalize())
    vocab_size: int = 22
    pad_id: int = 20
    add_sos_eos: bool = False
    es_mode: str = "train"
    es_metric: str = "combined"

    def finalize(self) -> "TrainConfig":
        """Apply the reference's derived-config rules (train.py:574-600)."""
        assert self.loss in LOSSES, f"loss must be one of {LOSSES}"
        if not self.early_stopping_metric:
            self.early_stopping_metric = f"train-{self.loss}"
        parts = self.early_stopping_metric.split("-")
        # mode may itself contain '-' (valid-70)
        self.es_metric = parts[-1]
        self.es_mode = "-".join(parts[:-1])
        self.add_sos_eos = self.model == "enc-dec"
        if "conv-enc" in self.model and "|" in self.model:
            from protein_transformer_tpu.models.factory import (
                parse_conv_kernel_info_from_model_name)
            kernels, reducs = parse_conv_kernel_info_from_model_name(self.model)
            assert len(kernels) <= 3, "at most 3 conv layers supported"
            for i, (k, r) in enumerate(zip(kernels, reducs), start=1):
                setattr(self, f"conv{i}_size", k)
                setattr(self, f"conv{i}_reduc", r)
            suffix = "-linear-out" if "linear-out" in self.model else ""
            self.model = "conv-enc" + suffix
        return self

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d: dict) -> "TrainConfig":
        fields = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in fields})
