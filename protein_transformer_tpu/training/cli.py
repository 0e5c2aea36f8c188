"""Command-line interface (reference: train.py:396-529 argparse surface).

Flags map onto TrainConfig fields; reference flag aliases are preserved
(-lr, -e, -b, -dm, -dih, -nh, -nl, -do, -l, -m, ...). Flags the reference
exposed for its CPU worker pool (--sequential_drmsd_loss) or CUDA
(--no_cuda, -adbs) are accepted for compatibility and ignored with a note.

Run:  python -m protein_transformer_tpu.training.cli --data <path> [...]
"""
from __future__ import annotations

import argparse
import dataclasses

from protein_transformer_tpu.config import TrainConfig


def my_bool(s):
    return s != "False"


def create_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="protein-transformer-tpu")
    req = p.add_argument_group("Required Args")
    req.add_argument("--data", default=TrainConfig.data,
                     help="Path to training data (.pt or native dir).")
    req.add_argument("--name", type=str, default=None)

    t = p.add_argument_group("Training Args")
    t.add_argument("-lr", "--learning_rate", type=float, default=1e-4)
    t.add_argument("-e", "--epochs", type=int, default=10)
    t.add_argument("-b", "--batch_size", type=int, default=8)
    t.add_argument("-es", "--early_stopping", type=int, default=20)
    t.add_argument("-nws", "--n_warmup_steps", type=int, default=10_000)
    t.add_argument("-cg", "--clip", type=float, default=1.0)
    t.add_argument("-l", "--loss", default="combined",
                   choices=["mse", "drmsd", "lndrmsd", "combined"])
    t.add_argument("--train_only", action="store_true")
    t.add_argument("--lr_scheduling", choices=["noam", "plateau"],
                   default="plateau")
    t.add_argument("--patience", type=int, default=10)
    t.add_argument("--early_stopping_threshold", type=float, default=0.001)
    t.add_argument("-esm", "--early_stopping_metric", default=None)
    t.add_argument("--without_angle_means", action="store_true")
    t.add_argument("--eval_train", type=my_bool, default="False")
    t.add_argument("-opt", "--optimizer", choices=["adam", "sgd"],
                   default="sgd")
    t.add_argument("-fctf", "--fraction_complete_tf", type=float, default=1.0)
    t.add_argument("-fsstf", "--fraction_subseq_tf", type=float, default=1.0)
    t.add_argument("--skip_missing_res_train", type=my_bool, default="False")
    t.add_argument("--repeat_train", type=int, default=1)
    t.add_argument("-s", "--seed", type=int, default=11_731)
    t.add_argument("--combined_drmsd_weight", type=float, default=0.5)
    t.add_argument("--batching_order", default="binned-random",
                   choices=["descending", "ascending", "binned-random"])
    t.add_argument("--backbone_loss", action="store_true")
    t.add_argument("--full_metrics", action="store_true",
                   help="with --backbone_loss, report genuinely full-atom "
                        "dRMSD/RMSD metrics instead of the reference's "
                        "backbone-reduced 'full' columns")
    t.add_argument("--grad_semantics", choices=["mean", "reference"],
                   default="mean")
    t.add_argument("--bins", type=int, default=-1)
    t.add_argument("--train_eval_downsample", type=float, default=0.10)
    # compatibility no-ops
    t.add_argument("--sequential_drmsd_loss", action="store_true",
                   help="(ignored: dRMSD is always in-step on TPU)")
    t.add_argument("--automatically_determine_batch_size", "-adbs",
                   type=my_bool, default="False",
                   help="Probe the largest batch size that fits on device "
                        "before training and use 0.8x of it "
                        "(reference train.py:532-551).")

    m = p.add_argument_group("Model Args")
    m.add_argument("-m", "--model", default="enc-only")
    m.add_argument("-dm", "--d_model", type=int, default=512)
    m.add_argument("-dih", "--d_ff", "--d_inner_hid", dest="d_ff", type=int,
                   default=2048)
    m.add_argument("-nh", "--n_heads", "--n_head", dest="n_heads", type=int,
                   default=8)
    m.add_argument("-nl", "--n_layers", type=int, default=6)
    m.add_argument("-do", "--dropout", type=float, default=0.1)
    m.add_argument("--postnorm", action="store_true")
    m.add_argument("--weight_decay", type=my_bool, default="True")
    for i in (1, 2, 3):
        m.add_argument(f"--conv{i}_size", type=int, default=None)
        m.add_argument(f"--conv{i}_reduc", type=float, default=None)
    m.add_argument("--use_embedding", type=my_bool, default="True")
    m.add_argument("--conv_out_matches_dm", type=my_bool, default="True")

    s = p.add_argument_group("Saving Args")
    s.add_argument("--log_structure_step", type=int, default=10)
    s.add_argument("--log_val_struct_step", "-lvs", type=int, default=50)
    s.add_argument("--log_wandb_step", type=int, default=1)
    s.add_argument("--save_pngs", "-png", type=my_bool, default="False")
    s.add_argument("--no_cuda", action="store_true",
                   help="(ignored: backend picked by JAX)")
    s.add_argument("--restart", action="store_true")
    s.add_argument("--restart_opt", action="store_true")
    s.add_argument("--checkpoint_time_interval", type=float, default=0.0)
    s.add_argument("--load_chkpt", type=str, default=None)
    s.add_argument("--out_dir", type=str, default="runs")
    s.add_argument("--use_wandb", type=my_bool, default="False")
    # reference train.py:518-520: HPC mode, limited I/O -- no live
    # per-batch status line
    s.add_argument("-c", "--cluster", type=my_bool, default="False")

    tpu = p.add_argument_group("TPU Args")
    tpu.add_argument("--compute_dtype", choices=["float32", "bfloat16"],
                     default="float32")
    tpu.add_argument("--prng_impl",
                     choices=["auto", "threefry2x32", "rbg"], default="auto")
    tpu.add_argument("--mesh_shape", type=int, nargs="+", default=[-1])
    tpu.add_argument("--mesh_axes", type=str, nargs="+", default=["data"])
    tpu.add_argument("--drmsd_impl", choices=["auto", "xla", "pallas"],
                     default="auto")
    tpu.add_argument("--attention_impl", choices=["auto", "xla", "flash"],
                     default="auto",
                     help="encoder self-attention: 'flash' opts into the "
                          "Pallas TPU kernel for probs-dropout-free "
                          "contexts (eval/predict, dropout=0 training); "
                          "measured slower than xla at L<=500, so "
                          "auto=xla; dropout>0 training always keeps "
                          "'xla' semantics")
    tpu.add_argument("--profile_dir", type=str, default=None)
    tpu.add_argument("--device_data", choices=["auto", "true", "false"],
                     default="auto")
    tpu.add_argument("--device_data_max_mb", type=int, default=4096)
    return p


def config_from_args(argv=None) -> TrainConfig:
    args = create_parser().parse_args(argv)
    fields = {f.name for f in dataclasses.fields(TrainConfig)}
    kwargs = {k: v for k, v in vars(args).items() if k in fields}
    return TrainConfig(**kwargs).finalize()


def main(argv=None):
    cfg = config_from_args(argv)
    assert not cfg.name or "_" not in cfg.name, \
        "Model names must not contain '_' (conflicts with structure files)."
    from protein_transformer_tpu.training.trainer import Trainer
    trainer = Trainer(cfg)
    if cfg.automatically_determine_batch_size:
        # Probe the OOM frontier at the max bucketed length, then rebuild the
        # trainer at 0.8x of it (reference: train.py:532-551, where a child
        # process's exit code carries the answer; on TPU the probe runs
        # in-process because XLA surfaces RESOURCE_EXHAUSTED as an exception).
        from protein_transformer_tpu.training.batch_probe import (
            probe_trainer_batch_size)
        b = probe_trainer_batch_size(trainer)
        print(f"[Info] automatically determined batch size: {b}")
        cfg = dataclasses.replace(
            cfg, batch_size=b, automatically_determine_batch_size=False)
        # drop the probed trainer BEFORE rebuilding: its device-resident
        # data store (and any probe buffers at the OOM frontier) must be
        # freed before the new trainer device_puts its own store
        del trainer
        trainer = Trainer(cfg)
    trainer.train()


if __name__ == "__main__":
    main()
