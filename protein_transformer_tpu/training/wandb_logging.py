"""Optional Weights & Biases logging (reference: log.py:161-307, train.py:616-667).

Gracefully disabled when wandb is not installed or not requested. Metric
names match the reference exactly ('Train Batch RMSE', '<Mode> Epoch DRMSD',
'Valid-Avg Epoch ...', angle histograms, run summaries) so dashboards carry
over unchanged. MSE is logged as RMSE (log.py:1-4).
"""
from __future__ import annotations

from typing import Optional

import numpy as np


def try_init_wandb(cfg, n_params: int, angle_means) -> Optional[object]:
    """wandb.init with the reference's config payload (train.py:616-649)."""
    if not getattr(cfg, "use_wandb", False):
        return None
    try:
        import wandb
    except ImportError:
        print("[wandb] not installed; disabling wandb logging")
        return None
    run = wandb.init(project="protein-transformer-tpu", name=cfg.name,
                     config=cfg.to_dict())
    run.config.update({"n_params": n_params,
                       "max_seq_len": cfg.max_seq_len}, allow_val_change=True)
    run.summary["stopped_training_early"] = False
    run.summary["max_batch_size"] = cfg.batch_size
    return run


def watch_params(run, params, grads=None) -> None:
    """Parameter (and optionally gradient) histograms per module path --
    the capability of wandb.watch(model, "all") (train.py:621), which hooks
    torch autograd; flax params are explicit pytrees, so histograms are
    logged directly on the epoch cadence."""
    if run is None:
        return
    import jax
    import wandb

    def histogram(leaf):
        # leaves sharded across non-addressable devices (multi-host tensor
        # parallelism) cannot be fetched from this process -- skip them
        if not getattr(leaf, "is_fully_addressable", True):
            return None
        vals = np.asarray(leaf)
        # non-finite params must surface through the NaN watchdog's
        # FloatingPointError, not an np.histogram range ValueError here
        return wandb.Histogram(
            np_histogram=np.histogram(np.nan_to_num(vals)))

    payload = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        h = histogram(leaf)
        if h is not None:
            payload[f"parameters/{name}"] = h
    if grads is not None:
        for path, leaf in jax.tree_util.tree_flatten_with_path(grads)[0]:
            name = "/".join(str(getattr(k, "key", k)) for k in path)
            h = histogram(leaf)
            if h is not None:
                payload[f"gradients/{name}"] = h
    run.log(payload, commit=False)


def save_model_txt(run, model, out_dir: str) -> None:
    """MODEL.txt with the model's architecture string (train.py:643-645)."""
    import os
    path = os.path.join(out_dir, "MODEL.txt")
    with open(path, "w") as f:
        f.write(str(model) + "\n")
    if run is not None:
        run.save(path, base_path=out_dir)


def mirror_run_files(run, out_dir: str) -> None:
    """wandb.save live-mirroring of checkpoints/structures/CSV logs
    (train.py:223,665-667)."""
    if run is None:
        return
    import os
    for pattern in ("checkpoints/*", "structures/*", "*.train"):
        run.save(os.path.join(out_dir, pattern), base_path=out_dir,
                 policy="live")


def log_checkpoint_summary(run, modifier: str, cur_loss: float, epoch: int,
                           metrics: dict, train_only: bool) -> None:
    """Run summaries stamped at checkpoint time (train.py:208-209,224-226)."""
    if run is None:
        return
    run.summary[f"{modifier}_validation_loss"] = cur_loss
    run.summary[f"{modifier}_validation_epoch"] = epoch
    hist = metrics["train"]["speed-history"]
    if hist:
        run.summary["avg_training_speed"] = float(np.mean(hist))
    if not train_only:
        # average over whichever validation splits this dataset carries
        # (the reference's single dataloader is valid-70; any split counts)
        hists = [metrics[m]["speed-history"] for m in metrics
                 if isinstance(metrics.get(m), dict)
                 and m.startswith("valid")
                 and metrics[m].get("speed-history")]
        if hists:
            run.summary["avg_evaluation_speed"] = float(
                np.mean(np.concatenate(hists)))


def log_final_epoch_summary(run, mode: str, m: dict) -> None:
    """final_epoch_<mode>_* summaries, refreshed every epoch so the run
    ends with its last-epoch values (log.py:83-88)."""
    if run is None:
        return
    hist = m.get("speed-history") or [0.0]
    run.summary[f"final_epoch_{mode}_drmsd"] = m["epoch-drmsd-full"]
    run.summary[f"final_epoch_{mode}_mse"] = m["epoch-mse-full"]
    run.summary[f"final_epoch_{mode}_rmsd"] = m["epoch-rmsd-full"]
    run.summary[f"final_epoch_{mode}_comb"] = m["epoch-combined-full"]
    run.summary[f"final_epoch_{mode}_speed"] = float(np.mean(hist))


def log_early_stop(run) -> None:
    """stopped_training_early flips True on early stop (log.py:105)."""
    if run is None:
        return
    run.summary["stopped_training_early"] = True


def log_train_batch(run, losses: dict, batch_size: int, speed: float,
                    lr: Optional[float] = None) -> None:
    if run is None:
        return
    payload = {
        "Train Batch RMSE": float(np.sqrt(losses["mse-full"])),
        "Train Batch DRMSD": losses["drmsd-full"],
        "Train Batch ln-DRMSD": losses["lndrmsd-full"],
        "Train Batch Combined Loss": losses["combined-full"],
        "Train Batch Speed": speed,
        "Batch size": batch_size,
        "Train Batch DRMSD Backbone": losses["drmsd-bb"],
        "Train Batch ln-DRMSD Backbone": losses["lndrmsd-bb"],
        "Train Batch RMSE Backbone": float(np.sqrt(losses["mse-bb"])),
        "Train Batch RMSE Sidechain": float(np.sqrt(losses["mse-sc"])),
    }
    if lr is not None:
        payload["Learning Rate"] = lr
    run.log(payload)


def log_eval_epoch(run, mode: str, m: dict) -> None:
    if run is None:
        return
    run.log({
        f"{mode.title()} Epoch RMSE": float(np.sqrt(m["epoch-mse-full"])),
        f"{mode.title()} Epoch RMSD": m["epoch-rmsd-full"],
        f"{mode.title()} Epoch DRMSD": m["epoch-drmsd-full"],
        f"{mode.title()} Epoch ln-DRMSD": m["epoch-lndrmsd-full"],
        f"{mode.title()} Epoch Combined Loss": m["epoch-combined-full"],
        f"{mode.title()} Epoch ln-DRMSD Backbone": m["epoch-lndrmsd-bb"],
        f"{mode.title()} Epoch DRMSD Backbone": m["epoch-drmsd-bb"],
        f"{mode.title()} Epoch RMSE Backbone": float(
            np.sqrt(m["epoch-mse-bb"])),
        f"{mode.title()} Epoch RMSE Sidechain": float(
            np.sqrt(m["epoch-mse-sc"])),
    }, commit=False)


def log_avg_validation(run, metrics: dict, splits) -> None:
    """Cross-split averages (log.py:256-307)."""
    if run is None or not splits:
        return
    acc: dict[str, float] = {}
    for split in splits:
        m = metrics[split]
        acc["Valid-Avg Epoch RMSE"] = acc.get("Valid-Avg Epoch RMSE", 0) + \
            float(np.sqrt(m["epoch-mse-full"]))
        acc["Valid-Avg Epoch RMSD"] = acc.get("Valid-Avg Epoch RMSD", 0) + \
            m["epoch-rmsd-full"]
        acc["Valid-Avg Epoch DRMSD"] = acc.get("Valid-Avg Epoch DRMSD", 0) + \
            m["epoch-drmsd-full"]
        acc["Valid-Avg Epoch ln-DRMSD"] = acc.get(
            "Valid-Avg Epoch ln-DRMSD", 0) + m["epoch-lndrmsd-full"]
        acc["Valid-Avg Epoch Combined Loss"] = acc.get(
            "Valid-Avg Epoch Combined Loss", 0) + m["epoch-combined-full"]
    n = len(list(splits))
    run.log({k: v / n for k, v in acc.items()}, commit=False)


def log_angle_histograms(run, pred_sincos: np.ndarray,
                         seq_ids: np.ndarray, pad_id: int) -> None:
    """Predicted angle histograms (log.py:210-227)."""
    if run is None:
        return
    import wandb
    sel = seq_ids != pad_id
    flat = pred_sincos[sel]
    radians = np.arctan2(flat.reshape(-1, 12, 2)[..., 1],
                         flat.reshape(-1, 12, 2)[..., 0])
    run.log({"Predicted Angles (sin cos)":
             wandb.Histogram(np_histogram=np.histogram(flat)),
             "Predicted Angles (radians)":
             wandb.Histogram(np_histogram=np.histogram(radians))},
            commit=False)
