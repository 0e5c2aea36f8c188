"""End-to-end CLI test: reference-schema .pt file -> training run via the
command-line entry point (the exact path a reference user would take)."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

from protein_transformer_tpu.data.synthetic import make_dataset


def test_cli_trains_from_pt_file(tmp_path):
    torch = pytest.importorskip("torch")
    data = make_dataset(n_train=8, n_eval=2, min_len=8, max_len=16, seed=0)
    pt_path = str(tmp_path / "synthetic.pt")
    torch.save(data, pt_path)

    env = dict(os.environ,
               XLA_FLAGS="--xla_force_host_platform_device_count=8",
               PTT_FORCE_CPU="1")
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu');"
        "from protein_transformer_tpu.training.cli import main;"
        "main()")
    cmd = [sys.executable, "-c", code,
           "--data", pt_path, "--name", "cli", "--out_dir", str(tmp_path),
           "-m", "enc-only", "-dm", "16", "-dih", "32", "-nh", "2",
           "-nl", "1", "-e", "1", "-b", "4", "-l", "mse", "-opt", "adam",
           "--train_only", "--log_structure_step", "0"]
    r = subprocess.run(cmd, capture_output=True, text=True, timeout=900,
                       cwd="/root/repo", env=env)
    assert r.returncode == 0, r.stderr[-3000:]
    run_dir = tmp_path / "cli"
    assert (run_dir / "cli.train").exists()
    assert (run_dir / "config.json").exists()
    with open(run_dir / "config.json") as f:
        saved = json.load(f)
    assert saved["config"]["d_model"] == 16
    # checkpoint written and loadable
    assert (run_dir / "checkpoints" / "best").exists()


def test_convert_cli_roundtrip(tmp_path):
    torch = pytest.importorskip("torch")
    data = make_dataset(n_train=4, n_eval=2, min_len=8, max_len=12, seed=1)
    pt_path = str(tmp_path / "d.pt")
    torch.save(data, pt_path)
    from protein_transformer_tpu.data.convert import main as convert_main
    native = str(tmp_path / "native")
    convert_main([pt_path, native])
    assert os.path.exists(os.path.join(native, "manifest.json"))
    pt2 = str(tmp_path / "back.pt")
    convert_main([native, pt2])
    back = torch.load(pt2, weights_only=False)
    assert back["train"]["seq"] == data["train"]["seq"]
    np.testing.assert_array_equal(back["train"]["ang"][0],
                                  data["train"]["ang"][0])


def test_adbs_probe_overrides_batch_size(tmp_path, monkeypatch):
    """-adbs wires the batch probe into the CLI (reference train.py:532-551):
    the probe's answer replaces cfg.batch_size before training starts."""
    import torch
    from protein_transformer_tpu.training import cli as cli_mod

    data = make_dataset(n_train=8, n_eval=2, min_len=8, max_len=16, seed=0)
    pt_path = str(tmp_path / "d.pt")
    torch.save(data, pt_path)

    probed = {}

    def fake_probe(trainer, **kw):
        probed["initial_batch"] = trainer.cfg.batch_size
        return 6

    monkeypatch.setattr(
        "protein_transformer_tpu.training.batch_probe."
        "probe_trainer_batch_size", fake_probe)
    trained = {}
    from protein_transformer_tpu.training.trainer import Trainer
    orig_train = Trainer.train

    def spy_train(self, state=None):
        trained["batch_size"] = self.cfg.batch_size
        return orig_train(self, state)

    monkeypatch.setattr(Trainer, "train", spy_train)
    cli_mod.main(["--data", pt_path, "--name", "adbs",
                  "--out_dir", str(tmp_path), "-m", "enc-only", "-dm", "16",
                  "-dih", "32", "-nh", "2", "-nl", "1", "-e", "1", "-b", "4",
                  "-l", "mse", "-opt", "adam", "--train_only",
                  "--log_structure_step", "0", "-adbs", "True"])
    assert probed["initial_batch"] == 4
    assert trained["batch_size"] == 6


def test_batch_probe_on_trainer(tmp_path):
    """The probe itself runs a real train step at doubling batch sizes on the
    virtual-device mesh and returns 0.8x the largest that fits."""
    from protein_transformer_tpu.config import TrainConfig
    from protein_transformer_tpu.training.trainer import Trainer
    from protein_transformer_tpu.training.batch_probe import (
        probe_trainer_batch_size)

    data = make_dataset(n_train=8, n_eval=2, min_len=8, max_len=16, seed=0)
    cfg = TrainConfig(model="enc-only", d_model=16, d_ff=32, n_heads=2,
                      n_layers=1, batch_size=2, epochs=1, loss="mse",
                      optimizer="adam", bucket_sizes=(16,), max_seq_len=16,
                      out_dir=str(tmp_path), name="probe", train_only=True)
    tr = Trainer(cfg, data=data)
    b = probe_trainer_batch_size(tr, max_batch=8, verbose=False)
    assert b == int(8 * 0.8)  # nothing OOMs at these sizes -> frontier = max
