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
