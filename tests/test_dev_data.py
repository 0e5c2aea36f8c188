"""The committed development dataset (examples/dev_data) end-to-end: the
"train from files on disk" path is continuously proven without network
access. Mirrors the reference's data/development assets + README usage
(reference: data/development/helices.txt, README.md:241-254)."""
import os
import subprocess
import sys

import numpy as np

from protein_transformer_tpu.data.dataset import load_native

DEV_DATA = os.path.join(os.path.dirname(__file__), os.pardir,
                        "examples", "dev_data")


def test_committed_dev_data_loads():
    data = load_native(DEV_DATA)
    assert set(data) >= {"train", "valid-70", "test", "settings"}
    assert len(data["train"]["seq"]) == 12
    assert len(data["valid-70"]["seq"]) == 2
    am = np.asarray(data["settings"]["angle_means"], np.float32)
    assert am.shape == (24,) and np.isfinite(am).all()
    # NaN-marked missing angles survive the round trip (first-residue phi
    # is immeasurable by construction)
    ang0 = np.asarray(data["train"]["ang"][0])
    assert np.isnan(ang0[0, :2]).all()
    # interior backbone angles (first 6 angles -> 12 sin/cos) all measured;
    # chi slots are NaN wherever the residue has fewer than 6 chis
    assert np.isfinite(ang0[2:-1, :12]).all()
    # coords parse back into L*14 x 3
    for seq, crd in zip(data["train"]["seq"], data["train"]["crd"]):
        assert np.asarray(crd).shape == (len(seq) * 14, 3)


def test_cli_config1_on_dev_data(tmp_path):
    """BASELINE config 1: enc-only dm=64 nl=2, mse loss, dev mini-dataset,
    full CLI from files on disk (CPU-runnable)."""
    env = dict(os.environ,
               XLA_FLAGS="--xla_force_host_platform_device_count=8",
               PTT_FORCE_CPU="1")
    code = ("import jax; jax.config.update('jax_platforms', 'cpu');"
            "from protein_transformer_tpu.training.cli import main;"
            "main()")
    cmd = [sys.executable, "-c", code,
           "--data", DEV_DATA, "--name", "dev1", "--out_dir", str(tmp_path),
           "-m", "enc-only", "-dm", "64", "-dih", "128", "-nh", "2",
           "-nl", "2", "-e", "2", "-b", "4", "-l", "mse", "-opt", "adam",
           "--log_structure_step", "0"]
    r = subprocess.run(cmd, capture_output=True, text=True, timeout=1500,
                       cwd="/root/repo", env=env)
    assert r.returncode == 0, r.stderr[-3000:]
    run_dir = tmp_path / "dev1"
    assert (run_dir / "checkpoints" / "best").exists()
    # eval ran over the available splits and produced finite CSV rows
    csv_text = (run_dir / "dev1.train").read_text()
    assert "epoch" in csv_text
    for mode in ("train", "valid-70", "test"):
        assert mode in csv_text


def test_dev_dataset_script_with_committed_ids(tmp_path):
    sys.path.insert(0, "/root/repo/ptt_scripts")
    try:
        import create_development_datasets as cdd
    finally:
        sys.path.remove("/root/repo/ptt_scripts")
    data = load_native(DEV_DATA)
    wanted = open(os.path.join(DEV_DATA, "helices.txt")).read().split()
    dev = cdd.make_dev_dataset(data, wanted)
    got = set(dev["train"]["ids"])
    assert got and got <= set(wanted)
    assert dev["test"]["ids"] == dev["train"]["ids"]
