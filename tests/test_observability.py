"""Observability parity: glb export, PNG rendering, CSV granularity,
epoch metric semantics, angle-histogram plumbing."""
import csv
import json
import struct

import numpy as np
import jax
import pytest

from protein_transformer_tpu.protein.gltf import coords_to_glb, structure_bonds
from protein_transformer_tpu.protein.constants import NUM_PREDICTED_COORDS
from protein_transformer_tpu.training import metrics as M


def _random_structure(length=11, seed=0):
    rng = np.random.default_rng(seed)
    seq = rng.integers(0, 20, (length,)).astype(np.int32)
    crd = rng.normal(size=(length, NUM_PREDICTED_COORDS, 3)).astype(np.float32)
    import protein_transformer_tpu.protein._ff14sb as ff
    n_sc = np.asarray(ff.SC_NUM_ATOMS)[seq]
    mask = np.zeros((length, NUM_PREDICTED_COORDS), bool)
    mask[:, :4] = True
    for i in range(length):
        mask[i, 4:4 + n_sc[i]] = True
    return seq, crd, mask


def test_glb_is_valid_gltf_binary():
    seq, crd, mask = _random_structure()
    blob = coords_to_glb(crd, seq, mask)
    magic, version, total = struct.unpack_from("<III", blob, 0)
    assert magic == 0x46546C67 and version == 2 and total == len(blob)
    json_len, json_type = struct.unpack_from("<II", blob, 12)
    assert json_type == 0x4E4F534A
    doc = json.loads(blob[20:20 + json_len])
    assert doc["asset"]["version"] == "2.0"
    n_atoms = int(mask.sum())
    assert doc["accessors"][0]["count"] == n_atoms
    assert doc["meshes"][0]["primitives"][0]["mode"] == 1  # LINES
    # bin chunk exists and is 4-aligned
    bin_off = 20 + json_len
    bin_len, bin_type = struct.unpack_from("<II", blob, bin_off)
    assert bin_type == 0x004E4942
    assert bin_off + 8 + bin_len == len(blob)
    # all line indices reference valid vertices
    idx_acc = doc["accessors"][2]
    assert idx_acc["count"] % 2 == 0
    positions = np.frombuffer(
        blob, "<f4", count=n_atoms * 3, offset=bin_off + 8).reshape(-1, 3)
    assert np.isfinite(positions).all()


def test_structure_bonds_topology():
    seq = np.array([8, 0, 18], np.int32)  # LEU(?) / ALA-like / TRP-class ids
    bonds = structure_bonds(seq)
    # backbone: 3 intra-residue bonds per residue + 2 peptide links; every
    # sidechain atom bonds to the frame atom it extends from (CB's is CA)
    import protein_transformer_tpu.protein._ff14sb as ff
    n_sc = np.asarray(ff.SC_NUM_ATOMS)[seq]
    expected = 3 * 3 + 2 + int(n_sc.sum())
    assert len(bonds) == expected
    assert (bonds >= 0).all()
    assert (bonds < 3 * NUM_PREDICTED_COORDS).all()
    # no self-bonds
    assert (bonds[:, 0] != bonds[:, 1]).all()


def test_render_png(tmp_path):
    pytest.importorskip("matplotlib")
    from protein_transformer_tpu.training.structure_logging import (
        render_structure_png)
    seq, crd, mask = _random_structure()
    out = tmp_path / "s.png"
    render_structure_png(str(out), crd, crd, mask)
    assert out.exists() and out.stat().st_size > 1000
    assert out.read_bytes()[:8] == b"\x89PNG\r\n\x1a\n"


def test_structure_logger_writes_glb_and_png(tmp_path):
    from protein_transformer_tpu.training.structure_logging import (
        StructureLogger)
    seq, crd, mask = _random_structure()
    logger = StructureLogger(str(tmp_path), save_pngs=True)
    logger.log(7, "train", seq, crd, crd, mask)
    logger.close()
    sub = tmp_path / "structures" / "train"
    assert (sub / "00007_pred.pdb").exists()
    assert (sub / "00007_pred.glb").exists()
    assert (sub / "true.glb").exists()
    assert (sub / "00007.png").exists()


def test_csv_logger_granularity(tmp_path):
    path = str(tmp_path / "x.train")
    metrics = M.init_metrics(["train"])
    metrics = M.reset_for_epoch(metrics, "train")
    logger = M.CsvLogger(path, "mse")
    losses = {k: 1.0 for k in M.LOSS_KEYS}
    losses["loss"] = 1.0
    metrics = M.update_batch(metrics, "train", losses, 100)
    logger.log(metrics, "train", 0.0)
    metrics = M.end_of_epoch(metrics, "train")
    logger.log(metrics, "train", 0.0, end_of_epoch=True)
    logger.close()
    with open(path) as f:
        rows = list(csv.DictReader(f))
    assert [r["granularity"] for r in rows] == ["batch", "epoch"]
    # analyze.py's epoch filter now selects exactly the epoch rows
    import sys
    sys.path.insert(0, "ptt_scripts")
    try:
        import analyze
    finally:
        sys.path.remove("ptt_scripts")
    _h, _c, epoch_rows = analyze.read_epoch_rows(path, "train")
    assert len(epoch_rows) == 1


class FakeRun:
    """Minimal wandb.Run stand-in: records summary writes, log payloads,
    and save() globs."""

    def __init__(self):
        self.summary = {}
        self.logged = []
        self.saved = []

    def log(self, payload, commit=True):
        self.logged.append(payload)

    def save(self, pattern, base_path=None, policy=None):
        self.saved.append(pattern)


def _epoch_metrics():
    metrics = M.init_metrics(["train", "valid-70"])
    for mode in ("train", "valid-70"):
        metrics = M.reset_for_epoch(metrics, mode)
        losses = {k: 2.0 for k in M.LOSS_KEYS}
        metrics = M.update_batch(metrics, mode, losses, 100)
        metrics = M.end_of_epoch(metrics, mode)
    return metrics


def test_wandb_checkpoint_and_final_epoch_summaries():
    from protein_transformer_tpu.training import wandb_logging as W
    run = FakeRun()
    metrics = _epoch_metrics()
    W.log_checkpoint_summary(run, "best", 1.25, 3, metrics, train_only=False)
    assert run.summary["best_validation_loss"] == 1.25
    assert run.summary["best_validation_epoch"] == 3
    assert run.summary["avg_training_speed"] > 0
    assert run.summary["avg_evaluation_speed"] > 0
    W.log_final_epoch_summary(run, "train", metrics["train"])
    assert run.summary["final_epoch_train_drmsd"] == pytest.approx(2.0)
    assert run.summary["final_epoch_train_mse"] == pytest.approx(2.0)
    assert "final_epoch_train_speed" in run.summary
    W.log_early_stop(run)
    assert run.summary["stopped_training_early"] is True


def test_wandb_watch_params_histograms(monkeypatch):
    # Install a complete fake wandb module: the real package is absent in
    # this image, and other tests leak an EMPTY stub into sys.modules
    # (test_losses stubs the reference's import), so importorskip would be
    # order-dependent.
    import sys
    import types
    fake = types.ModuleType("wandb")

    class _Histogram:
        def __init__(self, np_histogram=None):
            self.np_histogram = np_histogram

    fake.Histogram = _Histogram
    monkeypatch.setitem(sys.modules, "wandb", fake)
    from protein_transformer_tpu.training import wandb_logging as W
    run = FakeRun()
    params = {"params": {"dense": {"kernel": np.ones((4, 4)),
                                   "bias": np.zeros((4,))}}}
    W.watch_params(run, params, grads=params)
    (payload,) = run.logged
    assert any(k.startswith("parameters/") and "kernel" in k for k in payload)
    assert any(k.startswith("gradients/") for k in payload)


def test_wandb_model_txt_and_mirroring(tmp_path):
    from protein_transformer_tpu.training import wandb_logging as W
    run = FakeRun()
    W.save_model_txt(run, object(), str(tmp_path))
    assert (tmp_path / "MODEL.txt").read_text().strip()
    W.mirror_run_files(run, str(tmp_path))
    assert any("checkpoints" in p for p in run.saved)
    assert any("structures" in p for p in run.saved)
    assert any(p.endswith(".train") for p in run.saved)


def test_epoch_bb_metrics_divided_by_n_batches():
    """Bug-compatible with the reference: bb/sc epoch values are the LAST
    batch value divided by n_batches (log.py:414-421 overwrite +
    log.py:468-471 division)."""
    metrics = M.init_metrics(["train"])
    metrics = M.reset_for_epoch(metrics, "train")
    for val in (3.0, 5.0):
        losses = {k: val for k in M.LOSS_KEYS}
        metrics = M.update_batch(metrics, "train", losses, 10)
    metrics = M.end_of_epoch(metrics, "train")
    m = metrics["train"]
    assert m["epoch-drmsd-bb"] == pytest.approx(5.0 / 2)
    assert m["epoch-mse-sc"] == pytest.approx(5.0 / 2)
    # full metrics accumulate-and-average as before
    assert m["epoch-drmsd-full"] == pytest.approx((3.0 + 5.0) / 2)


def _fake_wandb(monkeypatch):
    import sys
    import types
    fake = types.ModuleType("wandb")

    class _Obj:
        def __init__(self, *a, **kw):
            pass

    fake.Histogram = _Obj
    fake.Molecule = _Obj
    fake.Object3D = _Obj
    fake.Image = _Obj
    monkeypatch.setitem(sys.modules, "wandb", fake)
    return fake


def test_kabsch_align_recovers_rigid_motion():
    from protein_transformer_tpu.training.structure_logging import (
        kabsch_align)
    rng = np.random.default_rng(0)
    target = rng.normal(size=(30, 3))
    th = 0.7
    rot = np.array([[np.cos(th), -np.sin(th), 0],
                    [np.sin(th), np.cos(th), 0], [0, 0, 1.0]])
    mobile = target @ rot.T + np.array([1.0, -2.0, 3.0])
    tf, rmsd = kabsch_align(mobile, target)
    assert rmsd < 1e-6
    np.testing.assert_allclose(tf(mobile), target, atol=1e-6)


def test_scene_glb_merges_structures():
    from protein_transformer_tpu.protein.gltf import scene_to_glb
    seq, crd, mask = _random_structure()
    single = coords_to_glb(crd, seq, mask)
    scene = scene_to_glb([(crd, seq, mask, None),
                          (crd + 5.0, seq, mask, (0.5, 0.5, 0.5, 1.0))])
    assert scene[:4] == b"glTF" and single[:4] == b"glTF"

    def pos_count(blob):
        json_len = struct.unpack_from("<I", blob, 12)[0]
        meta = json.loads(blob[20:20 + json_len])
        return meta["accessors"][0]["count"]

    # the combined scene carries both structures' vertices in one primitive
    assert pos_count(scene) == 2 * pos_count(single)


def test_structure_logger_aligned_scene_and_rmsd(tmp_path, monkeypatch):
    """The combined aligned scene + align-RMSD metric (the reference's
    single-PyMOL-scene export, PDB_Creator.py:186-212)."""
    _fake_wandb(monkeypatch)
    from protein_transformer_tpu.training.structure_logging import (
        StructureLogger)
    seq, crd, mask = _random_structure()
    # pred = rigidly moved true: align-RMSD must be ~0 over masked atoms
    th = 0.3
    rot = np.array([[np.cos(th), -np.sin(th), 0],
                    [np.sin(th), np.cos(th), 0], [0, 0, 1.0]], np.float32)
    pred = crd @ rot.T + np.float32([2.0, 0.0, -1.0])
    run = FakeRun()
    logger = StructureLogger(str(tmp_path), wandb_run=run)
    logger.log(3, "train", seq, pred, crd, mask)
    logger.close()
    sub = tmp_path / "structures" / "train"
    assert (sub / "00003_scene.glb").exists()
    (payload,) = [p for p in run.logged if "train_align_rmsd" in p]
    assert payload["train_align_rmsd"] < 1e-4
    assert "train_scene" in payload


def test_trainer_gradient_histograms(tmp_path, monkeypatch):
    """_probe_gradients feeds real gradient histograms into watch_params
    (the reference's wandb.watch(model) gradient stream, train.py:616-667)."""
    _fake_wandb(monkeypatch)
    from protein_transformer_tpu.config import TrainConfig
    from protein_transformer_tpu.data.synthetic import make_dataset
    from protein_transformer_tpu.training.trainer import Trainer
    from protein_transformer_tpu.training import wandb_logging as W

    cfg = TrainConfig(model="enc-only", d_model=16, d_ff=32, n_heads=2,
                      n_layers=1, batch_size=4, epochs=1, loss="mse",
                      bucket_sizes=(16,), max_seq_len=16, train_only=True,
                      out_dir=str(tmp_path), name="g", dropout=0.0)
    data = make_dataset(n_train=6, n_eval=2, min_len=8, max_len=16, seed=0)
    tr = Trainer(cfg, data=data)
    state = tr.init_state()
    grads = tr._probe_gradients(state)
    leaves = jax.tree_util.tree_leaves(grads)
    assert leaves and all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(np.abs(np.asarray(l)).max() > 0 for l in leaves)
    run = FakeRun()
    W.watch_params(run, state.params, grads=grads)
    (payload,) = run.logged
    assert any(k.startswith("gradients/") for k in payload)


# ---------------- live per-batch status line (tqdm analogue) ----------------


def _status_metrics():
    m = M.init_metrics(["train", "valid-70"])
    m = M.reset_for_epoch(m, "train")
    m = M.reset_for_epoch(m, "valid-70")
    losses = {"drmsd-full": 6.5, "lndrmsd-full": 0.021, "mse-full": 0.25,
              "combined-full": 12.3}
    m = M.update_batch(m, "train", losses, 512)
    m = M.update_batch(m, "valid-70", losses, 512)
    return m


def test_batch_status_renders_train_line():
    import io
    buf = io.StringIO()
    st = M.BatchStatus("combined", "noam", enabled=True, stream=buf,
                       min_interval=0.0)
    st.update_train(_status_metrics())
    out = buf.getvalue()
    assert out.startswith("\r")
    assert "drmsd=6.50" in out and "rmse=0.5000" in out
    assert "c=12.30" in out and "LR = " in out and "res/s=" in out
    # plateau scheduling omits the LR segment (reference log.py:33)
    buf2 = io.StringIO()
    st2 = M.BatchStatus("combined", "plateau", enabled=True, stream=buf2,
                        min_interval=0.0)
    st2.update_train(_status_metrics())
    assert "LR" not in buf2.getvalue()


def test_batch_status_eval_throttle_and_clear():
    import io
    buf = io.StringIO()
    st = M.BatchStatus("combined", "noam", enabled=True, stream=buf,
                       min_interval=3600.0)
    m = _status_metrics()
    st.update_eval("valid-70", m, force=True)
    first = buf.getvalue()
    assert "Eval-valid-70" in first and "drmsd = 6.5" in first
    st.update_eval("valid-70", m)  # throttled: nothing new
    assert buf.getvalue() == first
    st.clear()
    cleared = buf.getvalue()[len(first):]
    assert cleared.startswith("\r") and cleared.endswith("\r")
    assert set(cleared[1:-1]) <= {" "}


def test_batch_status_disabled_by_cluster_flag():
    import io
    buf = io.StringIO()
    # enabled=None auto-detects: a StringIO is not a tty -> disabled
    st = M.BatchStatus("mse", "noam", enabled=None, stream=buf)
    st.update_train(_status_metrics(), force=True)
    assert buf.getvalue() == ""
    # the Trainer wires cfg.cluster -> enabled=False
    from protein_transformer_tpu.config import TrainConfig
    from protein_transformer_tpu.training.trainer import Trainer
    from protein_transformer_tpu.data.synthetic import make_dataset
    cfg = TrainConfig(model="enc-only", d_model=16, d_ff=32, n_heads=2,
                      n_layers=1, loss="mse", max_seq_len=16,
                      bucket_sizes=(16,), batch_size=2, train_only=True,
                      cluster=True, out_dir="/tmp/ptt_status_test",
                      name="st")
    tr = Trainer(cfg, data=make_dataset(n_train=2, n_eval=1, min_len=8,
                                        max_len=12, seed=0))
    assert tr.batch_status.enabled is False


def test_cli_accepts_cluster_flag():
    from protein_transformer_tpu.training.cli import config_from_args
    cfg = config_from_args(["--data", "x.pt", "-c", "True"])
    assert cfg.cluster is True
    assert config_from_args(["--data", "x.pt"]).cluster is False
