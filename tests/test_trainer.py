"""End-to-end trainer tests on synthetic data (CPU, small configs)."""
import os

import numpy as np
import pytest

import jax

from protein_transformer_tpu.config import TrainConfig
from protein_transformer_tpu.data.synthetic import make_dataset
from protein_transformer_tpu.training.trainer import Trainer


@pytest.fixture(scope="module")
def data():
    return make_dataset(n_train=12, n_eval=3, min_len=8, max_len=24, seed=0)


def small_cfg(tmp_path, **kw):
    base = dict(model="enc-only", d_model=16, d_ff=32, n_heads=2, n_layers=1,
                batch_size=4, epochs=2, loss="mse", optimizer="adam",
                learning_rate=1e-3, lr_scheduling="plateau",
                bucket_sizes=(16, 24), max_seq_len=24,
                out_dir=str(tmp_path), name="t", dropout=0.0,
                train_only=True, early_stopping=0)
    base.update(kw)
    return TrainConfig(**base)


def test_mse_training_reduces_loss(tmp_path, data):
    cfg = small_cfg(tmp_path, epochs=4)
    tr = Trainer(cfg, data=data)
    state = tr.train()
    hist = tr.metrics["train"]["epoch-history-mse"]
    assert len(hist) == 4
    assert hist[-1] < hist[0], f"no learning: {hist}"
    assert os.path.exists(os.path.join(tr.out_dir, "t.train"))


def test_combined_loss_training(tmp_path, data):
    cfg = small_cfg(tmp_path, loss="combined", epochs=2)
    tr = Trainer(cfg, data=data)
    tr.train()
    hist = tr.metrics["train"]["epoch-history-combined"]
    assert len(hist) == 2 and all(np.isfinite(hist))
    assert tr.metrics["train"]["epoch-drmsd-full"] > 0


def test_full_eval_with_validation_splits(tmp_path, data):
    cfg = small_cfg(tmp_path, train_only=False, epochs=1, loss="mse")
    tr = Trainer(cfg, data=data)
    tr.train()
    for split in ("valid-70", "test"):
        assert tr.metrics[split]["epoch-mse-full"] > 0
        assert tr.metrics[split]["epoch-rmsd-full"] > 0  # eval computes rmsd


def test_checkpoint_resume(tmp_path, data):
    cfg = small_cfg(tmp_path, epochs=2, name="ckpt",
                    early_stopping_metric="train-mse")
    tr = Trainer(cfg, data=data)
    state = tr.train()
    assert tr.ckpt.exists("best")

    cfg2 = small_cfg(tmp_path, epochs=3, name="ckpt",
                     early_stopping_metric="train-mse")
    tr2 = Trainer(cfg2, data=data)
    s2 = tr2.init_state()
    s2 = tr2.maybe_restore(s2)
    assert tr2.start_epoch == 2
    # params restored (not reinitialized)
    leaves1 = jax.tree.leaves(state.params)
    leaves2 = jax.tree.leaves(s2.params)
    same = all(np.allclose(a, b) for a, b in zip(leaves1, leaves2))
    assert same


def test_restart_opt_with_changed_optimizer(tmp_path, data):
    """--restart_opt must load weights even when the optimizer/schedule
    config changed (the saved opt_state tree no longer matches)."""
    cfg = small_cfg(tmp_path, epochs=1, name="ro", optimizer="adam")
    tr = Trainer(cfg, data=data)
    state = tr.train()
    cfg2 = small_cfg(tmp_path, epochs=1, name="ro", optimizer="sgd",
                     restart_opt=True)
    tr2 = Trainer(cfg2, data=data)
    s2 = tr2.maybe_restore(tr2.init_state())
    leaves1 = jax.tree.leaves(state.params)
    leaves2 = jax.tree.leaves(s2.params)
    assert all(np.allclose(a, b) for a, b in zip(leaves1, leaves2))
    # fresh optimizer state of the NEW optimizer
    assert s2.opt_state is not None


def test_resume_survives_missing_meta_sidecar(tmp_path, data):
    """A crash between the array write and the process-0 sidecar write must
    not permanently break resume."""
    import os
    cfg = small_cfg(tmp_path, epochs=1, name="nometa")
    tr = Trainer(cfg, data=data)
    state = tr.train()
    os.remove(os.path.join(str(tmp_path), "nometa", "checkpoints",
                           "best.meta.json"))
    tr2 = Trainer(small_cfg(tmp_path, epochs=1, name="nometa"), data=data)
    s2 = tr2.maybe_restore(tr2.init_state())
    assert tr2.start_epoch == 0  # bookkeeping degrades, weights load
    leaves1 = jax.tree.leaves(state.params)
    leaves2 = jax.tree.leaves(s2.params)
    assert all(np.allclose(a, b) for a, b in zip(leaves1, leaves2))


def test_es_mode_validation(tmp_path, data):
    """Monitoring a split this run never evaluates fails fast at init, not
    with a KeyError after the first epoch."""
    import pytest
    with pytest.raises(ValueError, match="train_only"):
        Trainer(small_cfg(tmp_path, name="esv", train_only=True,
                          early_stopping_metric="valid-70-mse"), data=data)
    with pytest.raises(ValueError, match="not evaluated"):
        Trainer(small_cfg(tmp_path, name="esv2", train_only=False,
                          early_stopping_metric="test-mse"), data=data)


def test_restart_skips_restore(tmp_path, data):
    cfg = small_cfg(tmp_path, epochs=1, name="rst")
    Trainer(cfg, data=data).train()
    cfg2 = small_cfg(tmp_path, epochs=1, name="rst", restart=True)
    tr2 = Trainer(cfg2, data=data)
    s = tr2.maybe_restore(tr2.init_state())
    assert tr2.start_epoch == 0


def test_noam_scheduling(tmp_path, data):
    # repeat_train inflates the residue-budget sampler's epoch length so the
    # epoch has several steps (budget is batch_size * MAX_SEQ_LEN=500, which
    # swallows this tiny dataset in one batch -- reference dataset.py:249).
    cfg = small_cfg(tmp_path, lr_scheduling="noam", optimizer="adam",
                    epochs=1, repeat_train=30)
    tr = Trainer(cfg, data=data)
    tr.train()
    lrs = tr.metrics["history-lr"]
    assert len(lrs) > 2
    # warmup: lr increases initially
    assert lrs[-1] > lrs[1] > 0


def test_nan_watchdog(tmp_path, data):
    # repeat_train: the NaN surfaces one step after the blow-up update, and
    # the residue-budget sampler fits this tiny dataset in a single batch.
    cfg = small_cfg(tmp_path, learning_rate=1e9, epochs=1, optimizer="sgd",
                    clip=0.0, repeat_train=40)
    tr = Trainer(cfg, data=data)
    with pytest.raises(FloatingPointError):
        tr.train()


def test_nan_watchdog_detects_within_two_steps(tmp_path, data):
    """The watchdog must NOT trail the 32-step metric-drain window: the
    non-blocking readiness poll aborts within ~2 dispatches of the bad step
    (reference aborts on the offending batch, log.py:183-185)."""
    cfg = small_cfg(tmp_path, learning_rate=1e9, epochs=1, optimizer="sgd",
                    clip=0.0, repeat_train=40)
    tr = Trainer(cfg, data=data)
    assert tr.FLUSH_EVERY >= 32
    n_dispatched = [0]
    inner = tr._train_store_step_fn() if tr.train_store is not None \
        else tr._train_step_fn()

    def counting(*a, **kw):
        n_dispatched[0] += 1
        return inner(*a, **kw)

    key = "train_store" if tr.train_store is not None else "train"
    tr._jit_cache[key] = counting
    with pytest.raises(FloatingPointError):
        tr.train()
    # lr=1e9 sgd blows params up at the step-0 update -> loss NaN at step 1;
    # detection may run one dispatch ahead of execution
    assert n_dispatched[0] <= 4, (
        f"watchdog fired only after {n_dispatched[0]} dispatches")


def test_enc_dec_training(tmp_path, data):
    cfg = small_cfg(tmp_path, model="enc-dec", epochs=1, loss="mse")
    tr = Trainer(cfg, data=data)
    tr.train()
    assert np.isfinite(tr.metrics["train"]["epoch-mse-full"])


def test_conv_enc_training(tmp_path, data):
    cfg = small_cfg(tmp_path, model="conv-enc|3,3|1,2", epochs=1, loss="mse")
    tr = Trainer(cfg, data=data)
    tr.train()
    assert np.isfinite(tr.metrics["train"]["epoch-mse-full"])


def test_predict_end_to_end(tmp_path, data):
    """Train a tiny model, then run the predict tool against the run dir."""
    cfg = small_cfg(tmp_path, epochs=1, name="pred")
    Trainer(cfg, data=data).train()

    from protein_transformer_tpu.data.convert import convert
    data_dir = str(tmp_path / "native")
    convert(data, data_dir)

    from protein_transformer_tpu.predict import predict_structures
    out = str(tmp_path / "preds")
    paths = predict_structures(os.path.join(str(tmp_path), "pred"),
                               data_dir, split="test", n=2, out_dir=out)
    assert len(paths) == 4  # 2 pred + 2 true
    for p in paths:
        assert os.path.exists(p) and os.path.getsize(p) > 100

    recon = predict_structures(os.path.join(str(tmp_path), "pred"),
                               data_dir, split="test", n=1,
                               out_dir=str(tmp_path / "recon"),
                               reconstruct=True)
    assert any("recon" in p for p in recon)


def test_tensor_parallel_training(tmp_path, data):
    """dp x tp mesh: params shard over 'model', training matches dp-only."""
    cfg = small_cfg(tmp_path, name="tp", d_model=16, d_ff=32, n_heads=2,
                    epochs=1, mesh_shape=(4, 2), mesh_axes=("data", "model"),
                    seed=3)
    tr = Trainer(cfg, data=data)
    assert tr.mesh.shape == {"data": 4, "model": 2}
    state = tr.init_state()
    specs = [str(x.sharding.spec) for x in jax.tree.leaves(state.params)]
    assert any("model" in s for s in specs), "no TP-sharded parameters"
    tr.train(state)
    assert np.isfinite(tr.metrics["train"]["epoch-mse-full"])

    # numerics match the dp-only mesh
    cfg2 = small_cfg(tmp_path, name="dp", d_model=16, d_ff=32, n_heads=2,
                     epochs=1, seed=3)
    tr2 = Trainer(cfg2, data=data)
    tr2.train()
    assert abs(tr.metrics["train"]["epoch-mse-full"]
               - tr2.metrics["train"]["epoch-mse-full"]) < 1e-5


def test_eval_is_deterministic(tmp_path, data):
    cfg = small_cfg(tmp_path, epochs=1, name="det", train_only=False)
    tr = Trainer(cfg, data=data)
    state = tr.init_state()
    tr.eval_epoch(state.params, "valid-70", tr.dm.eval_batches("valid-70"),
                  None)
    first = dict(tr.metrics["valid-70"])
    tr.eval_epoch(state.params, "valid-70", tr.dm.eval_batches("valid-70"),
                  None)
    second = tr.metrics["valid-70"]
    for key in ("epoch-mse-full", "epoch-drmsd-full", "epoch-rmsd-full"):
        assert first[key] == second[key], key


def test_reference_grad_semantics(tmp_path, data):
    """--grad_semantics reference: the training gradient is the reference's
    stitched d(sum over proteins of per-protein ln-dRMSD) (losses.py:91-92,
    166-167) -- while the REPORTED loss value is unchanged."""
    import jax.numpy as jnp
    from protein_transformer_tpu import losses as L
    from protein_transformer_tpu.training.trainer import compute_losses

    cfg_mean = small_cfg(tmp_path, loss="lndrmsd")
    cfg_ref = small_cfg(tmp_path, loss="lndrmsd", grad_semantics="reference")
    tr = Trainer(cfg_mean, data=data)
    state = tr.init_state()
    batch = next(tr.dm.train_batches(np.random.default_rng(0)))

    def loss_of(cfg):
        return lambda p: compute_losses(tr.model, p, batch, cfg)[0]

    v_mean, g_mean = jax.value_and_grad(loss_of(cfg_mean))(state.params)
    v_ref, g_ref = jax.value_and_grad(loss_of(cfg_ref))(state.params)
    # same reported scalar
    np.testing.assert_allclose(float(v_ref), float(v_mean), rtol=1e-6)

    # explicit reference-semantics gradient: sum_i ln_drmsd_i
    def explicit(p):
        pred = tr.model.apply(p, batch.seq, batch.ang, deterministic=True)
        _res, per = L.compute_batch_drmsd(
            pred, batch.crd, batch.seq, batch.crd_mask, batch.protein_mask,
            with_per_protein=True)
        w = jnp.asarray(batch.protein_mask, per.ln_drmsd.dtype)
        return jnp.sum(per.ln_drmsd * w)

    g_explicit = jax.grad(explicit)(state.params)
    flat_ref = jax.tree.leaves(g_ref)
    flat_exp = jax.tree.leaves(g_explicit)
    flat_mean = jax.tree.leaves(g_mean)
    for a, b in zip(flat_ref, flat_exp):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)
    # and it differs from the mean-semantics gradient (sum vs mean scaling)
    diffs = [float(np.abs(np.asarray(a) - np.asarray(b)).max())
             for a, b in zip(flat_ref, flat_mean)]
    assert max(diffs) > 1e-6
