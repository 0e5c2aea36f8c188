"""Model architecture tests: shapes, signature init, conv bookkeeping parity."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from protein_transformer_tpu.config import TrainConfig
from protein_transformer_tpu.models.conv_encoder import (
    ConvEncoderOnlyTransformer, conv_layer_dims, conv_out_size)
from protein_transformer_tpu.models.enc_dec import Transformer
from protein_transformer_tpu.models.encoder_only import EncoderOnlyTransformer
from protein_transformer_tpu.models.factory import (
    make_model, parse_conv_kernel_info_from_model_name)
from protein_transformer_tpu.protein.constants import NUM_PREDICTED_ANGLES
from protein_transformer_tpu.protein.vocab import VOCAB

B, L = 2, 24
ANGLE_MEANS = np.clip(np.random.default_rng(0).normal(0, 0.3, 24), -0.9, 0.9)


def make_ids(rng, b=B, l=L, pad_from=None):
    ids = rng.integers(0, 20, (b, l))
    if pad_from is not None:
        ids[:, pad_from:] = VOCAB.pad_id
    return jnp.asarray(ids, jnp.int32)


def test_encoder_only_shapes_and_mean_init():
    rng = np.random.default_rng(1)
    model = EncoderOnlyTransformer(
        n_layers=2, n_heads=4, d_model=32, d_ff=64, max_len=L,
        vocab_size=len(VOCAB), angle_means=tuple(ANGLE_MEANS))
    ids = make_ids(rng, pad_from=20)
    params = model.init(jax.random.PRNGKey(0), ids)
    out = model.apply(params, ids)
    assert out.shape == (B, L, NUM_PREDICTED_ANGLES * 2)
    # Zero output kernel + arctanh(mean) bias => untrained model predicts the
    # dataset mean angles everywhere (encoder_only.py:24-34).
    np.testing.assert_allclose(np.asarray(out[0, 0]), ANGLE_MEANS, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out[1, 5]), ANGLE_MEANS, atol=1e-5)


def test_encoder_only_linear_out():
    rng = np.random.default_rng(2)
    model = EncoderOnlyTransformer(
        n_layers=1, n_heads=2, d_model=16, d_ff=32, max_len=L,
        vocab_size=len(VOCAB), angle_means=tuple(ANGLE_MEANS),
        use_tanh_out=False)
    ids = make_ids(rng)
    params = model.init(jax.random.PRNGKey(0), ids)
    out = model.apply(params, ids)
    np.testing.assert_allclose(np.asarray(out[0, 0]), ANGLE_MEANS, atol=1e-5)


def test_padding_does_not_leak_into_valid_positions():
    """Attention must not attend to pad keys: output at valid positions is
    invariant to pad-region content."""
    rng = np.random.default_rng(3)
    model = EncoderOnlyTransformer(
        n_layers=2, n_heads=4, d_model=32, d_ff=64, max_len=L,
        vocab_size=len(VOCAB), angle_means=tuple(ANGLE_MEANS))
    ids = np.asarray(make_ids(rng, pad_from=16))
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(ids))
    out1 = model.apply(params, jnp.asarray(ids))
    ids2 = ids.copy()
    # pad ids stay pad; perturb nothing else -- instead extend: change pad
    # region to different pad-count? Padding ids are all pad_id; the mask is
    # what isolates them. Verify via hidden perturbation: replace pad region
    # with other pad runs has no effect (they're identical), so instead check
    # that truncating the sequence gives the same prefix output.
    short = jnp.asarray(ids[:, :16])
    out2 = model.apply(params, short)
    np.testing.assert_allclose(np.asarray(out1[:, :16]), np.asarray(out2),
                               atol=2e-5)


def test_conv_out_size_matches_reference_formula():
    # dm=256, reductions (.5,.5,.5) -> 2048 (the real run config in
    # research/cluster/200330.txt used channel *increases*)
    assert conv_out_size(256, 22, True, [0.5, 0.5, 0.5], False) == 2048
    assert conv_out_size(256, 22, True, [2, 2, 2], False) == 32
    assert conv_out_size(256, 22, True, [2, 2, 2], True) == 256
    dims = conv_layer_dims(256, 22, True, [3, 5, 7], [2, 2, 2], False)
    assert dims == [(3, 256, 128), (5, 128, 64), (7, 64, 32)]
    dims = conv_layer_dims(256, 22, True, [3, 5, 7], [2, 2, 2], True)
    assert dims == [(3, 256, 128), (5, 128, 64), (7, 64, 256)]


@pytest.mark.parametrize("use_embedding,matches_dm", [(True, True),
                                                      (True, False),
                                                      (False, False)])
def test_conv_encoder_shapes(use_embedding, matches_dm):
    rng = np.random.default_rng(4)
    model = ConvEncoderOnlyTransformer(
        n_layers=1, n_heads=2, d_model=32, d_ff=64, max_len=L,
        vocab_size=len(VOCAB), angle_means=tuple(ANGLE_MEANS),
        conv_kernel_sizes=(3, 5), conv_dim_reductions=(2.0, 0.5),
        use_embedding=use_embedding, conv_out_matches_dm=matches_dm)
    ids = make_ids(rng, pad_from=20)
    params = model.init(jax.random.PRNGKey(0), ids)
    out = model.apply(params, ids)
    assert out.shape == (B, L, NUM_PREDICTED_ANGLES * 2)
    np.testing.assert_allclose(np.asarray(out[0, 0]), ANGLE_MEANS, atol=1e-5)


def test_enc_dec_teacher_forcing():
    rng = np.random.default_rng(5)
    model = Transformer(
        n_enc_layers=1, n_dec_layers=1, n_heads=2, d_model=16, d_ff=32,
        max_len=L, vocab_size=len(VOCAB), angle_means=tuple(ANGLE_MEANS))
    ids = make_ids(rng)
    tgt = jnp.asarray(rng.uniform(-0.9, 0.9, (B, L, 24)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), ids, tgt)
    out = model.apply(params, ids, tgt)
    assert out.shape == (B, L, 24)
    # causal: output at t must not depend on targets at >= t (input shifted
    # right, so output t sees targets < t)
    tgt2 = tgt.at[:, 10:, :].set(0.123)
    out2 = model.apply(params, ids, tgt2)
    np.testing.assert_allclose(np.asarray(out[:, :10]),
                               np.asarray(out2[:, :10]), atol=1e-5)


def test_enc_dec_scheduled_sampling_and_predict():
    rng = np.random.default_rng(6)
    model = Transformer(
        n_enc_layers=1, n_dec_layers=1, n_heads=2, d_model=16, d_ff=32,
        max_len=12, vocab_size=len(VOCAB), angle_means=tuple(ANGLE_MEANS),
        fraction_complete_tf=0.0, fraction_subseq_tf=0.5)
    ids = make_ids(rng, l=12)
    tgt = jnp.asarray(rng.uniform(-0.9, 0.9, (B, 12, 24)), jnp.float32)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        ids, tgt)
    out = model.apply(params, ids, tgt,
                      rngs={"sampling": jax.random.PRNGKey(2)})
    assert out.shape == (B, 12, 24)
    pred = model.apply(params, ids, method=Transformer.predict)
    assert pred.shape == (B, 12, 24)
    assert np.isfinite(np.asarray(pred)).all()


def test_factory_and_conv_name_parsing():
    assert parse_conv_kernel_info_from_model_name("conv-enc|3,7,11|2,2,2") == \
        ([3, 7, 11], [2.0, 2.0, 2.0])
    assert parse_conv_kernel_info_from_model_name("conv-enc") == ([], [])

    cfg = TrainConfig(model="conv-enc-linear-out|21,11,3|.5,.5,.5",
                      d_model=64, d_ff=128, n_heads=4, n_layers=2,
                      max_seq_len=L).finalize()
    assert cfg.model == "conv-enc-linear-out"
    assert cfg.conv1_size == 21 and cfg.conv1_reduc == 0.5
    model = make_model(cfg, ANGLE_MEANS)
    ids = make_ids(np.random.default_rng(7))
    params = model.init(jax.random.PRNGKey(0), ids)
    out = model.apply(params, ids)
    assert out.shape == (B, L, 24)
    # linear-out: bias is raw angle means
    np.testing.assert_allclose(np.asarray(out[0, 0]), ANGLE_MEANS, atol=1e-5)


def test_factory_enc_only_and_enc_dec():
    for name in ["enc-only", "enc-dec"]:
        cfg = TrainConfig(model=name, d_model=16, d_ff=32, n_heads=2,
                          n_layers=1, max_seq_len=L).finalize()
        model = make_model(cfg, ANGLE_MEANS)
        ids = make_ids(np.random.default_rng(8))
        tgt = jnp.zeros((B, L, 24), jnp.float32)
        if name == "enc-dec":
            params = model.init(jax.random.PRNGKey(0), ids, tgt)
            out = model.apply(params, ids, tgt)
        else:
            params = model.init(jax.random.PRNGKey(0), ids)
            out = model.apply(params, ids)
        assert out.shape == (B, L, 24)


def test_noam_schedule():
    from protein_transformer_tpu.training.optim import noam_schedule
    sched = noam_schedule(512, 4000)
    # reference formula at a few steps (Optimizer.py:31-46)
    for step in [1, 100, 4000, 10000]:
        want = 512 ** -0.5 * min(step ** -0.5, 4000 ** -1.5 * step)
        got = float(sched(step - 1))
        assert abs(got - want) < 1e-9, (step, got, want)


def test_plateau_and_early_stopping():
    from protein_transformer_tpu.training.optim import (
        EarlyStopping, PlateauState)
    p = PlateauState(patience=2, threshold=0.01)
    scales = [p.step(m) for m in [1.0, 0.5, 0.5, 0.5, 0.5]]
    # best=0.5 at epoch1; epochs 2,3 bad (2 = patience), epoch 4 bad -> decay
    assert scales[-1] == pytest.approx(0.1)

    es = EarlyStopping(patience=2, threshold=0.001)
    stops = [es.update(i, m) for i, m in enumerate([1.0, 0.9, 0.9, 0.9, 0.9])]
    assert stops == [False, False, False, False, True]


def test_bfloat16_trunk_matches_float32():
    """--compute_dtype bfloat16 keeps the head fp32 and stays close to the
    fp32 trunk: params are float32 (flax param_dtype default), the output is
    float32, and the predicted sin/cos pairs agree to bf16 resolution."""
    rng = np.random.default_rng(11)
    ids = make_ids(rng, pad_from=20)
    outs = {}
    for dtype in ["float32", "bfloat16"]:
        cfg = TrainConfig(model="conv-enc|11|1", d_model=32, d_ff=64,
                          n_heads=4, n_layers=2, max_seq_len=L,
                          dropout=0.0, compute_dtype=dtype).finalize()
        model = make_model(cfg, ANGLE_MEANS)
        params = model.init(jax.random.PRNGKey(3), ids)
        # identical fp32 master weights under both trunks
        leaf_dtypes = {p.dtype for p in jax.tree_util.tree_leaves(params)}
        assert leaf_dtypes == {jnp.dtype(jnp.float32)}, (dtype, leaf_dtypes)
        out = model.apply(params, ids)
        assert out.dtype == jnp.float32, (dtype, out.dtype)
        outs[dtype] = np.asarray(out)
    # zero-init head makes the untrained outputs equal; perturb via init of a
    # *linear-out* model instead for a non-degenerate comparison
    np.testing.assert_allclose(outs["bfloat16"], outs["float32"], atol=1e-2)

    outs = {}
    for dtype in ["float32", "bfloat16"]:
        model = EncoderOnlyTransformer(
            n_layers=2, n_heads=4, d_model=32, d_ff=64, max_len=L,
            vocab_size=len(VOCAB), angle_means=tuple(ANGLE_MEANS),
            use_tanh_out=False, dtype=jnp.dtype(dtype))
        params = model.init(jax.random.PRNGKey(4), ids)
        # make the head non-trivial so trunk activations reach the output
        head = params["params"]["AngleProjection_0"]["output_projection"]
        head["kernel"] = jax.random.normal(
            jax.random.PRNGKey(5), head["kernel"].shape, jnp.float32) * 0.2
        outs[dtype] = np.asarray(model.apply(params, ids))
    # bf16 has ~3 decimal digits; activations are O(1) post-LayerNorm
    np.testing.assert_allclose(outs["bfloat16"], outs["float32"],
                               atol=6e-2, rtol=0)
    assert np.abs(outs["bfloat16"] - outs["float32"]).max() > 0, \
        "bf16 trunk produced bit-identical output: dtype not plumbed?"


def test_bfloat16_training_step_finite():
    """One optimizer step under the bf16 trunk: loss finite, params move."""
    from protein_transformer_tpu.data.synthetic import make_dataset
    from protein_transformer_tpu.training.trainer import Trainer
    import tempfile
    data = make_dataset(n_train=4, n_eval=2, min_len=8, max_len=24, seed=3)
    with tempfile.TemporaryDirectory() as td:
        cfg = TrainConfig(model="enc-only", d_model=16, d_ff=32, n_heads=2,
                          n_layers=1, batch_size=4, epochs=1, loss="combined",
                          optimizer="adam", lr_scheduling="noam",
                          bucket_sizes=(24,), max_seq_len=24, dropout=0.0,
                          out_dir=td, name="bf16", train_only=True,
                          compute_dtype="bfloat16")
        tr = Trainer(cfg, data=data)
        tr.train()
        hist = tr.metrics["train"]["epoch-history-combined"]
        assert len(hist) == 1 and np.isfinite(hist[0]), hist
