"""Weight-transplant model parity: the flax forward equals the reference
torch forward given identical weights (reference: models/encoder_only.py:36-42,
models/convolutional_encoder.py:42-49, models/transformer/Transformer.py:42-52).

Two layers of evidence:
* with /root/reference mounted: build the torch model (seeded), transplant its
  state_dict via ``models.torch_import``, and differential-test the forwards.
* always: frozen goldens (tests/golden/model_parity_*.npz, generated from the
  torch transplant by tools/gen_model_parity_golden.py) pin the flax forward
  to the torch-derived outputs without needing torch or the reference.
"""
import os
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from protein_transformer_tpu.models.conv_encoder import (
    ConvEncoderOnlyTransformer)
from protein_transformer_tpu.models.enc_dec import Transformer as EncDec
from protein_transformer_tpu.models.encoder_only import EncoderOnlyTransformer
from protein_transformer_tpu.models.torch_import import state_dict_to_flax
from protein_transformer_tpu.protein.vocab import VOCAB

REFERENCE = "/root/reference"
GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
needs_reference = pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference repo not mounted")

B, L, DM, DFF, NH, NL = 2, 12, 32, 64, 2, 2


def make_inputs(seed=0, with_nan=False):
    rng = np.random.default_rng(seed)
    ids = rng.integers(0, 20, (B, L)).astype(np.int32)
    ids[0, -3:] = VOCAB.pad_id  # padded tail
    ang = rng.uniform(-0.9, 0.9, (B, L, 24)).astype(np.float32)
    if with_nan:
        ang[1, 4] = np.nan  # a missing residue row
    return ids, ang


def angle_means(seed=1):
    return np.random.default_rng(seed).uniform(-0.5, 0.5, 24).astype(
        np.float32)


def flax_cases():
    """name -> (module, needs_target) for every active model family."""
    am = tuple(float(a) for a in angle_means())
    return {
        "enc-only": (EncoderOnlyTransformer(
            n_layers=NL, n_heads=NH, d_model=DM, d_ff=DFF, max_len=L,
            vocab_size=len(VOCAB), angle_means=am, use_tanh_out=True,
            dropout=0.1, pad_id=VOCAB.pad_id), False),
        "conv-enc": (ConvEncoderOnlyTransformer(
            n_layers=NL, n_heads=NH, d_model=DM, d_ff=DFF, max_len=L,
            vocab_size=len(VOCAB), angle_means=am,
            conv_kernel_sizes=(5, 3), conv_dim_reductions=(2.0, 2.0),
            use_tanh_out=True, use_embedding=True, conv_out_matches_dm=True,
            dropout=0.1, pad_id=VOCAB.pad_id), False),
        "conv-enc-noemb": (ConvEncoderOnlyTransformer(
            n_layers=NL, n_heads=NH, d_model=DM, d_ff=DFF, max_len=L,
            vocab_size=len(VOCAB), angle_means=am,
            conv_kernel_sizes=(3,), conv_dim_reductions=(0.5,),
            use_tanh_out=False, use_embedding=False,
            conv_out_matches_dm=True, dropout=0.1, pad_id=VOCAB.pad_id),
            False),
        "enc-dec": (EncDec(
            n_enc_layers=NL, n_dec_layers=NL, n_heads=NH, d_model=DM,
            d_ff=DFF, max_len=L, vocab_size=len(VOCAB), angle_means=am,
            dropout=0.1, pad_id=VOCAB.pad_id), True),
    }


def torch_reference_model(name):
    """Build + seed the reference torch model for a case."""
    import torch
    for mod in ("wandb", "prody"):
        if mod not in sys.modules:
            sys.modules[mod] = types.ModuleType(mod)
    sys.path.insert(0, REFERENCE)
    try:
        from protein_transformer.models.encoder_only import (
            EncoderOnlyTransformer as RefEnc)
        from protein_transformer.models.convolutional_encoder import (
            ConvEncoderOnlyTransformer as RefConv)
        from protein_transformer.models.transformer.Transformer import (
            Transformer as RefTrans)
    finally:
        sys.path.remove(REFERENCE)
    torch.manual_seed(0)
    am = angle_means()
    if name == "enc-only":
        m = RefEnc(NL, NH, DM, DFF, L, VOCAB, am, use_tanh_out=True)
    elif name == "conv-enc":
        m = RefConv(NL, NH, DM, DFF, L, VOCAB, am, True,
                    conv_kernel_sizes=[5, 3], conv_dim_reductions=[2.0, 2.0],
                    use_embedding=True, conv_out_matches_dm=True)
    elif name == "conv-enc-noemb":
        m = RefConv(NL, NH, DM, DFF, L, VOCAB, am, False,
                    conv_kernel_sizes=[3], conv_dim_reductions=[0.5],
                    use_embedding=False, conv_out_matches_dm=True)
    elif name == "enc-dec":
        m = RefTrans(DM, DFF, len(VOCAB), 24, NH, NL, NL, L, VOCAB.pad_id,
                     0.0, torch.device("cpu"), 0.1, 1.0, 1.0, am)
    else:
        raise KeyError(name)
    return m.eval()


def flax_forward(name, module, params, ids, ang):
    if name == "enc-dec":
        return np.asarray(module.apply(
            params, jnp.asarray(ids), jnp.asarray(np.nan_to_num(ang)),
            deterministic=True, method=module.forward_tf))
    return np.asarray(module.apply(params, jnp.asarray(ids),
                                   deterministic=True))


def torch_forward(name, ref_model, ids, ang):
    import torch
    with torch.no_grad():
        if name == "enc-dec":
            # pre-shift like the reference forward() (Transformer.py:58-66)
            clean = np.nan_to_num(ang)
            sos = np.full_like(clean[:, :1], -0.1)
            shifted = np.concatenate([sos, clean[:, :-1]], axis=1)
            out = ref_model.forward_tf(torch.from_numpy(ids).long(),
                                       torch.from_numpy(shifted))
        else:
            out = ref_model(torch.from_numpy(ids).long())
    return out.numpy()


@needs_reference
@pytest.mark.parametrize("name", ["enc-only", "conv-enc", "conv-enc-noemb",
                                  "enc-dec"])
def test_forward_parity_with_transplanted_weights(name):
    module, _needs_tgt = flax_cases()[name]
    ids, ang = make_inputs()
    init_params = module.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
         "sampling": jax.random.PRNGKey(2)},
        jnp.asarray(ids), jnp.asarray(np.nan_to_num(ang)))
    ref_model = torch_reference_model(name)
    params = {"params": state_dict_to_flax(ref_model.state_dict(),
                                           init_params["params"])}
    ours = flax_forward(name, module, params, ids, ang)
    theirs = torch_forward(name, ref_model, ids, ang)
    np.testing.assert_allclose(ours, theirs, atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("name", ["enc-only", "conv-enc", "conv-enc-noemb",
                                  "enc-dec"])
def test_forward_matches_frozen_golden(name):
    path = os.path.join(GOLDEN_DIR, f"model_parity_{name}.npz")
    if not os.path.exists(path):
        pytest.skip("golden not generated yet "
                    "(tools/gen_model_parity_golden.py)")
    z = np.load(path)
    module, _ = flax_cases()[name]
    ids, ang = z["ids"], z["ang"]
    init_params = module.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
         "sampling": jax.random.PRNGKey(2)},
        jnp.asarray(ids), jnp.asarray(np.nan_to_num(ang)))

    def fill(kpath, leaf):
        key = "p" + jax.tree_util.keystr(kpath)
        arr = z[key]
        assert arr.shape == leaf.shape, (key, arr.shape, leaf.shape)
        return arr

    params = jax.tree_util.tree_map_with_path(fill, init_params)
    ours = flax_forward(name, module, params, ids, ang)
    np.testing.assert_allclose(ours, z["expected"], atol=2e-5, rtol=1e-4)
