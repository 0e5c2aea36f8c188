"""Flash self-attention dispatch + wrapper tests (ops/attention.py).

The Pallas kernel itself is TPU-only; on this CPU suite the kernel call
is exercised through jax's own exact reference (mha_reference, pure
jnp) via monkeypatch, which validates everything the wrapper owns: the
pad-to-128 blocking, the segment-id construction, the sm_scale, and the
slice-back. Kernel-vs-XLA numerics on the real chip are measured by
tools/bench_attention.py and recorded in STATUS.md.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from protein_transformer_tpu.models.encoder_only import EncoderOnlyTransformer
from protein_transformer_tpu.models.factory import resolve_attention_impl
from protein_transformer_tpu.ops import attention as A
from protein_transformer_tpu.protein.vocab import VOCAB

ANGLE_MEANS = tuple(np.clip(
    np.random.default_rng(0).normal(0, 0.3, 24), -0.9, 0.9))


def _xla_masked_attention(q, k, v, valid):
    """The models/transformer.py XLA path, minus dropout (exact oracle)."""
    dk = q.shape[-1]
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    scores = scores / jnp.sqrt(jnp.asarray(dk, jnp.float32))
    big_neg = jnp.finfo(jnp.float32).min
    scores = jnp.where(valid[:, None, None, :], scores, big_neg)
    probs = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", probs.astype(q.dtype), v)


def _exact_kernel_shim(q, k, v, segment_ids=None, *, sm_scale, block_sizes):
    """Stands in for the TPU kernel on CPU: jax's own exact reference
    implementation of the same segment-id masked softmax."""
    from jax.experimental.pallas.ops.tpu.flash_attention import mha_reference
    del block_sizes
    return mha_reference(q, k, v, None, segment_ids, causal=False,
                         sm_scale=sm_scale)


@pytest.mark.parametrize("l", [24, 128, 200])
def test_flash_wrapper_matches_masked_softmax(monkeypatch, l):
    """Padding to the 128 block, segment ids, sm_scale and the slice-back
    must reproduce the XLA masked softmax exactly on every VALID row."""
    monkeypatch.setattr(A, "flash_attention", _exact_kernel_shim)
    rng = np.random.default_rng(7)
    b, h, d = 2, 2, 16
    q, k, v = (jnp.asarray(rng.normal(size=(b, h, l, d)), jnp.float32)
               for _ in range(3))
    n_valid = [l, max(l - 9, 1)]
    valid = jnp.asarray(np.arange(l)[None, :] < np.array(n_valid)[:, None])

    out = A.flash_self_attention(q, k, v, valid, sm_scale=1.0 / np.sqrt(d))
    ref = _xla_masked_attention(q, k, v, valid)
    assert out.shape == (b, h, l, d)
    for i, n in enumerate(n_valid):
        np.testing.assert_allclose(np.asarray(out[i, :, :n]),
                                   np.asarray(ref[i, :, :n]),
                                   rtol=2e-5, atol=2e-5)


def test_flash_unavailable_off_tpu():
    assert not A.flash_available()  # suite runs on CPU
    # 'auto' resolves to xla EVERYWHERE: the kernel measured slower than
    # XLA at this framework's shapes (see ops/attention.py docstring)
    assert resolve_attention_impl("auto") == "xla"
    assert resolve_attention_impl("flash") == "flash"
    assert resolve_attention_impl("xla") == "xla"


def _tiny_model(attn_impl):
    return EncoderOnlyTransformer(
        n_layers=2, n_heads=2, d_model=16, d_ff=32, max_len=24,
        vocab_size=len(VOCAB), angle_means=ANGLE_MEANS, attn_impl=attn_impl)


def test_flash_model_falls_back_identically_on_cpu():
    """attn_impl='flash' on a non-TPU backend must be bit-identical to
    'xla': flash_available() gates the kernel at trace time."""
    rng = np.random.default_rng(11)
    ids = np.asarray(rng.integers(0, 20, (2, 24)), np.int32)
    ids[:, 17:] = VOCAB.pad_id
    ids = jnp.asarray(ids)
    params = _tiny_model("xla").init(jax.random.PRNGKey(0), ids)
    out_xla = _tiny_model("xla").apply(params, ids)
    out_flash = _tiny_model("flash").apply(params, ids)
    np.testing.assert_array_equal(np.asarray(out_xla), np.asarray(out_flash))


def test_flash_dispatch_predicate(monkeypatch):
    """The kernel must be reached exactly when probs-dropout is off:
    deterministic calls yes, dropout>0 training calls no."""
    calls = []

    def counting_shim(q, k, v, segment_ids=None, *, sm_scale, block_sizes):
        calls.append(q.shape)
        return _exact_kernel_shim(q, k, v, segment_ids, sm_scale=sm_scale,
                                  block_sizes=block_sizes)

    monkeypatch.setattr(A, "flash_available", lambda: True)
    monkeypatch.setattr(A, "flash_attention", counting_shim)
    rng = np.random.default_rng(13)
    ids = jnp.asarray(rng.integers(0, 20, (2, 24)), jnp.int32)
    model = _tiny_model("flash")
    params = model.init(jax.random.PRNGKey(0), ids)

    calls.clear()
    model.apply(params, ids, deterministic=True)
    assert len(calls) == 2  # one per encoder layer

    calls.clear()
    model.apply(params, ids, deterministic=False,
                rngs={"dropout": jax.random.PRNGKey(1)})
    assert calls == []  # dropout hits the probs -> XLA path only

    # dropout == 0: flash is legal during training too
    model0 = EncoderOnlyTransformer(
        n_layers=1, n_heads=2, d_model=16, d_ff=32, max_len=24,
        vocab_size=len(VOCAB), angle_means=ANGLE_MEANS, dropout=0.0,
        attn_impl="flash")
    params0 = model0.init(jax.random.PRNGKey(0), ids)
    calls.clear()
    model0.apply(params0, ids, deterministic=False,
                 rngs={"dropout": jax.random.PRNGKey(1)})
    assert len(calls) == 1
