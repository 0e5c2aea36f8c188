"""Analytic FLOPs model (training/flops.py) vs XLA's own cost analysis.

The analytic model only counts dense work (matmuls, conv, attention,
pair sweep), so it should land within a modest factor of the compiled
HLO's flop estimate -- close enough that MFU numbers derived from it are
trustworthy to ~10-20%.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from protein_transformer_tpu.config import TrainConfig
from protein_transformer_tpu.models.factory import make_model
from protein_transformer_tpu.training import flops as F


def _xla_flops(fn, *args) -> float:
    cost = jax.jit(fn).lower(*args).compile().cost_analysis()
    if isinstance(cost, list):  # older jax returns one dict per computation
        cost = cost[0]
    return float(cost["flops"])


def _cfg(**kw) -> TrainConfig:
    base = dict(model="enc-only", d_model=64, d_ff=256, n_heads=4,
                n_layers=2, dropout=0.0, loss="mse", max_seq_len=64,
                bucket_sizes=(64,), batch_size=4, train_only=True)
    base.update(kw)
    return TrainConfig(**base).finalize()


@pytest.mark.parametrize("spec", [
    dict(),                                              # enc-only
    dict(model="conv-enc|11,5,3|2,2,1", d_model=128),    # conv front-end
    dict(model="enc-dec"),                               # decoder stack
])
def test_model_forward_flops_tracks_xla(spec):
    cfg = _cfg(**spec)
    b, l = 4, 64
    model = make_model(cfg, np.zeros(24, np.float32))
    ids = jnp.full((b, l), 3, jnp.int32)
    ang = jnp.zeros((b, l, 24), jnp.float32)
    params = model.init({"params": jax.random.PRNGKey(0),
                         "dropout": jax.random.PRNGKey(1),
                         "sampling": jax.random.PRNGKey(2)}, ids, ang)

    def fwd(p):
        return model.apply(p, ids, ang, deterministic=True)

    xla = _xla_flops(fwd, params)
    analytic = F.model_forward_flops(cfg, b, l)
    # XLA counts extra elementwise/softmax/layernorm work the analytic
    # model ignores; the dense part must dominate both.
    assert 0.5 * xla <= analytic <= 1.6 * xla, (analytic, xla)


def test_train_step_flops_tracks_xla_grad():
    cfg = _cfg(model="conv-enc|11,5,3|1,1,1", d_model=128, d_ff=512)
    b, l = 4, 64
    model = make_model(cfg, np.zeros(24, np.float32))
    ids = jnp.full((b, l), 3, jnp.int32)
    ang = jnp.zeros((b, l, 24), jnp.float32)
    mask = jnp.ones((b, l, 24), bool)
    params = model.init({"params": jax.random.PRNGKey(0),
                         "dropout": jax.random.PRNGKey(1),
                         "sampling": jax.random.PRNGKey(2)}, ids, ang)

    from protein_transformer_tpu import losses as L

    def loss_fn(p):
        pred = model.apply(p, ids, ang, deterministic=True)
        return L.mse_over_angles(pred, ang, mask)

    xla = _xla_flops(jax.grad(loss_fn), params)
    analytic = F.train_step_flops(cfg, b, l)
    assert 0.5 * xla <= analytic <= 2.0 * xla, (analytic, xla)


def test_loss_flops_scaling():
    # full-atom sweep is (14/3)^2 the backbone sweep, ~L^2 growth
    cfg_bb = _cfg(loss="lndrmsd", backbone_loss=True)
    cfg_full = _cfg(loss="lndrmsd", backbone_loss=False)
    bb = F.loss_forward_flops(cfg_bb, 1, 100)
    full = F.loss_forward_flops(cfg_full, 1, 100)
    assert full > 15 * bb
    assert F.loss_forward_flops(cfg_bb, 1, 200) > 3.5 * bb
    assert F.loss_forward_flops(_cfg(loss="mse"), 1, 100) == 0.0


def test_mfu_sane():
    cfg = _cfg(model="conv-enc|21,11,3|1,1,1", d_model=512, d_ff=2048,
               n_layers=6, loss="combined")
    # flagship shape at its round-4 step time must land in (0, 1)
    u = F.mfu(cfg, 8, 256, 7.5e-3, n_chips=1, device_kind="TPU v5 lite")
    assert 0.01 < u < 1.0, u
    # faster step => higher utilization
    assert F.mfu(cfg, 8, 256, 5e-3, device_kind="TPU v5 lite") > u
    assert F.peak_flops_per_chip("TPU v4") == 275e12
