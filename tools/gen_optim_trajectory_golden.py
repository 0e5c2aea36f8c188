"""Generate the frozen optimizer-trajectory golden
(tests/golden/optim_trajectory.npz).

Runs the reference torch stack (mounted at /root/reference) for both
optimizer cases, transplants its init weights, runs our stack on the same
batch stream, and freezes (init params, our per-step loss curves) so
reference-less CI pins the trajectory (tests/test_optim_trajectory.py).

Usage: python tools/gen_optim_trajectory_golden.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import numpy as np  # noqa: E402


def main():
    os.environ.setdefault("XLA_FLAGS",
                          "--xla_force_host_platform_device_count=1")
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from test_optim_trajectory import (
        CASES, GOLDEN, angle_means, make_stream, run_ours, run_reference,
        DM, DFF, NH, NL, SEQ_LEN)
    from protein_transformer_tpu.models.encoder_only import (
        EncoderOnlyTransformer)
    from protein_transformer_tpu.models.torch_import import state_dict_to_flax
    from protein_transformer_tpu.protein.vocab import VOCAB

    out = {}
    # the init weights are shared across cases (torch.manual_seed(0))
    _theirs, init_sd = run_reference(CASES["adam_noam"])
    am = tuple(float(a) for a in angle_means())
    module = EncoderOnlyTransformer(
        n_layers=NL, n_heads=NH, d_model=DM, d_ff=DFF, max_len=SEQ_LEN,
        vocab_size=len(VOCAB), angle_means=am, use_tanh_out=True,
        dropout=0.0, pad_id=VOCAB.pad_id)
    ids, _ = make_stream()
    init = module.init({"params": jax.random.PRNGKey(0)}, jnp.asarray(ids[0]))
    params = {"params": state_dict_to_flax(init_sd, init["params"])}
    for kpath, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        out["p" + jax.tree_util.keystr(kpath)] = np.asarray(leaf)

    for name, case in CASES.items():
        ours = run_ours(case, ref_state_dict=init_sd)
        theirs, _ = run_reference(case)
        d = np.abs(ours - theirs)
        print(f"{name}: ours[0]={ours[0]:.5f} ours[-1]={ours[-1]:.5f} "
              f"max|ours-ref|={d.max():.2e}")
        out[f"loss_{name}"] = ours
        out[f"ref_loss_{name}"] = theirs

    os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
    np.savez_compressed(GOLDEN, **out)
    print(f"wrote {GOLDEN} ({os.path.getsize(GOLDEN)} bytes)")


if __name__ == "__main__":
    main()
