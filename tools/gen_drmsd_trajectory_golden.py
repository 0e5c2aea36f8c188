"""Generate the frozen dRMSD-family trajectory golden
(tests/golden/drmsd_trajectory.npz).

Same protocol as gen_optim_trajectory_golden.py, for the lndrmsd/combined
cases under --grad_semantics reference (tests/test_optim_trajectory.py's
DRMSD_CASES): transplant the reference init, freeze (init params, our
per-step loss curves) so reference-less CI pins the trajectories.

Usage: python tools/gen_drmsd_trajectory_golden.py
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
        DRMSD_CASES, GOLDEN_DRMSD, angle_means, make_drmsd_stream,
        run_ours_drmsd, run_reference_drmsd, DM, DFF, NH, NL, _DLEN)
    from protein_transformer_tpu.models.encoder_only import (
        EncoderOnlyTransformer)
    from protein_transformer_tpu.models.torch_import import state_dict_to_flax
    from protein_transformer_tpu.protein.vocab import VOCAB

    out = {}
    _theirs, init_sd = run_reference_drmsd(DRMSD_CASES["lndrmsd"])
    am = tuple(float(a) for a in angle_means())
    module = EncoderOnlyTransformer(
        n_layers=NL, n_heads=NH, d_model=DM, d_ff=DFF, max_len=_DLEN,
        vocab_size=len(VOCAB), angle_means=am, use_tanh_out=True,
        dropout=0.0, pad_id=VOCAB.pad_id)
    b0 = make_drmsd_stream()[0]
    init = module.init({"params": jax.random.PRNGKey(0)}, jnp.asarray(b0.seq))
    params = {"params": state_dict_to_flax(init_sd, init["params"])}
    for kpath, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        out["p" + jax.tree_util.keystr(kpath)] = np.asarray(leaf)

    for name, case in DRMSD_CASES.items():
        ours = run_ours_drmsd(case, ref_state_dict=init_sd)
        theirs, _ = run_reference_drmsd(case)
        d = np.abs(ours - theirs)
        print(f"{name}: ours[0]={ours[0]:.5f} ours[-1]={ours[-1]:.5f} "
              f"max|ours-ref|={d.max():.2e} "
              f"mean-rel={abs(ours.mean()-theirs.mean())/theirs.mean():.4f}")
        out[f"loss_{name}"] = ours
        out[f"ref_loss_{name}"] = theirs

    os.makedirs(os.path.dirname(GOLDEN_DRMSD), exist_ok=True)
    np.savez_compressed(GOLDEN_DRMSD, **out)
    print(f"wrote {GOLDEN_DRMSD} ({os.path.getsize(GOLDEN_DRMSD)} bytes)")


if __name__ == "__main__":
    main()
