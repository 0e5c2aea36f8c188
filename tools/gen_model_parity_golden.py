#!/usr/bin/env python
"""Generate tests/golden/model_parity_*.npz from the mounted reference.

For each model family, builds the seeded reference torch model, transplants
its weights into the flax module (models/torch_import.py), and freezes
(inputs, transplanted params, torch forward output) so
tests/test_model_parity.py can pin flax==torch parity without the reference
or torch present. Run with /root/reference mounted:

    python tools/gen_model_parity_golden.py
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

# the axon sitecustomize overrides JAX_PLATFORMS at config level; force CPU
# the same way tests/conftest.py does
jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir, "tests"))
import test_model_parity as tp  # noqa: E402
from protein_transformer_tpu.models.torch_import import (  # noqa: E402
    state_dict_to_flax)


def main():
    out_dir = tp.GOLDEN_DIR
    os.makedirs(out_dir, exist_ok=True)
    ids, ang = tp.make_inputs()
    for name, (module, _needs_tgt) in tp.flax_cases().items():
        init_params = module.init(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1),
             "sampling": jax.random.PRNGKey(2)},
            jnp.asarray(ids), jnp.asarray(np.nan_to_num(ang)))
        ref_model = tp.torch_reference_model(name)
        params = {"params": state_dict_to_flax(ref_model.state_dict(),
                                               init_params["params"])}
        expected = tp.torch_forward(name, ref_model, ids, ang)
        ours = tp.flax_forward(name, module, params, ids, ang)
        err = float(np.max(np.abs(ours - expected)))
        payload = {"ids": ids, "ang": ang, "expected": expected}
        for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
            payload["p" + jax.tree_util.keystr(path)] = np.asarray(leaf)
        out = os.path.join(out_dir, f"model_parity_{name}.npz")
        np.savez_compressed(out, **payload)
        print(f"{name}: max|flax-torch| = {err:.2e} -> {out}")


if __name__ == "__main__":
    main()
