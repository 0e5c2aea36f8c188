#!/usr/bin/env python
"""Measure the reference implementation's training throughput locally.

BASELINE.md requires reference numbers to be measured, not copied. This runs
the reference's own modules (torch, CPU -- the only backend the reference
supports in this image) on the benchmark configuration: conv-enc dm=512
nl=6, combined mse+dRMSD loss, B=8 x L=256 synthetic batch, including its
CPU-pool dRMSD gradient stitching (sequential fallback if the pool cannot
start). Writes tools/reference_bench.json with residues/sec.

Run:  python tools/bench_reference.py [--steps N]
"""
import argparse
import json
import os
import sys
import time
import types

import numpy as np

REFERENCE = "/root/reference"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--length", type=int, default=256)
    ap.add_argument("--pool", action="store_true",
                    help="use the reference's multiprocessing pool")
    args = ap.parse_args()

    # stub wandb/prody so reference modules import
    for name in ("wandb", "prody"):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            mod.log = lambda *a, **k: None
            sys.modules[name] = mod
    sys.path.insert(0, REFERENCE)

    import torch
    from protein_transformer.models.convolutional_encoder import (
        ConvEncoderOnlyTransformer)
    from protein_transformer.losses import (
        compute_batch_drmsd, mse_over_angles, combine_drmsd_mse)
    from protein_transformer.protein.Sequence import VOCAB

    torch.set_num_threads(os.cpu_count() or 1)
    rng = np.random.default_rng(0)
    b, l = args.batch, args.length
    angle_means = np.clip(rng.normal(0, 0.3, 24), -0.9, 0.9)
    model = ConvEncoderOnlyTransformer(
        nlayers=6, nhead=8, dmodel=512, dff=2048, max_seq_len=l,
        vocab=VOCAB, angle_means=angle_means, use_tanh_out=True,
        conv_kernel_sizes=[21, 11, 3], conv_dim_reductions=[1, 1, 1],
        use_embedding=True, conv_out_matches_dm=True)
    optimizer = torch.optim.Adam(model.parameters(), betas=(0.9, 0.98),
                                 eps=1e-9, lr=1e-4, weight_decay=1e-2)

    seqs = torch.tensor(rng.integers(0, 20, (b, l)), dtype=torch.long)
    ang = rng.uniform(-np.pi, np.pi, (b, l, 12)).astype(np.float32)
    tgt_ang = torch.tensor(
        np.stack([np.cos(ang), np.sin(ang)], -1).reshape(b, l, 24))
    # plausible true coords: run one forward and rebuild from target angles
    from protein_transformer.losses import angles_to_coords
    crds = []
    for i in range(b):
        crd = angles_to_coords(torch.tensor(ang[i]), seqs[i])
        crds.append(crd.detach().numpy())
    tgt_crd = torch.tensor(np.stack(crds))

    pool = None
    if args.pool:
        import torch.multiprocessing as mp
        try:
            mp.set_start_method("spawn", force=True)
            pool = mp.Pool(os.cpu_count())
        except Exception as e:
            print(f"pool unavailable ({e}); sequential", file=sys.stderr)

    def step():
        optimizer.zero_grad()
        pred = model(seqs, tgt_ang)
        m_loss = mse_over_angles(pred, tgt_ang)
        ls = compute_batch_drmsd(pred, tgt_crd, seqs, do_backward=True,
                                 retain_graph=True, pool=pool)
        _d, ln_d, _bb, _lnbb = ls
        c = combine_drmsd_mse(ln_d, m_loss, log=False)
        c.backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), 1.0)
        optimizer.step()

    step()  # warmup
    t0 = time.time()
    for _ in range(args.steps):
        step()
    dt = (time.time() - t0) / args.steps
    res_per_sec = b * l / dt
    out = {"residues_per_sec": res_per_sec, "sec_per_step": dt,
           "batch": b, "length": l, "config": "conv-enc dm=512 nl=6 combined",
           "backend": f"torch-cpu x{torch.get_num_threads()}",
           "pool": bool(pool)}
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "reference_bench.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    if pool:
        pool.close()
        pool.join()


if __name__ == "__main__":
    main()
