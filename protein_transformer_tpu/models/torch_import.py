"""Import reference torch checkpoint weights into flax parameter trees.

Lets a user of the reference (jonathanking/protein-transformer) move a trained
model into this framework: the reference's ``torch.save`` checkpoints carry a
``model_state_dict`` (reference: train.py:212-220) whose tensors map 1:1 onto
the flax modules here (reference: models/encoder_only.py:10-45,
models/convolutional_encoder.py:13-135, models/transformer/{Encoder,Decoder,
Attention,Sublayers,Transformer}.py). Conventions converted:

* torch ``Linear.weight`` is (out, in); flax ``Dense.kernel`` is (in, out).
* torch ``Conv1d.weight`` is (out, in, k); flax ``Conv.kernel`` is (k, in, out).
* torch ``LayerNorm.weight`` -> flax ``LayerNorm.scale``.
* torch module paths (``encoder.enc_layers.3.self_attn.wq``) -> flax
  auto-names (``Encoder_0/EncoderLayer_3/MultiHeadedAttention_0/wq``).

``state_dict_to_flax`` walks the *flax* tree so any missing/mismatched tensor
is an explicit error, never a silently-skipped leaf.
"""
from __future__ import annotations

import re
from typing import Mapping

import jax
import numpy as np


def _torch_key_for(path: tuple[str, ...]) -> tuple[str, bool]:
    """(torch state_dict key, needs_linear_transpose) for one flax path."""
    parts = [getattr(k, "key", str(k)) for k in path]
    if parts and parts[0] == "params":
        parts = parts[1:]
    leaf = parts[-1]
    mods = parts[:-1]

    # top-level module prefix
    prefix = ""
    if mods and mods[0] in ("encoder", "decoder"):
        # enc-dec setup() names match the torch attribute names directly
        prefix = mods[0] + "."
        mods = mods[1:]
    elif mods and mods[0].startswith("Encoder_"):
        prefix = "encoder."
        mods = mods[1:]
    elif mods and (mods[0].startswith("Embeddings_")
                   or mods[0].startswith("Conv_")
                   or mods[0].startswith("EncoderLayer_")):
        # conv-enc is flat: embedding/convs/layers all live on .encoder
        prefix = "encoder."

    out = prefix
    transpose = False
    i = 0
    while i < len(mods):
        m = mods[i]
        if m.startswith("Embeddings_"):
            out += "input_embedding."
        elif m == "Embed_0":
            out += "emb."
            return out + "weight", False
        elif re.fullmatch(r"Conv_(\d+)", m):
            out += f"conv_layers.{m.split('_')[1]}."
            return out + ("weight" if leaf == "kernel" else "bias"), "conv"
        elif re.fullmatch(r"EncoderLayer_(\d+)", m):
            out += f"enc_layers.{m.split('_')[1]}."
        elif re.fullmatch(r"DecoderLayer_(\d+)", m):
            out += f"dec_layers.{m.split('_')[1]}."
        elif m == "MultiHeadedAttention_0":
            # first attention is named self_attn in BOTH the encoder and the
            # decoder of the reference (Encoder.py:40, Decoder.py:42)
            out += "self_attn."
        elif m == "MultiHeadedAttention_1":
            out += "src_attn."
        elif m in ("wq", "wk", "wv", "wo"):
            out += m + "."
            transpose = True
        elif m == "PositionwiseFeedForward_0":
            out += "pwff."
        elif re.fullmatch(r"Dense_(\d+)", m):
            n = int(m.split("_")[1])
            if "pwff" in out:
                out += f"layer{n + 1}."
            elif prefix == "decoder." and not any(
                    s.startswith("DecoderLayer") for s in mods[:i]):
                out += "input_embedding."
            else:
                raise KeyError(f"unmapped Dense at {parts}")
            transpose = True
        elif re.fullmatch(r"SublayerConnection_(\d+)", m):
            out += f"sublayer_connections.{m.split('_')[1]}."
        elif m == "LayerNorm_0":
            out += "norm."
            name = "weight" if leaf == "scale" else "bias"
            return out + name, False
        elif m == "AngleProjection_0":
            pass  # wrapper; torch holds output_projection at the top level
        elif m == "output_projection":
            out += "output_projection."
            transpose = True
        else:
            raise KeyError(f"unmapped flax module {m!r} in {parts}")
        i += 1
    return out + ("weight" if leaf == "kernel" else leaf), transpose


def state_dict_to_flax(state_dict: Mapping, flax_params):
    """Fill a flax parameter tree from a reference torch state_dict.

    flax_params: the tree from ``model.init`` (provides structure + shapes).
    state_dict: mapping of torch parameter name -> tensor/ndarray.
    Returns a new tree of float32 numpy arrays. Raises KeyError/ValueError on
    any unmapped name or shape mismatch.
    """
    sd = {k: np.asarray(getattr(v, "detach", lambda: v)().numpy()
                        if hasattr(v, "detach") else v, np.float32)
          for k, v in state_dict.items()}

    def fill(path, leaf):
        key, transpose = _torch_key_for(path)
        if key not in sd:
            raise KeyError(f"{key} (for flax {jax.tree_util.keystr(path)}) "
                           "not in state_dict")
        arr = sd[key]
        if transpose == "conv":
            if arr.ndim == 3:  # (out, in, k) -> (k, in, out)
                arr = arr.transpose(2, 1, 0)
        elif transpose and arr.ndim == 2:
            arr = arr.T
        if arr.shape != leaf.shape:
            raise ValueError(
                f"shape mismatch for {key}: torch {arr.shape} vs flax "
                f"{leaf.shape}")
        return arr.astype(np.float32)

    return jax.tree_util.tree_map_with_path(fill, flax_params)


def load_reference_checkpoint(path: str, flax_params):
    """Reference .chkpt file -> flax params (train.py:212-220 payload)."""
    import torch
    payload = torch.load(path, map_location="cpu", weights_only=False)
    sd = payload.get("model_state_dict", payload)
    return state_dict_to_flax(sd, flax_params)
