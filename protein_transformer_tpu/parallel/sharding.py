"""Parameter sharding rules for tensor parallelism over the 'model' axis.

The reference never shards anything (single device, SURVEY 2.4); its sweep
configs reach dm=4096 (research/cluster/sweep.yaml), which motivates a
reserved 'model' mesh axis here. Megatron-style layout for the encoder
blocks, expressed as PartitionSpecs assigned by parameter-path pattern:

* attention wq/wk/wv kernels: shard the *output* (head) dim -> heads split
  across 'model'; wo kernel: shard the *input* dim (row-parallel), so the
  only collective per attention block is the psum XLA inserts after wo.
* FFN first Dense: column-parallel (output dim); second Dense: row-parallel
  (input dim).
* embeddings / layer norms / output head: replicated (small).

With plain jit, placing parameters with these NamedShardings is enough: XLA
propagates the layouts through the step and inserts all-reduces on ICI.
"""
from __future__ import annotations

import re
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (path regex, spec) -- first match wins. Paths look like
# 'params/Encoder_0/EncoderLayer_3/MultiHeadedAttention_0/wq/kernel'.
_RULES = (
    (re.compile(r"(wq|wk|wv)/kernel$"), P(None, "model")),
    (re.compile(r"wo/kernel$"), P("model", None)),
    # FFN: Dense_0 = dm->dff (column-parallel), Dense_1 = dff->dm (row)
    (re.compile(r"PositionwiseFeedForward_\d+/Dense_0/kernel$"),
     P(None, "model")),
    (re.compile(r"PositionwiseFeedForward_\d+/Dense_0/bias$"), P("model")),
    (re.compile(r"PositionwiseFeedForward_\d+/Dense_1/kernel$"),
     P("model", None)),
)


def param_spec(path: str) -> P:
    for pattern, spec in _RULES:
        if pattern.search(path):
            return spec
    return P()  # replicated


def _path_str(keypath) -> str:
    parts = []
    for k in keypath:
        parts.append(str(getattr(k, "key", getattr(k, "idx", k))))
    return "/".join(parts)


def shard_params(params, mesh: Mesh):
    """Place a parameter pytree according to the TP rules.

    With no 'model' axis (or size 1) everything is replicated. Dims that do
    not divide the axis size fall back to replication.
    """
    model_size = dict(zip(mesh.axis_names, mesh.devices.shape)).get("model", 1)

    def place(keypath, leaf):
        spec = P()
        if model_size > 1:
            spec = param_spec(_path_str(keypath))
            # divisibility check
            for dim, axis in enumerate(spec):
                if axis == "model" and (dim >= leaf.ndim
                                        or leaf.shape[dim] % model_size):
                    spec = P()
                    break
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)
