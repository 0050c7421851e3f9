"""Device mesh + sharding rules (the TPU-native replacement for the
reference's accelerate/DDP slot, pipeline/training_pipeline.py:48-61).

Design: a 2-D mesh ("data", "model").

- "data": batch sharding for DP training and batch-parallel sampling;
  gradient all-reduce becomes an XLA psum over ICI.
- "model": tensor-parallel axis covering the UNet's FLOP/param bulk: every
  ResnetBlock's conv1/conv2 pair (Megatron column/row split on the channel
  dims, one psum per block), the 1x1 shortcuts, the mid-block attention
  qkv/out, and the time-embedding MLP. The model comfortably fits one chip,
  so "model" defaults to 1, but the axis is wired end-to-end so tp>1
  compiles and runs (validated by __graft_entry__.dryrun_multichip and the
  sharded==unsharded numerics tests in tests/test_mesh.py).

All collectives are inserted by XLA from sharding annotations — there are
no hand-written collective calls on the training path.
"""

from __future__ import annotations

import re
from typing import List, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from drivescenegen_tpu.config import MeshConfig


def make_mesh(cfg: Optional[MeshConfig] = None, devices=None) -> Mesh:
    """Create a ("data", "model") mesh over the available devices."""
    cfg = cfg or MeshConfig()
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    model = max(1, cfg.model)
    data = cfg.data if cfg.data > 0 else n // model
    if data * model > n:
        raise ValueError(f"mesh {data}x{model} needs {data*model} devices, have {n}")
    dev_array = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(dev_array, axis_names=cfg.axis_names)


def batch_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """Shard the leading (batch) dim over "data"; replicate the rest."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: jax.Array) -> jax.Array:
    """Device-put a host batch with the batch dim sharded over "data"."""
    return jax.device_put(batch, batch_sharding(mesh, batch.ndim))


# Tensor-parallel rules: (param-path regex, partition spec builder).
# Param paths are "/"-joined flax param names; kernels are (in, out) for
# Dense and (kh, kw, in, out) for Conv. Column-parallel layers (qkv, MLP up,
# resnet conv1) shard the output dim; row-parallel layers (attn out, MLP
# down, resnet conv2/shortcut) shard the input dim so that XLA inserts a
# psum right after, mirroring the classic Megatron pattern — but expressed
# purely as shardings.
#
# Conv TP (the bulk of params and FLOPs): inside every ResnetBlock the
# conv1 -> norm2 -> conv2 chain runs channel-sharded. conv1 is column-
# parallel (HWIO kernel sharded on O), so its activation is sharded on the
# channel dim; time_proj and the norm2 scale/bias shard the same way so the
# add/normalize stay local (GroupNorm groups never straddle shards: shard
# width C/tp is a multiple of the group width C/32 whenever 32 % tp == 0);
# conv2 and the 1x1 shortcut are row-parallel (sharded on I), after which
# XLA inserts one psum per block. conv_in/conv_out/down/upsample convs stay
# replicated (<2% of FLOPs, awkward channel counts).
DEFAULT_TP_RULES: List[Tuple[str, object]] = [
    # Mid-block attention: fused qkv projection -> column parallel.
    (r"attn.*/(query|key|value|qkv)/kernel$", lambda nd: P(*([None] * (nd - 1)), "model")),
    (r"attn.*/(query|key|value|qkv)/bias$", lambda nd: P("model")),
    # Attention output projection -> row parallel.
    (r"attn.*/proj_out/kernel$", lambda nd: P(*([None] * (nd - 2)), "model", None)),
    # Time-embedding MLP: up column-parallel, down row-parallel.
    (r"time_mlp/dense1/kernel$", lambda nd: P(*([None] * (nd - 1)), "model")),
    (r"time_mlp/dense1/bias$", lambda nd: P("model")),
    (r"time_mlp/dense2/kernel$", lambda nd: P(*([None] * (nd - 2)), "model", None)),
    # ResnetBlock conv pair: conv1 column-parallel ...
    (r"res_\d+/conv1/kernel$", lambda nd: P(*([None] * (nd - 1)), "model")),
    (r"res_\d+/conv1/bias$", lambda nd: P("model")),
    (r"res_\d+/time_proj/kernel$", lambda nd: P(None, "model")),
    (r"res_\d+/time_proj/bias$", lambda nd: P("model")),
    (r"res_\d+/norm2/(scale|bias)$", lambda nd: P("model")),
    # ... conv2 and shortcut row-parallel (psum after).
    (r"res_\d+/conv2/kernel$", lambda nd: P(*([None] * (nd - 2)), "model", None)),
    (r"res_\d+/shortcut/kernel$", lambda nd: P(*([None] * (nd - 2)), "model", None)),
]


def _spec_for_path(path: str, ndim: int, rules) -> P:
    for pattern, spec_fn in rules:
        if re.search(pattern, path):
            spec = spec_fn(ndim)
            return spec
    return P()


def param_shardings(params, mesh: Mesh, rules=None):
    """Build a NamedSharding pytree for a param tree.

    With mesh.model == 1 everything is replicated (specs still named so the
    same code path covers tp>1).
    """
    rules = DEFAULT_TP_RULES if rules is None else rules
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def path_str(path) -> str:
        parts = []
        for entry in path:
            if hasattr(entry, "key"):
                parts.append(str(entry.key))
            elif hasattr(entry, "idx"):
                parts.append(str(entry.idx))
            else:
                parts.append(str(entry))
        return "/".join(parts)

    specs = {}
    fallbacks = []
    for path, leaf in flat:
        key = path_str(path)
        if mesh.shape.get("model", 1) > 1 and hasattr(leaf, "ndim"):
            spec = _spec_for_path(key, leaf.ndim, rules)
            # Only shard dims that divide evenly; fall back to replication.
            ok = True
            for dim, name in enumerate(spec):
                if name is not None and leaf.shape[dim] % mesh.shape["model"] != 0:
                    ok = False
            specs[key] = spec if ok else P()
            if not ok:
                fallbacks.append((key, tuple(leaf.shape)))
        else:
            specs[key] = P()
    if fallbacks:
        # A silent fallback is a perf cliff on a real TP mesh: the param is
        # replicated and its matmul runs unsharded on every model-axis rank.
        # Name the offenders once so a mis-sized config is visible in logs.
        import logging

        logging.getLogger("parallel").warning(
            "TP: %d param(s) matched a shard rule but do not divide the "
            "model axis (%d); replicating them: %s",
            len(fallbacks), mesh.shape["model"],
            ", ".join(f"{k}{s}" for k, s in fallbacks[:8])
            + (", ..." if len(fallbacks) > 8 else ""),
        )

    def build(path, leaf):
        return NamedSharding(mesh, specs[path_str(path)])

    return jax.tree_util.tree_map_with_path(build, params)
