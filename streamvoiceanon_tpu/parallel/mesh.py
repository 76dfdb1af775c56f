"""Device mesh + sharding rules.

The reference's only parallelism is Accelerate DDP (SURVEY.md §2.4); the
TPU-native design is a 2-D ('data', 'model') mesh:

* batch dims sharded over 'data' (gradients all-reduced by XLA over ICI);
* the dual-AR LM's attention heads and FFN hidden dims sharded over 'model'
  (Megatron-style: wqkv/w1/w3 column-parallel, wo/w2 row-parallel, so each
  transformer block costs exactly two psums, inserted automatically by XLA
  from the output shardings);
* everything else replicated.

Multi-host: the same code runs under jax.distributed.initialize() with the
mesh spanning hosts — data axis over DCN, model axis within a host's ICI.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """Multi-host bring-up: jax.distributed.initialize (args auto-detected on
    TPU pods).  After this, jax.devices() spans all hosts and make_mesh
    builds a global mesh; feed per-host batches via
    jax.make_array_from_process_local_data (SURVEY.md §2.4 TPU-native plan:
    no NCCL/MPI layer — ICI intra-slice, DCN across hosts, collectives
    inserted by XLA)."""
    import jax.distributed

    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kwargs)


def global_batch_from_local(local_batch, mesh: Mesh):
    """Per-host local shard (B_local, ...) -> globally-sharded array over the
    'data' axis (the split_dataset_by_node counterpart on the device side)."""
    from jax.sharding import NamedSharding

    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            NamedSharding(mesh, P("data")), np.asarray(x)
        ),
        local_batch,
    )


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model <= len(devices)
    arr = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(arr, ("data", "model"))


def _block_spec(name: str) -> P:
    """PartitionSpec for one stacked-layer transformer weight (leading axis =
    layer)."""
    col = {"wqkv", "w1", "w3"}  # (L, dim, hidden) -> shard hidden
    row = {"wo", "w2"}  # (L, hidden, dim) -> shard hidden (input dim)
    if name in col:
        return P(None, None, "model")
    if name in row:
        return P(None, "model", None)
    return P()


def dual_ar_param_specs(params: Dict) -> Dict:
    """PartitionSpecs (same tree shape as dual_ar.prepare_params output):
    transformer matmul weights sharded over 'model', all else replicated."""

    def leaf_spec(path, _leaf):
        keys = [getattr(p, "key", None) for p in path]
        if ("layers" in keys or "fast_layers" in keys) and keys[-1] == "w":
            return _block_spec(keys[-2])
        return P()

    return jax.tree_util.tree_map_with_path(leaf_spec, params)


def shard_params(params: Dict, mesh: Mesh, specs: Dict) -> Dict:
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params,
        specs,
        is_leaf=lambda x: isinstance(x, P),
    )


def replicate(tree, mesh: Mesh):
    return jax.tree.map(lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree)


def shard_batch(tree, mesh: Mesh):
    """Shard leading (batch) axis over 'data'."""
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P("data"))), tree
    )
