"""Device mesh + sharding policy.

Replaces the reference's DDP/NCCL runtime (reference utils/pl_utils.py:180-312,
tasks/base_task.py:277-291 — mp.spawn per GPU, nccl all-reduce, batch sliced
``x[rank::world]``) with the TPU-native equivalent: one process per host,
``jax.make_mesh`` over all chips, batches sharded along a ``data`` axis with
NamedSharding, parameters replicated (or sharded along ``model`` for tensor
parallelism), and XLA inserting the gradient ``psum`` over ICI during ``jit``.

Axes:
  * ``data``  — batch dimension; gradients mean-reduced across it by jit.
  * ``model`` — optional tensor-parallel axis for the denoiser/vocoder channel
    dimensions when a model exceeds one chip's HBM (stretch goal per SURVEY §2.8).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_data: Optional[int] = None, num_model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if num_data is None:
        num_data = len(devices) // num_model
    assert num_data * num_model == len(devices), (
        f"mesh {num_data}x{num_model} != {len(devices)} devices")
    dev_array = np.asarray(devices).reshape(num_data, num_model)
    return Mesh(dev_array, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading batch axis split over ``data``; everything else replicated."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _local_row_span(sharding: NamedSharding, global_shape) -> tuple:
    """Contiguous [start, stop) of leading-axis rows owned by this process
    under ``sharding`` (derived from the addressable-device index map, so it is
    correct for any device ordering)."""
    idx_map = sharding.addressable_devices_indices_map(tuple(global_shape))
    spans = []
    for idx in idx_map.values():
        s = idx[0]
        spans.append((s.start or 0,
                      s.stop if s.stop is not None else global_shape[0]))
    spans.sort()
    start, stop = spans[0][0], spans[-1][1]
    covered = sum(b - a for a, b in spans)
    assert covered == stop - start, (
        f"process-local shards not contiguous: {spans}")
    return start, stop


def shard_batch(mesh: Mesh, batch: Dict[str, Any]) -> Dict[str, Any]:
    """Place GLOBAL numpy batch arrays on the mesh, batch-axis sharded.

    Contract mirrors the reference's DDP loading (tasks/tts/tts.py:85-88 —
    every worker loads the full batch and takes its slice): each process passes
    the same global batch; multi-process runs slice this host's rows and
    assemble the global array with ``jax.make_array_from_process_local_data``,
    single-process falls back to ``device_put``.
    """
    sharding = batch_sharding(mesh)

    def put(x):
        if not isinstance(x, (np.ndarray, jax.Array)):
            return x
        if jax.process_count() > 1:
            x = np.asarray(x)
            start, stop = _local_row_span(sharding, x.shape)
            return jax.make_array_from_process_local_data(sharding, x[start:stop])
        return jax.device_put(x, sharding)

    return {k: put(v) for k, v in batch.items()}


def param_shardings(params, mesh: Mesh, min_size: int = 1 << 16):
    """Tensor-parallel placement rule: shard a weight's last axis over the
    ``model`` mesh axis when divisible and the tensor is large enough;
    replicate everything else.

    With parameters placed this way, ``jit`` partitions the matmuls and inserts
    the activation collectives over ICI automatically — the idiomatic
    XLA/GSPMD path (no hand-written all-reduces). The reference has no tensor
    parallelism at all (SURVEY.md §2.8); this covers the "model exceeds one
    chip's HBM" stretch goal.
    """
    model_size = mesh.shape["model"]

    def place(x):
        if (model_size > 1 and hasattr(x, "shape") and x.ndim >= 2
                and x.size >= min_size and x.shape[-1] % model_size == 0):
            return NamedSharding(mesh, P(*([None] * (x.ndim - 1) + ["model"])))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(place, params)


def pad_batch_for_sharding(batch: Dict[str, Any], multiple: int) -> Dict[str, Any]:
    """Right-pad the batch dimension to a multiple of the data-axis size.

    The reference *drops* non-divisible batches (tasks/tts/tts.py:85-88);
    padding with zero rows (txt_tokens all pad -> fully masked) keeps every
    sample and stays shape-static.
    """
    first = next(v for v in batch.values() if isinstance(v, np.ndarray))
    b = first.shape[0]
    target = ((b + multiple - 1) // multiple) * multiple
    if target == b:
        return batch
    pad_n = target - b
    out = {}
    for k, v in batch.items():
        if isinstance(v, np.ndarray) and v.ndim >= 1 and v.shape[0] == b:
            pad_width = [(0, pad_n)] + [(0, 0)] * (v.ndim - 1)
            out[k] = np.pad(v, pad_width)
        else:
            out[k] = v
    out["nsamples"] = b  # true count for loss normalization / logging
    return out
