"""Data-parallel execution over a 1-D device mesh.

TPU-native replacement for the reference's process-per-GPU DDP stack
(SURVEY.md §2.9): instead of torch.distributed.launch + NCCL process groups +
DistributedSampler + SyncBatchNorm wrappers (engine/forgery_engine.py:51-145),
one process drives all local devices through `shard_map` over a
Mesh(('data',)):

* the global batch is laid out [dev0-real ‖ dev0-fake ‖ dev1-real ‖ ...] and
  sharded on the leading axis, so every device sees a local real-first
  sub-batch — the same per-rank batch contract DDP gave the triplet loss;
* gradients / scalar metrics are `lax.pmean`-ed inside the step (replacing
  DDP's allreduce and utils/misc.py:18-22 reduce_tensor);
* BatchNorm statistics sync over the same axis (layers.BatchNorm axis_name),
  replacing SyncBatchNorm;
* XLA collectives synchronize implicitly — no dist.barrier needed.

Multi-host: call jax.distributed.initialize() before create_mesh(); the mesh
then spans all slices and the same shard_map'd step rides ICI/DCN.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def create_mesh(num_devices: Optional[int] = None) -> Mesh:
    """1-D data mesh over the first `num_devices` devices (default: all)."""
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def _shard_map(fn, mesh, in_specs, out_specs):
    return jax.shard_map(fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs, check_vma=False)


def shard_train_step(train_step: Callable, mesh: Mesh) -> Callable:
    """Wrap a two-pass train step (built with axis_name=DATA_AXIS and
    per-device sum_real/sum_fake) for SPMD execution.

    Signature: (state, batch, rng) -> (state, metrics, cls_out) with state
    and rng replicated, batch sharded on axis 0, metrics pmean-replicated and
    cls_out returned sharded (stitched to the global batch on the host).
    """
    mapped = _shard_map(
        train_step,
        mesh,
        in_specs=(P(), P(DATA_AXIS), P()),
        out_specs=(P(), P(), P(DATA_AXIS)),
    )
    return jax.jit(mapped, donate_argnums=0)


def shard_eval_step(eval_step: Callable, mesh: Mesh) -> Callable:
    """Data-parallel inference via jit + GSPMD sharding annotations: params
    replicated, batch sharded on the leading axis. No collectives are needed
    in eval (per-frame probabilities are independent), so plain jit with
    in_shardings is sufficient and lets XLA partition automatically."""
    batch_sharding = NamedSharding(mesh, P(DATA_AXIS))
    replicated = NamedSharding(mesh, P())
    return jax.jit(
        eval_step,
        in_shardings=(replicated, replicated, batch_sharding, replicated),
    )


def all_gather_objects(*objects):
    """Gather arbitrary picklable objects from every host process — the
    TPU-native analogue of dist.all_gather_object
    (engine/forgery_engine.py:374-375). Pads pickled byte buffers to a common
    length and rides a device all-gather. Returns a list of per-process
    object tuples. Single-process: returns [objects]."""
    if jax.process_count() == 1:
        return [objects]
    import pickle

    from jax.experimental import multihost_utils

    blob = np.frombuffer(pickle.dumps(objects), np.uint8)
    sizes = multihost_utils.process_allgather(np.array([blob.size], np.int64))
    max_n = int(sizes.max())
    padded = np.zeros(max_n, np.uint8)
    padded[: blob.size] = blob
    blobs = multihost_utils.process_allgather(padded)
    return [
        pickle.loads(np.asarray(blobs[i][: int(sizes[i])]).tobytes())
        for i in range(jax.process_count())
    ]


def split_device_batch(images_real, labels_real, images_fake, labels_fake, num_devices: int):
    """Interleave per-device [real ‖ fake] blocks into the global batch layout
    expected by shard_train_step.

    Inputs are the full real and fake batches (numpy, leading axis divisible
    by num_devices). Returns (images, labels) with layout
    [d0-real, d0-fake, d1-real, d1-fake, ...].

    Raises on non-divisible batches: silently truncating would desynchronize
    the per-device real-first split the triplet loss depends on (samplers
    guarantee full batches via drop_last/pad_last upstream).
    """
    if images_real.shape[0] % num_devices or images_fake.shape[0] % num_devices:
        raise ValueError(
            f"real batch {images_real.shape[0]} / fake batch "
            f"{images_fake.shape[0]} not divisible by {num_devices} devices"
        )
    nr = images_real.shape[0] // num_devices
    nf = images_fake.shape[0] // num_devices
    imgs, lbls = [], []
    for d in range(num_devices):
        imgs.append(images_real[d * nr : (d + 1) * nr])
        imgs.append(images_fake[d * nf : (d + 1) * nf])
        lbls.append(labels_real[d * nr : (d + 1) * nr])
        lbls.append(labels_fake[d * nf : (d + 1) * nf])
    return np.concatenate(imgs, axis=0), np.concatenate(lbls, axis=0)


# ------------------------------------------------------------------- GSPMD 2-D
# Second parallelism mode (TPU-idiomatic, beyond the reference's DDP): a 2-D
# ('data', 'model') mesh driven purely by sharding annotations — XLA/GSPMD
# inserts the collectives. Differences from the shard_map DDP mode above:
#
# * GLOBAL-batch semantics: the step is built WITHOUT axis_name, sees the
#   whole [reals ‖ fakes] batch, and BatchNorm/triplet/losses compute over
#   the global batch exactly like the reference on one big device (shard_map
#   mode instead replicates DDP's per-rank semantics + pmean).
# * Tensor parallelism: large parameter matrices (channel mixes, classifier,
#   SFConv freq kernels) are sharded on their output axis over 'model'; XLA
#   turns the matmuls into reduce-scatter/all-gather pipelines over ICI.
# * pp/sp/ep deliberately absent: a 19M-param convnet has activations >>
#   params (no pipeline win at this scale) and no experts; spatial sharding
#   loses to batch sharding for per-sample-independent vision training.

MODEL_AXIS = "model"


def create_mesh_2d(num_devices: Optional[int] = None, model_parallel: int = 1) -> Mesh:
    """('data', 'model') mesh: dp = n // mp replicas, mp-way tensor sharding."""
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    n = len(devices)
    if n % model_parallel:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    grid = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def _leaf_spec(leaf, mp: int, min_size: int = 1 << 16) -> P:
    """Output-axis tensor sharding for large matrices; everything else
    replicated. Conservative rule: only shard when the last dim divides mp
    and the leaf is big enough for the collective to pay."""
    shape = getattr(leaf, "shape", ())
    if len(shape) >= 2 and shape[-1] % mp == 0 and int(np.prod(shape)) >= min_size:
        return P(*([None] * (len(shape) - 1) + [MODEL_AXIS]))
    return P()


def state_shardings(state, mesh: Mesh, min_size: int = 1 << 16):
    """NamedSharding tree for a TrainState under the 2-D mesh (params and the
    mirrored optimizer moments tensor-sharded by _leaf_spec; scalars/vectors
    replicated). min_size: smallest leaf (elements) worth tensor-sharding."""
    mp = mesh.shape[MODEL_AXIS]
    return jax.tree.map(
        lambda leaf: NamedSharding(mesh, _leaf_spec(leaf, mp, min_size)), state
    )


def gspmd_train_step(step_fn: Callable, mesh: Mesh, state,
                     min_size: int = 1 << 16) -> Callable:
    """jit the (axis_name=None, global-batch) two-pass step under the 2-D
    mesh: batch sharded over 'data' on axis 0, state sharded per
    `state_shardings`, metrics replicated. XLA partitions the whole program
    (SyncBN falls out of global-batch BN over a sharded axis)."""
    st_sh = state_shardings(state, mesh, min_size)
    batch_sh = {
        "image": NamedSharding(mesh, P(DATA_AXIS)),
        "label": NamedSharding(mesh, P(DATA_AXIS)),
    }
    repl = NamedSharding(mesh, P())
    return jax.jit(
        step_fn,
        in_shardings=(st_sh, batch_sh, repl),
        out_shardings=(st_sh, repl, NamedSharding(mesh, P(DATA_AXIS))),
        donate_argnums=0,
    )


def create_hybrid_mesh(model_parallel: int = 1) -> Mesh:
    """Multi-slice ('data', 'model') mesh with DCN-aware axis placement:
    data-parallelism spans slices over DCN (gradient pmean is the only
    cross-slice collective — latency-tolerant), while the model axis stays
    INSIDE a slice so tensor-sharding collectives ride ICI. On single-slice
    or CPU topologies this degrades gracefully to create_mesh_2d.

    The reference has no multi-node story beyond NCCL DDP
    (engine/forgery_engine.py:51); this is the TPU-idiomatic layout for
    scaling the same training past one slice."""
    devices = jax.devices()
    num_slices = len({getattr(d, "slice_index", 0) for d in devices})
    per_slice = len(devices) // num_slices
    if num_slices <= 1 or per_slice % model_parallel:
        return create_mesh_2d(None, model_parallel)
    from jax.experimental import mesh_utils

    grid = mesh_utils.create_hybrid_device_mesh(
        mesh_shape=(per_slice // model_parallel, model_parallel),
        dcn_mesh_shape=(num_slices, 1),
        devices=devices,
    )
    # combined shape: (num_slices * per_slice_dp, mp)
    return Mesh(grid.reshape(-1, model_parallel), (DATA_AXIS, MODEL_AXIS))
