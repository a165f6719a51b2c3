"""Device-mesh construction.

The reference's only parallelism is single-node data parallelism over NCCL
(distributed_image_translation.py:26-46, :401-404). The TPU-native
equivalent is a `jax.sharding.Mesh` with a `data` axis riding ICI within a
slice; gradient sync becomes `jax.lax.psum` inside `shard_map` instead of
DDP's bucketed allreduce. A `model` axis is reserved for optional channel
sharding of the widest 512px conv layers (SURVEY.md §2 checklist).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(n_data: int | None = None, n_model: int = 1, devices=None) -> Mesh:
    """Build a (data, model) mesh over the available devices.

    n_data=None uses all devices (divided by n_model). On a multi-host
    TPU slice `jax.devices()` already enumerates the global device set, so
    the same construction covers single-chip, single-slice, and
    multi-slice runs; XLA lowers collectives on the `data` axis to ICI
    within a slice and DCN across slices.
    """
    if devices is None:
        devices = jax.devices()
    total = len(devices)
    if n_data is None:
        if total % n_model != 0:
            raise ValueError(f"{total} devices not divisible by model axis {n_model}")
        n_data = total // n_model
    need = n_data * n_model
    if need > total:
        raise ValueError(f"requested {need} devices, have {total}")
    dev_array = np.asarray(devices[:need]).reshape(n_data, n_model)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def data_axis_size(mesh: Mesh | None) -> int:
    if mesh is None:
        return 1
    return mesh.shape[DATA_AXIS]
