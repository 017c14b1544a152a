"""Device-mesh and sharding utilities — the framework's parallelism layer.

The reference's only multi-device construct is single-process
``nn.DataParallel`` (main_h3wb.py:698-705): replicate the module, scatter the
batch, gather outputs.  The TPU-native equivalent (SURVEY §2 parallelism
table) is SPMD over a ``jax.sharding.Mesh``:

* **data parallel (dp)** — the batch axis is sharded over the ``data`` mesh
  axis; parameters and optimizer state are replicated; XLA SPMD inserts the
  gradient all-reduce over ICI automatically when the loss reduces over the
  sharded axis.
* **hypothesis parallel** — the H proposals are folded into the batch axis
  (diffusion.py), so at inference the same ``data`` sharding splits proposals
  across chips for free.
* **expert-style part parallelism** — the three part networks are separate
  subgraphs inside one jit; XLA schedules them back-to-back on each chip.
  At ≤35M params there is nothing to gain from sharding the parts across
  chips (SURVEY §2: "TP not needed; do not build").

Multi-host/DCN scaling falls out of the same code: construct the mesh from
``jax.devices()`` spanning hosts and keep the batch axis on the ICI-major
axis ordering.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(mesh_shape: Sequence[int] = (-1,),
              axis_names: Sequence[str] = ("data",),
              devices: Optional[Sequence] = None) -> Mesh:
    """Build an N-D mesh; a single -1 dim absorbs all remaining devices."""
    devices = list(devices) if devices is not None else jax.devices()
    shape = list(mesh_shape)
    if -1 in shape:
        known = int(np.prod([s for s in shape if s != -1])) or 1
        shape[shape.index(-1)] = len(devices) // known
    n = int(np.prod(shape))
    dev_array = np.asarray(devices[:n]).reshape(shape)
    return Mesh(dev_array, tuple(axis_names))


def data_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Batch-axis sharding (leading array dim split over the data axis)."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Ship a host batch to the mesh with the data sharding: one transfer
    per shard instead of replicate-then-slice.  Works on multi-process
    meshes too — each process materializes only its addressable shards
    (``jax.device_put`` with a cross-process sharding would fail)."""
    sharding = data_sharding(mesh, axis)

    def put(x):
        x = np.asarray(x)
        if len(mesh.devices.ravel()) == len(jax.local_devices()):
            return jax.device_put(x, sharding)
        return jax.make_array_from_callback(
            x.shape, sharding, lambda idx: x[idx])

    return jax.tree_util.tree_map(put, batch)


def make_hybrid_mesh(ici_per_host: int = -1, axis_names=("data",),
                     dcn_axis_name: str = "hosts"):
    """DCN-aware mesh for multi-host deployments.

    Lays devices out so the minor (fast-varying) axis stays on ICI within a
    host and the major axis spans hosts over DCN — collectives ride ICI,
    only the cross-host reduce crosses DCN.  On a single host this reduces
    to :func:`make_mesh`.  Data-parallel training flattens both axes into
    one `data` axis, so the same `pjit` code runs unchanged; the layout only
    controls which pairs of shards are ICI-adjacent.
    """
    import jax
    n_hosts = jax.process_count()
    if n_hosts <= 1:
        return make_mesh((ici_per_host,), axis_names)
    devs = jax.devices()
    slice_ids = {getattr(d, "slice_index", None) for d in devs}
    if len(slice_ids) > 1 and None not in slice_ids:
        # real multi-slice TPU deployment (any hosts-per-slice ratio —
        # slices, not processes, are the DCN boundary): let mesh_utils pick
        # the ICI-optimal per-slice layout
        from jax.experimental import mesh_utils
        n_slices = len(slice_ids)
        devices = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(len(devs) // n_slices,),
            dcn_mesh_shape=(n_slices,),
        )
        return Mesh(devices.reshape(-1), tuple(axis_names))
    # multi-process without slice metadata (e.g. CPU multi-process, or
    # multi-host single-slice): host-major / local-minor ordering keeps
    # ICI-adjacent shards contiguous within a host, DCN only between hosts
    arr = np.array(sorted(devs, key=lambda d: (d.process_index, d.id)))
    return Mesh(arr, tuple(axis_names))
