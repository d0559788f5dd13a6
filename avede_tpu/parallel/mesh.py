"""Device-mesh construction and sharding helpers.

Greenfield TPU design (nothing to port — reference has zero distributed
code, SURVEY.md §2.7). Conventions:

- axes ``("data", "model")``: frames/batches shard over ``data``;
  weight/activation tensor parallelism (when enabled) over ``model``.
- at ViT-B scale weights replicate and only data shards; ``model`` axis
  defaults to size 1 but the training step supports real TP so larger
  encoders drop in without redesign.
"""

from __future__ import annotations

import dataclasses
import math
from typing import List, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..utils.config import settings
from ..utils.logging import get_logger

logger = get_logger(__name__)

DATA_AXIS = "data"
MODEL_AXIS = "model"


@dataclasses.dataclass(frozen=True)
class MeshContext:
    """A mesh plus the canonical shardings used across the framework."""

    mesh: Mesh

    @property
    def n_data(self) -> int:
        return self.mesh.shape[DATA_AXIS]

    @property
    def n_model(self) -> int:
        return self.mesh.shape[MODEL_AXIS]

    @property
    def n_devices(self) -> int:
        return self.n_data * self.n_model

    def sharding(self, *spec) -> NamedSharding:
        return NamedSharding(self.mesh, P(*spec))

    @property
    def replicated(self) -> NamedSharding:
        return self.sharding()

    @property
    def data_sharded(self) -> NamedSharding:
        """Leading axis sharded over the data axis (frames / batch)."""
        return self.sharding(DATA_AXIS)

    def pad_to_data(self, n: int) -> int:
        """Round ``n`` up to a multiple of the data-axis size."""
        d = self.n_data
        return ((n + d - 1) // d) * d


def _mesh_shape(n_devices: int, shape: Optional[Sequence[int]]) -> Tuple[int, int]:
    if shape is not None:
        if len(shape) == 1:
            shape = (shape[0], 1)
        if shape[0] * shape[1] != n_devices:
            raise ValueError(
                f"MESH_SHAPE {tuple(shape)} does not cover {n_devices} devices"
            )
        return int(shape[0]), int(shape[1])
    return n_devices, 1


def build_mesh(devices: Optional[List[jax.Device]] = None,
               shape: Optional[Sequence[int]] = None) -> MeshContext:
    devices = list(devices if devices is not None else jax.devices())
    d, m = _mesh_shape(len(devices), shape if shape is not None else settings.MESH_SHAPE)
    arr = np.array(devices).reshape(d, m)
    mesh = Mesh(arr, (DATA_AXIS, MODEL_AXIS))
    logger.info("Mesh: %d×%d (%s×%s) over %s", d, m, DATA_AXIS, MODEL_AXIS,
                devices[0].platform)
    return MeshContext(mesh=mesh)


_GLOBAL: Optional[MeshContext] = None


def get_mesh() -> MeshContext:
    """Process-wide mesh over all visible devices (built lazily)."""
    global _GLOBAL
    if _GLOBAL is None:
        _GLOBAL = build_mesh()
    return _GLOBAL


def local_mesh(n: int = 1) -> MeshContext:
    """A mesh over the first ``n`` devices (useful for tests/benchmarks)."""
    return build_mesh(jax.devices()[:n])


def reset_mesh() -> None:
    global _GLOBAL
    _GLOBAL = None


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Multi-host initialization (SURVEY.md §5 "Distributed
    communication backend"): call once per host before building the
    global mesh; afterwards ``jax.devices()`` spans all hosts and the
    same ``build_mesh()`` covers the full slice (collectives ride ICI
    within a slice, DCN across slices — laid out by the mesh order).

    No-ops on a single process (this image exposes one chip)."""
    import jax

    if num_processes is None or num_processes <= 1:
        logger.info("Single-process mode; skipping jax.distributed")
        return
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    logger.info("jax.distributed initialized: process %d/%d",
                process_id, num_processes)


def pick_bucket(n: int, buckets: Optional[Sequence[int]] = None) -> int:
    """Smallest configured bucket ≥ n (avoids recompilation storms from
    ragged per-video frame counts — SURVEY.md §7.3.3)."""
    buckets = list(buckets if buckets is not None else settings.FRAME_BUCKETS)
    for b in buckets:
        if n <= b:
            return b
    # beyond the largest bucket: round up to its multiple
    top = buckets[-1]
    return int(math.ceil(n / top) * top)
