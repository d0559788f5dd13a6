"""SPMD parallelism: device mesh, sharded embedding runner, training step.

The reference has no distributed execution at all (SURVEY.md §2.7); its
concurrency is thread pools around single-image torch calls. Here the
equivalent capability is designed TPU-native: a ``jax.sharding.Mesh``
over all chips, data-parallel frame sharding for encoders, tensor
parallelism for the model axis, and XLA collectives for top-k merges.
"""

from .mesh import MeshContext, get_mesh, local_mesh  # noqa: F401
