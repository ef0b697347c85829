"""tpu-stgcn: a TPU-native spatiotemporal graph-convolution framework.

JAX/XLA/Pallas compute path, shard_map parallelism, functional pytree models.
See SURVEY.md for the structural map of the reference implementation this
framework supersedes.
"""

__version__ = "0.1.0"
