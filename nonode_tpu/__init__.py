"""nonode_tpu — a TPU-native JAX framework for equivariant N-body dynamics models.

Re-implements the full capability surface of the reference repo
(simone7monaco/NO-NODE-comparison: EGNO vs SEGNO on N-body trajectory
prediction) with a TPU-first design:

- dense, statically-shaped ``[B, N, N, .]`` pairwise tensors instead of
  sparse edge lists + scatter_add (graphs are tiny and fully connected),
- the temporal axis handled by XLA rFFT (``jnp.fft``),
- weight-tied neural-ODE integration via ``lax.scan``,
- simulators as ``lax.scan`` + ``vmap`` device programs,
- device-mesh data/space parallelism via ``jax.sharding`` + ``jit``,
- Pallas kernels for the large-N pairwise interaction path.
"""

__version__ = "0.1.0"
