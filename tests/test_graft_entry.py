"""Driver-contract tests for __graft_entry__.py.

The external driver compile-checks ``entry()`` single-chip and executes
``dryrun_multichip(N)`` on a virtual CPU mesh (the multi-chip check is
covered by tests/test_parallel.py::TestMesh::test_graft_dryrun). Breaking
either contract fails the round, so pin them here: entry() must return a
jit-traceable fn + example args whose output is the decoded coordinate
window, and the module must stay importable without touching a device.
"""

import jax
import jax.numpy as jnp

import __graft_entry__ as g


class TestEntry:
    def test_entry_traces_and_shapes(self):
        """entry() -> (fn, args) with fn jittable on the example args.

        jit(...).lower() runs the full trace (shape/dtype propagation,
        abstract eval of every op) without paying XLA compile time — the
        part of the driver's compile check that catches contract breaks.
        """
        fn, args = g.entry()
        lowered = jax.jit(fn).lower(*args)
        out = lowered.out_info
        # flagship EGNO decodes a [T, B, N, 3] coordinate window
        assert out.shape == (10, 8, 5, 3)
        assert out.dtype == jnp.float32

    def test_entry_args_are_concrete(self):
        """Example args must be ready-to-run values (params pytree first),
        not tracers or placeholders — the driver calls fn(*args) directly."""
        fn, args = g.entry()
        params = args[0]
        assert jax.tree.leaves(params), "empty params pytree"
        for leaf in jax.tree.leaves(args):
            assert hasattr(leaf, "shape") and hasattr(leaf, "dtype")
