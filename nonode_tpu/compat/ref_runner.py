"""Run the torch reference's unified driver in-process (CPU).

Used by the end-to-end trained-parity anchor (scripts/parity_e2e.py,
PARITY_E2E.md): train /root/reference/main.py at a matched config on
repo-generated data and compare outcomes against nonode_tpu. The reference
code is executed unmodified; its missing deps are backed by
nonode_tpu.compat.ref_stubs.
"""

from __future__ import annotations

import importlib.util
import os
import sys

from .ref_stubs import REF_PATH, install


def load_reference_main():
    """Import /root/reference/main.py as a module (stubs installed)."""
    install()
    if "_nonode_reference_main" in sys.modules:
        return sys.modules["_nonode_reference_main"]
    # Reference-snapshot bug shim: EGNO/main_simulation_simple_no.py:8 does
    # ``from .utils import EarlyStopping, random_ascending_tensor`` but
    # EGNO/utils.py does not define random_ascending_tensor (it lives in the
    # root utils.py:15) — the checked-in EGNO path crashes at import. Inject
    # the root function; the import is otherwise unused in that file.
    import importlib
    root_utils = importlib.import_module("utils")
    eg_utils = importlib.import_module("EGNO.utils")
    if not hasattr(eg_utils, "random_ascending_tensor"):
        eg_utils.random_ascending_tensor = root_utils.random_ascending_tensor
    spec = importlib.util.spec_from_file_location(
        "_nonode_reference_main", os.path.join(REF_PATH, "main.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules["_nonode_reference_main"] = mod
    spec.loader.exec_module(mod)
    return mod


def install_segno_intended_semantics():
    """Make the reference's SEGNO trainable (opt-in, for the parity anchor).

    The live reference forward (SEGNO/models/model.py:53-92) discards the
    result of the LAST integration segment: ``xi, hi, vi`` are only assigned
    back inside the ``i < len(steps) - 1`` fusion branch, so the single-input
    path returns its input unchanged (loss.backward() raises "does not
    require grad") and the multi-input path drops the final T-step
    integration. This replaces the module's SEGNO with a subclass whose
    forward also commits the final segment — the intended semantics defined
    by the dead first forward (model.py:28-51) and forward_step (:95-102),
    and exactly what nonode_tpu.models.segno implements (see its docstring).
    The reference files themselves are untouched.
    """
    import importlib

    import torch

    m = importlib.import_module("SEGNO.models.model")
    if getattr(m.SEGNO, "_nonode_intended", False):
        return

    # patch forward in place (the class body uses ``super(SEGNO, self)``
    # against the module-global name, so the class cannot be replaced)
    def forward(self, his, x, edges, v, edge_attr, T=10, in_steps=None):
        if not len(x.size()) == 3:
            x, v, his = x.unsqueeze(1), v.unsqueeze(1), his.unsqueeze(1)
            steps = [T]
        else:
            steps = torch.diff(in_steps).tolist() + [T]
        h = self.embedding(his)
        h_, x_, v_ = h[:, 0, :], x[:, 0, :], v[:, 0, :]
        for i, step in enumerate(steps):
            xi, hi, vi = self.forward_step(h_, x_, edges, v_, edge_attr,
                                           T=step)
            if i < len(steps) - 1:  # fusion, as model.py:81-90
                if self.multiple_agg == "sum":
                    h_, x_, v_ = (h[:, i + 1, :] + hi, x[:, i + 1, :] + xi,
                                  v[:, i + 1, :] + vi)
                elif self.multiple_agg == "attn":
                    hs = torch.stack([h[:, i + 1, :], hi], dim=1)
                    xs = torch.stack([x[:, i + 1, :], xi], dim=1)
                    vs = torch.stack([v[:, i + 1, :], vi], dim=1)
                    x_, v_, h_ = self.prepare_node_inputs(xs, vs, hs)
            else:  # the fix: commit the final integration segment
                x_, h_, v_ = xi, hi, vi
        return x_, h_, v_

    m.SEGNO.forward = forward
    m.SEGNO._nonode_intended = True


def run_reference(argv: list[str], fix_segno: bool = False):
    """Run the reference driver (main.py:68-201) with the given CLI args.

    Returns (best_val_loss, test_loss, best_epoch). Artifacts land under the
    --outf/--exp_name the argv specifies, exactly as the reference writes
    them (checkpoint .pth, results .json, trajectory *_results.pt).

    fix_segno: apply install_segno_intended_semantics() first — required to
    train SEGNO at all (the checked-in forward is untrainable, see that
    function's docstring).
    """
    mod = load_reference_main()
    if fix_segno:
        install_segno_intended_semantics()
    if "--config" not in argv:
        argv = list(argv) + ["--config",
                             os.path.join(REF_PATH, "model_confs.yaml")]
    old_argv = sys.argv
    sys.argv = ["main.py"] + list(argv)
    try:
        args = mod.get_args()
    finally:
        sys.argv = old_argv
    return mod.main(args)
