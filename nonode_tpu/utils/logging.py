"""Run logging facade — wandb-compatible surface with a local JSONL backend.

The reference logs every run to wandb (main.py:152, run_epoch wandb.log
calls) and persists results as wandb artifacts. Here logging always works
locally (metrics JSONL + artifact files on disk) and transparently mirrors
to wandb when the package is installed and ``use_wb`` is set — so the same
driver code runs in air-gapped TPU pods and wandb-connected workstations.
"""

from __future__ import annotations

import json
import time
from pathlib import Path


class RunLogger:
    def __init__(self, out_dir, name: str, config: dict | None = None,
                 use_wandb: bool = False, project: str = "Particle-Physics"):
        self.out_dir = Path(out_dir)
        self.out_dir.mkdir(parents=True, exist_ok=True)
        self.name = name
        self.path = self.out_dir / f"{name}_metrics.jsonl"
        self._wandb = None
        if use_wandb:
            try:
                import wandb
                self._wandb = wandb
                wandb.init(project=project, config=config or {}, name=name)
            except ImportError:
                print("wandb not installed; logging locally only")
        if config is not None:
            with open(self.out_dir / f"{name}_config.json", "w") as f:
                json.dump({k: str(v) for k, v in config.items()}, f, indent=2)

    def log(self, metrics: dict, step: int | None = None):
        rec = {"time": time.time(), **metrics}
        if step is not None:
            rec["step"] = step
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)

    def log_artifact(self, file_path, name: str | None = None,
                     type_: str = "results"):
        """Record an artifact pointer (and upload when wandb is live)."""
        rec = {"artifact": str(file_path), "name": name or Path(file_path).stem,
               "type": type_}
        with open(self.out_dir / f"{self.name}_artifacts.jsonl", "a") as f:
            f.write(json.dumps(rec) + "\n")
        if self._wandb is not None:
            art = self._wandb.Artifact(name=rec["name"].replace("=", "-"),
                                       type=type_)
            art.add_file(local_path=str(file_path))
            art.save()

    def finish(self):
        if self._wandb is not None:
            self._wandb.finish()
