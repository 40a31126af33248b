"""RunLogger facade tests — local JSONL backend + the wandb mirror path.

The reference's results pipeline is wandb end-to-end (main.py:152 wandb.init,
run_epoch wandb.log, artifact saves at main.py:188-200). nonode_tpu's
RunLogger always logs locally and mirrors to wandb when available; the real
wandb package is not installed in this environment, so the mirror path is
exercised against a fake module with the same call surface — pinning the
exact calls a live wandb would receive.
"""

import json
import sys
import types

import pytest

from nonode_tpu.utils.logging import RunLogger


def read_jsonl(path):
    return [json.loads(line) for line in path.read_text().splitlines()]


def test_local_backend(tmp_path):
    lg = RunLogger(tmp_path, "run1", config={"lr": 5e-4, "model": "egno"})
    lg.log({"train_loss": 0.5}, step=0)
    lg.log({"train_loss": 0.25, "val_loss": 0.3}, step=1)
    art = tmp_path / "blob.npz"
    art.write_bytes(b"x")
    lg.log_artifact(art, type_="results")
    lg.finish()

    recs = read_jsonl(tmp_path / "run1_metrics.jsonl")
    assert [r["train_loss"] for r in recs] == [0.5, 0.25]
    assert recs[1]["step"] == 1 and recs[1]["val_loss"] == 0.3
    assert all("time" in r for r in recs)
    cfg = json.loads((tmp_path / "run1_config.json").read_text())
    assert cfg["model"] == "egno"
    arts = read_jsonl(tmp_path / "run1_artifacts.jsonl")
    assert arts == [{"artifact": str(art), "name": "blob",
                     "type": "results"}]


class FakeArtifact:
    def __init__(self, name, type):
        self.name, self.type = name, type
        self.files, self.saved = [], False

    def add_file(self, local_path):
        self.files.append(local_path)

    def save(self):
        self.saved = True


def make_fake_wandb(calls):
    fake = types.ModuleType("wandb")
    fake.init = lambda **kw: calls.setdefault("init", []).append(kw)
    fake.log = lambda metrics, step=None: calls.setdefault("log", []).append(
        (metrics, step))
    fake.finish = lambda: calls.setdefault("finish", []).append(True)

    def artifact(name, type):
        a = FakeArtifact(name, type)
        calls.setdefault("artifacts", []).append(a)
        return a

    fake.Artifact = artifact
    return fake


def test_wandb_mirror(tmp_path, monkeypatch):
    calls = {}
    monkeypatch.setitem(sys.modules, "wandb", make_fake_wandb(calls))
    lg = RunLogger(tmp_path, "seed=3_run", config={"seed": 3},
                   use_wandb=True, project="proj")
    assert calls["init"] == [{"project": "proj", "config": {"seed": 3},
                             "name": "seed=3_run"}]

    lg.log({"val_loss": 0.1}, step=7)
    assert calls["log"] == [({"val_loss": 0.1}, 7)]
    # local backend still writes alongside the mirror
    assert read_jsonl(tmp_path / "seed=3_run_metrics.jsonl")[0]["step"] == 7

    art = tmp_path / "seed=3_results.npz"
    art.write_bytes(b"x")
    lg.log_artifact(art)
    (a,) = calls["artifacts"]
    # '=' is invalid in wandb artifact names — the facade sanitizes
    assert a.name == "seed-3_results" and a.saved and a.files == [str(art)]

    lg.finish()
    assert calls["finish"] == [True]


def test_wandb_requested_but_missing(tmp_path, monkeypatch, capsys):
    monkeypatch.setitem(sys.modules, "wandb", None)  # import -> ImportError
    lg = RunLogger(tmp_path, "r", use_wandb=True)
    assert lg._wandb is None
    assert "logging locally only" in capsys.readouterr().out
    lg.log({"a": 1.0})  # must not raise
    assert read_jsonl(tmp_path / "r_metrics.jsonl")[0]["a"] == 1.0
