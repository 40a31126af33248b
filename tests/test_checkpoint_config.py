"""Checkpoint round-trip, early stopping, and config loader tests."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nonode_tpu.config import EGNOConfig, SEGNOConfig, load_model_config
from nonode_tpu.models.egno import EGNO
from nonode_tpu.train.checkpoint import EarlyStopping, load_params, save_params


class TestCheckpoint:
    def test_roundtrip(self, tmp_path):
        model = EGNO(n_layers=1, hidden_nf=8, num_timesteps=3, time_emb_dim=4,
                     num_modes=2)
        params = model.init(jax.random.PRNGKey(0))
        path = tmp_path / "m.ckpt"
        save_params(path, params)
        like = model.init(jax.random.PRNGKey(1))
        restored = load_params(path, like)
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(restored)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_early_stopping_patience(self, tmp_path):
        es = EarlyStopping(patience=2, path=tmp_path / "e.ckpt",
                           trace_func=lambda *a: None)
        p = {"w": jnp.ones(3)}
        es(1.0, p)
        assert not es.early_stop and (tmp_path / "e.ckpt").exists()
        es(1.1, p)
        es(1.2, p)
        assert es.early_stop
        # improvement resets the counter
        es2 = EarlyStopping(patience=2, path=tmp_path / "e2.ckpt",
                            trace_func=lambda *a: None)
        es2(1.0, p)
        es2(1.1, p)
        es2(0.9, p)
        es2(1.0, p)
        assert not es2.early_stop

    def test_early_stopping_saves_best(self, tmp_path):
        es = EarlyStopping(patience=5, path=tmp_path / "b.ckpt",
                           trace_func=lambda *a: None)
        es(1.0, {"w": jnp.zeros(2)})
        es(0.5, {"w": jnp.ones(2)})
        es(0.9, {"w": jnp.full(2, 9.0)})  # worse: must NOT overwrite
        best = load_params(tmp_path / "b.ckpt", {"w": jnp.zeros(2)})
        np.testing.assert_array_equal(np.asarray(best["w"]), np.ones(2))


class TestConfig:
    def test_defaults_match_reference_constants(self):
        e = EGNOConfig()
        assert (e.n_layers, e.hidden_nf, e.num_modes, e.time_emb_dim,
                e.num_timesteps) == (4, 64, 2, 32, 10)
        assert (e.lr, e.weight_decay) == (1e-4, 1e-8)
        s = SEGNOConfig()
        assert (s.n_layers, s.hidden_nf, s.num_timesteps) == (8, 64, 10)
        assert (s.lr, s.weight_decay) == (5e-3, 1e-12)

    def test_yaml_override(self, tmp_path):
        p = tmp_path / "c.yaml"
        p.write_text(
            "EGNO:\n  num_timesteps: 5\n  model_params:\n    hidden_nf: 32\n"
            "  training_params:\n    lr: 2e-4\n")
        cfg = load_model_config("egno", p)
        assert cfg.num_timesteps == 5
        assert cfg.hidden_nf == 32
        assert cfg.lr == 2e-4
        assert cfg.n_layers == 4  # untouched default

    def test_missing_file_fails_loudly(self):
        """A typo'd/missing config path must raise like the reference's
        open(args.config) (main.py:69), not silently train with defaults;
        None means pure defaults."""
        with pytest.raises(FileNotFoundError):
            load_model_config("segno", "/nonexistent.yaml")
        assert load_model_config("segno", None) == SEGNOConfig()
