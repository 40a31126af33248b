"""Headline benchmark: EGNO training-step throughput at the canonical config
(charged-5, batch 256, T=10, 4 layers, hidden 64 — model_confs.yaml).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline compares against the reference PyTorch implementation measured on
this machine's CPU at the identical config (full train step: forward + MSE +
backward + Adam): 1120.8 ms/step = 228.4 samples/s (torch 2.13 CPU,
single-thread, measured 2026-08-16; see BASELINE.md for methodology).
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

REFERENCE_CPU_SAMPLES_PER_S = 228.4


def main():
    from nonode_tpu.models.egno import EGNO
    from nonode_tpu.train.loop import EGNOExperiment, make_perm

    b, n, t = 256, 5, 10
    s = 2048  # synthetic dataset size
    rng = np.random.RandomState(0)

    model = EGNO(n_layers=4, hidden_nf=64, num_timesteps=t, time_emb_dim=32,
                 num_modes=2)
    exp = EGNOExperiment(model, lr=1e-4, weight_decay=1e-8)
    params, opt_state = exp.init(jax.random.PRNGKey(0))

    # synthetic device-resident dataset (shapes match the real charged-5 data)
    n_frames = 60
    loc = jnp.asarray(rng.randn(s, n_frames, n, 3), jnp.float32)
    vel = jnp.asarray(rng.randn(s, n_frames, n, 3), jnp.float32)
    charges = jnp.asarray(rng.choice([-1.0, 1.0], (s, n, 1)), jnp.float32)
    w = jnp.einsum("sik,sjk->sij", charges, charges)[..., None]
    arrays = (loc, vel, charges, w)

    frames_in = np.full((s, 1), 30, np.int32)
    out_frames = np.broadcast_to(np.arange(31, 31 + t), (s, t)).copy()
    idx_arrays = {
        "frames_in": jnp.asarray(frames_in),
        "t_in": jnp.zeros((s, 1), jnp.float32),
        "out_frames": jnp.asarray(out_frames.astype(np.int32)),
        "t_out": jnp.asarray((out_frames - 30).astype(np.float32)),
    }

    nb = s // b
    perm = make_perm(np.random.RandomState(0), s, b)

    # compile + warmup
    params, opt_state, losses, _ = exp.train_epoch(
        params, opt_state, arrays, idx_arrays, perm)
    jax.block_until_ready(losses)

    reps = 10
    t0 = time.perf_counter()
    for _ in range(reps):
        params, opt_state, losses, _ = exp.train_epoch(
            params, opt_state, arrays, idx_arrays, perm)
    jax.block_until_ready(losses)
    dt = (time.perf_counter() - t0) / (reps * nb)

    throughput = b / dt
    print(json.dumps({
        "metric": "egno_train_throughput",
        "value": round(throughput, 1),
        "unit": "samples/s",
        "vs_baseline": round(throughput / REFERENCE_CPU_SAMPLES_PER_S, 2),
    }))


if __name__ == "__main__":
    main()
