"""Controls for the 1000-body 20k-step energy-drift record (VERDICT r3 #3).

The stretch record (results/stretch/drift_1000body_20k.json) shows O(1)
kinetic-normalized drift. These controls establish WHY, so the record reads
as physics rather than as a kernel bug:

1. small-N clip/drift table — our charged leapfrog re-run in NumPy float64
   from the jax-sampled initial conditions, counting force-clip steps
   (the reference's per-component clip, synthetic_sim.py:261-262, is
   non-Hamiltonian: every clip event deposits/removes energy). N=5 has
   zero clip events in 20k steps and ~0.1% final drift; N=20 has ~130
   clip-steps and O(1) drift.
2. precision isolation — the SAME N=20 initial state integrated in f32 vs
   f64: final drift 1.76 vs 1.78, i.e. precision-insensitive. (A naive
   cross-precision comparison is confounded: enabling x64 changes the
   jax RNG draws, so "f64 drifts less" was initial-condition luck.)
3. the reference cannot run N=1000 at all: its init-clamp assert
   (synthetic_sim.py:202-216) trips because loc_std scales with
   (n/5)^(1/3) -> 5.85 while the assert bound stays at 3*box = 15
   (verified: /root/reference run crashes in _clamp). The f64 NumPy
   control at N=1000 therefore drops the assert but keeps every other
   semantic (see /tmp-era run committed as
   results/stretch/f64_numpy_control.json).

Writes results/stretch/small_n_controls.json.
"""

import json
import sys
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def integrate_numpy(loc0, vel0, edges, dtype, T=20000, freq=100, k_int=1.0,
                    dt=1e-3):
    """Reference-faithful charged leapfrog (cadence of the saved frames is
    irrelevant here — we only need the energy series)."""
    n = loc0.shape[0]
    maxf = dtype(0.1 / dt)
    loc = loc0.astype(dtype)
    vel = vel0.astype(dtype)
    ed = edges.astype(dtype)
    edges64 = edges.astype(np.float64)
    eye = np.eye(n, dtype=dtype)
    iu = ~np.eye(n, dtype=bool)

    def force(x):
        d = x[:, None, :] - x[None, :, :]
        r2 = (d * d).sum(-1)
        with np.errstate(divide="ignore"):
            inv = np.where(r2 > 0, r2 ** dtype(-1.5), dtype(0))
        fs = (ed * inv) * (1 - eye)
        f = dtype(k_int) * (fs[..., None] * d).sum(1)
        return np.clip(f, -maxf, maxf), bool((np.abs(f) >= maxf).any())

    f, _ = force(loc)
    vel = vel + dtype(dt) * f
    es, clip_steps = [], 0
    for i in range(1, T + 1):
        loc = loc + dtype(dt) * vel
        if i % freq == 0:
            l64, v64 = loc.astype(np.float64), vel.astype(np.float64)
            d = l64[:, None, :] - l64[None, :, :]
            r = np.sqrt((d * d).sum(-1))
            es.append(0.5 * (v64 ** 2).sum()
                      + 0.5 * (edges64[iu] / r[iu]).sum())
        f, clipped = force(loc)
        clip_steps += int(clipped)
        vel = vel + dtype(dt) * f
    es = np.array(es)
    k0 = 0.5 * (vel0.astype(np.float64) ** 2).sum()
    dk = np.abs(es - es[0]) / k0
    return {"E0": float(es[0]), "kinetic_scale": float(k0),
            "clip_steps": clip_steps,
            "max_drift_kinetic": float(dk.max()),
            "final_drift_kinetic": float(dk[-1])}


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    from nonode_tpu.sim.simulators import ChargedSim

    rows = []
    for n, seed in ((5, 2), (20, 2), (20, 7), (20, 11)):
        sim = ChargedSim(n_balls=n)
        loc0, vel0, edges, _ = jax.jit(sim._init_state)(
            jax.random.PRNGKey(seed))
        loc0, vel0, edges = (np.asarray(a, np.float64)
                             for a in (loc0, vel0, edges))
        for dtype in ((np.float32, np.float64) if (n, seed) == (20, 2)
                      else (np.float64,)):
            r = integrate_numpy(loc0, vel0, edges, dtype)
            r.update({"n": n, "key": seed, "dtype": dtype.__name__})
            rows.append(r)
            print(r, flush=True)
    out = ROOT / "results/stretch/small_n_controls.json"
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(rows, indent=2))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
