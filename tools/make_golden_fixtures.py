#!/usr/bin/env python
"""Generate checked-in golden fixtures from the reference implementation
(VERDICT round-1 item 5): seeded end-states as arrays, so the parity
evidence survives without a live /root/reference import.

Run from the repo root:  PYTHONPATH=. python tools/make_golden_fixtures.py

Fixtures (tests/fixtures/reference_golden.npz):
* yoshida4_*: 3-body THREE_BODY config, softening 1e-3, 1000 steps @ dt=0.01
* hamsoft_*:  3-body, softening 0.05, defaults (soft barrier,
  production eps*), 100 steps @ dt=0.01 (+ eps/pi end state)
* adaptive_*: verlet + adaptive classic softening 0.05, 1000 steps
* whfast_*:   generated from OUR implementation (documented in
  tests/test_golden_regression.py: the reference's WHFast kick
  double-counts gravity — its planets spiral — so reference parity is
  undefined; we pin our own orbit-stable behaviour instead)
"""

import sys

import numpy as np

sys.path.insert(0, "/root/reference")

THREE_BODY = dict(
    masses=[1.0, 0.5, 0.1],
    positions=[[0.0, 0.0], [1.0, 0.0], [0.0, 2.0]],
    velocities=[[0.0, 0.0], [0.0, 1.0], [-0.5, 0.0]],
)

WHFAST_SYS = dict(
    masses=[1.0, 1e-3, 3e-4],
    positions=[[0.0, 0.0], [1.0, 0.0], [2.5, 0.0]],
    velocities=[[0.0, 0.0], [0.0, 1.0], [0.0, 0.64]],
    softening=0.0,
    min_softening=0.0,
)


def main():
    import types

    if "lightgbm" not in sys.modules:
        try:
            import lightgbm  # noqa: F401
        except ImportError:  # stub so the reference package imports
            sys.modules["lightgbm"] = types.ModuleType("lightgbm")

    from minbody import NBodySimulation as RefSim

    out = {}

    # yoshida4 long horizon
    ref = RefSim(integrator_mode="yoshida4", softening=1e-3, **THREE_BODY)
    for _ in range(1000):
        ref.step(0.01)
    out["yoshida4_pos"] = np.asarray(ref.pos)
    out["yoshida4_vel"] = np.asarray(ref.vel)

    # ham_soft 100 steps (default policies; the reference's FD gradient)
    ref = RefSim(integrator_mode="ham_soft", softening=0.05, **THREE_BODY)
    for _ in range(100):
        ref.step(0.01)
    out["hamsoft_pos"] = np.asarray(ref.pos)
    out["hamsoft_vel"] = np.asarray(ref.vel)
    out["hamsoft_eps"] = np.asarray(float(ref._epsilon))
    out["hamsoft_pi"] = np.asarray(float(ref._pi))

    # adaptive-softening verlet
    ref = RefSim(integrator_mode="verlet", softening=0.05,
                 adaptive_softening=True, **THREE_BODY)
    for _ in range(1000):
        ref.step(0.01)
    out["adaptive_pos"] = np.asarray(ref.pos)
    out["adaptive_vel"] = np.asarray(ref.vel)
    out["adaptive_softening"] = np.asarray(float(ref.manager.s))

    # whfast: OUR implementation's end state (self-golden; see module
    # docstring)
    import jax

    jax.config.update("jax_platforms", "cpu")
    import nbodysimproject_tpu as nb

    new = nb.NBodySimulation(integrator_mode="whfast", **WHFAST_SYS)
    new.run(0.01, 1000)
    out["whfast_pos"] = np.asarray(new.pos)
    out["whfast_vel"] = np.asarray(new.vel)

    path = "tests/fixtures/reference_golden.npz"
    # Re-baselining report (VERDICT round-4 weak item 5): a self-golden
    # regenerated in the same commit that changes behaviour protects
    # nothing unless the CHANGE is visible — print old-vs-new end-state
    # deltas for every fixture key so the commit can record what moved
    # and by how much (anything re-baselined silently is a red flag).
    import os

    if os.path.exists(path):
        old = np.load(path)
        print("re-baselining deltas vs existing fixture:")
        for k, v in out.items():
            if k not in old.files:
                print(f"  {k}: NEW key")
                continue
            ov = old[k]
            if ov.shape != v.shape:
                print(f"  {k}: shape {ov.shape} -> {v.shape}")
                continue
            d = float(np.max(np.abs(np.asarray(v, np.float64) - ov)))
            scale = float(np.max(np.abs(ov))) or 1.0
            flag = "  <-- CHANGED" if d > 1e-12 * scale else ""
            print(f"  {k}: max|delta|={d:.3e} (rel {d / scale:.3e}){flag}")
        for k in old.files:
            if k not in out:
                print(f"  {k}: REMOVED key")
    np.savez(path, **out)
    print(f"wrote {path}:")
    for k, v in out.items():
        print(f"  {k}: shape={v.shape}")


if __name__ == "__main__":
    main()
