"""Batched stability analysis over a system population.

Parity: ``minbody/batch_stability_analyzer.py:30-102``
(BatchStabilityAnalyzer: analyze_simulation / analyze_batch /
save_batch_results / get_feature_matrix, pathological-energy flag,
softening-policy tag).

TPU-first: the reference's "batching" is a serial Python for loop
(:66-77).  Here the whole population is stacked into `(B, N, d)`
PyTrees (ragged body counts padded + masked) and analysed by ONE
compiled ``vmap`` program — the design that makes the 1e4-systems
north-star throughput possible (SURVEY.md section 2 parallelism
table).  Systems are grouped by static analysis signature (cfg, mode)
so each group is a single compile.
"""

from __future__ import annotations

import os
from collections import defaultdict
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core.state import SimState, DynParams
from .stability import analyze_batch_jit, StabilityAnalyzer


def stack_sims(sims, dyns_list=None):
    """Stack facade simulations into batched (states, dyns) PyTrees,
    padding body counts to the max N in the group."""
    n_slots = max(s._state.n_slots for s in sims)

    def pad_state(st: SimState) -> SimState:
        k = n_slots - st.n_slots
        if k == 0:
            return st
        return st.replace(
            mass=jnp.pad(st.mass, (0, k)),
            pos=jnp.pad(st.pos, ((0, k), (0, 0))),
            vel=jnp.pad(st.vel, ((0, k), (0, 0))),
            mask=jnp.pad(st.mask, (0, k)),
        )

    states = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *[pad_state(s._state) for s in sims])
    if dyns_list is None:
        dyns_list = [s._dyn for s in sims]
    dyns = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *dyns_list)
    return states, dyns


def _scheduled_dyn(sim, dt: float, cap: bool = True) -> DynParams:
    """The sim's DynParams with the pi-budget mu raise and (if dt is
    not within 1% of the frozen dt) a refrozen schedule — pure, no
    mutation of the facade sim."""
    from ..integrators import calibration as calib
    from ..parallel.batch_engine import refreeze_jit

    dyn = sim._dyn
    if sim._integrator_mode != "ham_soft":
        import math

        h_sub = float(dyn.h_sub_ref)
        if not (math.isfinite(h_sub) and h_sub > 0.0):
            h_sub = abs(dt)
        n = int(max(1, min(sim.cfg.split_n_max,
                           math.ceil(abs(dt) / h_sub))))
        return dyn.replace(n_sub=jnp.asarray(n, jnp.int32))

    mu_new = calib.calibrate_mu_from_pi_budget(
        dyn.mu_soft, dyn.k_soft, sim._as_dtype(abs(dt)),
        sim._as_dtype(sim.cfg.theta_imp))
    dyn = dyn.replace(mu_soft=mu_new)
    prev = getattr(sim, "_frozen_dt", None)
    if prev is None or prev <= 0.0 or abs(abs(dt) - prev) / prev > 0.01:
        dyn = refreeze_jit(sim._state, dyn, sim.cfg, sim._as_dtype(dt))
    # Batch policy: cap the frozen substep count (the reference runs
    # the full n_pred, HSI:504-551 — unbounded cost on near-singular
    # systems; see cfg.analysis_n_sub_cap and the cap/label-agreement
    # test in tests/test_distributed.py).
    if cap:
        dyn = dyn.replace(n_sub=jnp.minimum(
            dyn.n_sub, jnp.asarray(int(_n_sub_cap(sim.cfg)), jnp.int32)))
    return dyn


def _n_sub_cap(cfg) -> int:
    cap = int(getattr(cfg, "analysis_n_sub_cap", 0) or 0)
    return cap if cap > 0 else int(cfg.split_n_max)


def _pack_groups(groups, quantum):
    """Cost-aware bucket packing (round-3 throughput lever).

    Wall time of a group is ~ n_sub_max * ceil(n / quantum) sequential
    kernel trips: every lane in a dispatch rides all n_sub_max trips
    (masked-identity beyond its own n_sub), so a small bucket merged
    into the next larger one is often FREE — the merged dispatch runs
    the larger bucket's trips anyway — while a separate dispatch pays
    its own full chunk.  Greedily merge ascending same-tail-flag
    buckets whenever the trip cost strictly drops.  Lane results are
    bucket-value independent (masked trips are exact identities on
    both engines — asserted by test_analysis_ml's packing-parity
    test), so this changes scheduling only, never rows.
    """
    cost = lambda b, n: b * -(-n // quantum)
    out = []
    for flag in (False, True):
        run = [(b, idx) for b, t, idx in groups if t is flag]
        run.sort(key=lambda g: g[0])
        packed = []
        for b, idx in run:
            if packed:
                b0, idx0 = packed[-1]
                if (cost(b, len(idx0) + len(idx))
                        < cost(b0, len(idx0)) + cost(b, len(idx))):
                    packed[-1] = (b, np.concatenate([idx0, idx]))
                    continue
            packed.append((b, idx))
        out.extend((int(b), flag, np.sort(idx)) for b, idx in packed)
    return out


@jax.jit
def _take_stack_jit(states, dyns, keys, pad_idx2d):
    """Gather a whole dispatch GROUP — (k, quantum) indices — in one
    device program, leaves gaining a leading chunk axis.  One launch
    instead of k: through the axon tunnel every program execution
    carries ~13-28 ms of fixed overhead regardless of size (measured,
    round 4), which dominated the warm 16k analysis at 2 launches per
    1024-lane chunk."""
    take = lambda t: jax.tree_util.tree_map(lambda x: x[pad_idx2d], t)
    return take(states), take(dyns), keys[pad_idx2d]


@jax.jit
def _take_jit(states, dyns, keys, pad_idx):
    """Gather one dispatch chunk out of the population in a SINGLE
    device program.  Done leaf-by-leaf eagerly, the ~27 gather
    launches cost ~25-40 ms each through the axon tunnel and dominate
    warm analysis wall clock.  Kept OUTSIDE the engine programs so the
    analysis computation itself stays byte-identical to the unchunked
    form (the dispatch-quantum bitwise contract: gather output shapes
    are quantum-fixed even though the population shape varies with
    sharding)."""
    take = lambda t: jax.tree_util.tree_map(lambda x: x[pad_idx], t)
    return take(states), take(dyns), keys[pad_idx]


def _fetch_packed(r, n_valid):
    """device -> host for a dict of (B,) result columns with ONE
    transfer per dtype instead of one per column: jnp.stack packs the
    group on device, a single device_get moves it.  Through the axon
    TPU tunnel a transfer costs ~15 ms regardless of size, so fetching
    ~90 columns one by one dominated warm analysis throughput."""
    groups = {}
    for k, v in r.items():
        groups.setdefault(jnp.asarray(v).dtype, []).append(k)
    out = {}
    for dt_, ks in groups.items():
        packed = np.asarray(jax.device_get(
            jnp.stack([jnp.asarray(r[k]) for k in ks])))
        for i, k in enumerate(ks):
            out[k] = packed[i, :n_valid]
    return out


@partial(jax.jit, static_argnames=("cfg",))
def _features_batch_jit(states, dyns, cfg):
    from ..diagnostics import features as F

    return jax.vmap(lambda s, d: F.extract_all(s, d, cfg))(states, dyns)


@partial(jax.jit, static_argnames=("cfg", "feat_cfg", "n_steps", "mode",
                                   "n_sub_max", "megno_steps", "engine",
                                   "lanes", "g_static", "with_features"))
def _analysis_program(states, dyns, keys, dt, *, cfg, feat_cfg, n_steps,
                      mode, n_sub_max, megno_steps, engine, lanes,
                      g_static, with_features):
    """ONE device program per analysis chunk: the metric engine
    (fused kernel or XLA scan), the static initial-feature pass
    (``with_features``, full mode), all in a single dispatch.  The
    round-3 path launched three programs per chunk (gather + engine +
    features) and fetched twice; through the axon tunnel each launch
    costs ~10-15 ms of host latency, the dominant share of a warm
    1024-lane chunk (VERDICT round-3 next-round item 1).

    Feature columns are computed with ``feat_cfg`` (the caller's
    engine-stripped cfg) regardless of the integrator ``cfg`` — tail
    fast-path chunks run a kepler_split integrator but their
    ``initial_*`` columns must match the rest of the frame."""
    from ..diagnostics import features as F

    if engine == "fused":
        from .fused import analyze_batch_fused

        r, _ = analyze_batch_fused(states, dyns, cfg, keys, n_steps, dt,
                                   mode, n_sub_max, megno_steps, lanes,
                                   g_static)
    else:
        r, _ = analyze_batch_jit(states, dyns, cfg, keys, n_steps, dt,
                                 mode, n_sub_max, megno_steps)
    if with_features:
        fr = jax.vmap(lambda s, d: F.extract_all(s, d, feat_cfg))(states,
                                                                  dyns)
        r = dict(r)
        r.update({f"initial_{k}": v for k, v in fr.items()})
    return r


def _pack_result(r):
    """Device-side column packing, applied INSIDE the exported program
    (aot_call's out_select runs under the trace): the ~90-110 (B,)
    result columns stack into one array per dtype, so a chunk costs
    one transfer per dtype instead of one per column (~15 ms each
    through the tunnel).  Column names ride the pytree STRUCTURE as
    '|'-joined dict keys — free to read host-side, nothing extra to
    serialize."""
    groups = {}
    for k in sorted(r):
        groups.setdefault(jnp.result_type(r[k]).name, []).append(k)
    return {"|".join(ks): jnp.stack([jnp.asarray(r[k]) for k in ks])
            for ks in groups.values()}


def _analysis_multi(states, dyns, keys, dt, *, cfg, feat_cfg, n_steps,
                    mode, n_sub_max, megno_steps, engine, lanes, g_static,
                    with_features):
    """A whole dispatch group in ONE program: the single-chunk analysis
    program UNROLLED over a leading (k, quantum, ...) chunk axis.  Each
    chunk is the same (quantum,)-shaped traced subgraph — per-lane
    rounding does not depend on how many chunks the group holds (the
    dispatch-quantum bitwise contract across shardings; asserted by
    tests/test_distributed.py and the multichip dryrun).  One launch
    per GROUP instead of one gather + one engine launch per CHUNK:
    at ~13-28 ms of fixed per-launch overhead through the axon tunnel,
    this is where the warm 16k wall clock went (round-4 measurement).

    Round 4 wrapped the chunks in ``lax.map``; round 5 measured that
    the XLA while-loop around the fused Mosaic kernel costs 2.0x the
    chunk's device time even at k = 1 (1.772 s vs 0.899 s on the
    B = 16384 mixture's n_sub = 256 tail chunk, and exactly 2x0.885 s
    at k = 2 unrolled) — the loop serialises around the custom call
    where straight-line copies pipeline.  Chunks are therefore inlined
    (callers bound k with ``_STACK_MAX``, so traces stay small and the
    set of distinct compiled (k, quantum) shapes per bucket stays
    O(log _STACK_MAX)).

    Returns {col-names: (n_cols, k * quantum)} packed columns.
    """
    k = states.pos.shape[0]
    outs = []
    for i in range(k):
        st = jax.tree_util.tree_map(lambda x: x[i], states)
        dy = jax.tree_util.tree_map(lambda x: x[i], dyns)
        r = _analysis_program(st, dy, keys[i], dt, cfg=cfg,
                              feat_cfg=feat_cfg, n_steps=n_steps,
                              mode=mode, n_sub_max=n_sub_max,
                              megno_steps=megno_steps, engine=engine,
                              lanes=lanes, g_static=g_static,
                              with_features=with_features)
        outs.append(_pack_result(r))
    # k x (n_cols, q) -> (n_cols, k*q), chunk-major lanes
    return {nm: jnp.concatenate([o[nm] for o in outs], axis=1)
            for nm in outs[0]}


def _drain_packed(pending):
    """Fetch a list of dispatched GROUPS: ``pending`` holds
    (packed_device_dict, sel_lanes, global_rows) triples, where
    ``sel_lanes`` selects the valid lanes of the group's packed
    (n_cols, k*quantum) arrays and ``global_rows`` are the population
    rows they belong to.  Groups sharing a packed column set are
    concatenated ON DEVICE first, so the whole drain costs one
    transfer per (column-set, dtype) — 1-2 transfers for the whole
    population.  Returns one host column dict per group (valid lanes
    only, aligned with global_rows)."""
    out = [dict() for _ in pending]
    bykey = {}
    for ci, (pk, _sel, _rows) in enumerate(pending):
        for names, arr in pk.items():
            bykey.setdefault(names, []).append((ci, arr))
    for names, items in bykey.items():
        cols = names.split("|")
        arrs = [a for _, a in items]
        if len(arrs) == 1:
            splits = [np.asarray(jax.device_get(arrs[0]))]
        else:
            packed = np.asarray(jax.device_get(
                jnp.concatenate(arrs, axis=1)))
            offs = np.cumsum([0] + [a.shape[1] for a in arrs])
            splits = [packed[:, offs[i]:offs[i + 1]]
                      for i in range(len(arrs))]
        for (ci, _), sp in zip(items, splits):
            sel = pending[ci][1]
            for i, c in enumerate(cols):
                out[ci][c] = sp[i][sel]
    return out


#: largest number of chunks inlined into one stacked analysis program
#: (``_analysis_multi`` unrolls its chunk axis — see its docstring).
#: Bounds trace/compile time per program; groups with more chunks
#: split into several dispatches (launches are asynchronous, so the
#: extra dispatches ride the device queue at ~ms each).
_STACK_MAX = int(os.environ.get("NB_ANALYSIS_STACK_MAX", "8") or 8)

#: host-scheduling-only knobs, pinned to fixed values on the cfg that
#: becomes a jit static argument: they never reach device code, but as
#: static-arg fields every toggle (packing on/off, quantum-width or
#: early-exit experiments) would otherwise recompile the whole
#: per-bucket program ladder (~100 s per program on a 1-vCPU host)
_SCHED_ONLY = dict(analysis_group_quantum=0, analysis_bucket_packing=True,
                   early_exit_probe=0.0, early_exit_min_n_sub=8)


def _engine_cfg(cfg):
    """cfg as handed to the jitted engines: scheduling knobs stripped."""
    return cfg.replace(**_SCHED_ONLY)


@jax.jit
def _pair_dominance_jit(states, dyns):
    """(tau_min^2, tau_second^2) per system for the tail-fast-path
    eligibility decision (integrators/kepler_split.py)."""
    from ..integrators.kepler_split import pair_timescales_sq

    def one(s, d):
        _ei, _ej, t1, t2 = pair_timescales_sq(s.pos, s.mass, d.G, s.mask)
        return t1, t2

    return jax.vmap(one)(states, dyns)


def _tail_selection(states, dyns, cfg, n_sub_raw, dt):
    """Host-side tail policy: which systems go to the kepler_split
    fast path, and with what (outer-timescale) substep count.

    Eligible = frozen schedule demand >= cfg.tail_min_n_sub AND the
    tightest pair's timescale dominates every other pair's by
    cfg.tail_dominance_margin (a 2-body system has no other pair and
    is always dominated — it IS a Kepler problem).  The fast schedule
    resolves only the outer timescale: n = ceil(|dt| / 0.9 tau_second).
    """
    B = n_sub_raw.shape[0]
    sel = np.zeros(B, bool)
    n_tail = np.ones(B, np.int64)
    if getattr(cfg, "analysis_tail_policy", "off") != "kepler":
        return sel, n_tail
    elig = n_sub_raw >= int(cfg.tail_min_n_sub)
    if not elig.any():
        return sel, n_tail
    t1, t2 = jax.device_get(_pair_dominance_jit(states, dyns))
    t1 = np.asarray(t1, np.float64)
    t2 = np.asarray(t2, np.float64)
    margin2 = float(cfg.tail_dominance_margin) ** 2
    dominated = t2 > margin2 * t1  # t2 = inf (2-body) passes
    sel = elig & dominated & np.isfinite(t1) & (t1 > 0.0)
    with np.errstate(invalid="ignore", over="ignore"):
        h_out = 0.9 * np.sqrt(t2)
        n = np.ceil(np.abs(dt) / np.maximum(h_out, 1e-300))
    n = np.where(np.isfinite(n), n, 1.0)
    n_tail = np.clip(n, 1, _n_sub_cap(cfg)).astype(np.int64)
    # only reroute when the fast schedule actually wins: a dominated
    # pair whose SECOND timescale is also short yields n_tail close to
    # the original demand, and the reroute would just trade the (often
    # fused) slow engine for an equally-deep XLA scan (measured: a
    # gain-blind policy REGRESSED the 16k mixture 446 -> 300 systems/s)
    gain = int(getattr(cfg, "tail_min_gain", 8))
    n_capped = np.minimum(n_sub_raw, _n_sub_cap(cfg))
    sel = sel & (n_tail * gain <= n_capped)
    return sel, n_tail


#: substep-count bucket ladder (~1.5x steps; 1..4 exact because most
#: populations concentrate there)
_BUCKET_LADDER = np.asarray([1, 2, 3, 4, 6, 8, 12, 16, 24, 32, 48, 64,
                             96, 128, 192, 256, 384, 512, 768, 1024])


def _bucket_ladder_values(n_subs: np.ndarray) -> np.ndarray:
    """Round each n_sub up to the next ladder value (exact above the
    ladder's top, which no realistic split_n_max reaches)."""
    n = np.maximum(np.asarray(n_subs, np.int64), 1)
    idx = np.searchsorted(_BUCKET_LADDER, n, side="left")
    out = np.where(idx < len(_BUCKET_LADDER),
                   _BUCKET_LADDER[np.minimum(idx, len(_BUCKET_LADDER) - 1)],
                   n)
    return out


def serialize_ic_columns(mass, pos, vel, mask, *, G, softening,
                         min_softening, cfg) -> dict:
    """Per-body IC columns + sim metadata for a batched population —
    the vectorised counterpart of ``StabilityAnalyzer.serialize_to_dict``
    (minbody/stability_analyzer.py:521-561): columns n_bodies, G,
    softening, min_softening, adaptive, integrator_mode, then mass_i,
    x_i, y_i, vx_i, vy_i per body slot (NaN on masked slots, matching
    the ragged-union semantics of a concatenated reference frame)."""
    mass = np.asarray(mass)
    pos = np.asarray(pos)
    vel = np.asarray(vel)
    mask = np.asarray(mask)
    B, n_slots = mass.shape
    d = pos.shape[-1]
    axis_names = ("x", "y", "z")[:d]

    out = {
        "n_bodies": mask.sum(1).astype(np.int64),
        "G": np.broadcast_to(np.asarray(G, np.float64), (B,)).copy(),
        "softening": np.broadcast_to(np.asarray(softening, np.float64),
                                     (B,)).copy(),
        "min_softening": np.broadcast_to(np.asarray(min_softening,
                                                    np.float64), (B,)).copy(),
        "adaptive": np.full(B, float(cfg.adaptive_softening
                                     or cfg.integrator_mode == "ham_soft")),
        "integrator_mode": np.full(B, cfg.integrator_mode, dtype=object),
    }
    nan = np.nan
    for i in range(n_slots):
        valid = mask[:, i]
        out[f"mass_{i}"] = np.where(valid, mass[:, i], nan)
    for i in range(n_slots):
        valid = mask[:, i]
        for a, name in enumerate(axis_names):
            out[f"{name}_{i}"] = np.where(valid, pos[:, i, a], nan)
    for i in range(n_slots):
        valid = mask[:, i]
        for a, name in enumerate(axis_names):
            out[f"v{name}_{i}"] = np.where(valid, vel[:, i, a], nan)
    return out


def ic_feature_frame(mass, pos, vel, mask, cfg, *, G=1.0, softening=0.05,
                     min_softening=0.0, dt=0.01, include_ics=True):
    """The PRE-INTEGRATION feature frame for a fresh (B, N, d)
    population WITHOUT running any integration: per-body IC columns +
    sim metadata (``serialize_ic_columns``), the ``initial_*`` static
    features, and the frozen-schedule transparency columns (n_sub /
    n_sub_capped) — byte-identical to the same columns of an
    ``analyze_population`` frame on the same population (they are all
    computed before the first step there too; tested).

    This is the fast inference path the product exists for: score new
    systems with a trained stability classifier (ml/predict.py) at
    feature-extraction cost instead of integration cost (the
    reference's >= 1e5x claim, minbody/README.md:56).
    """
    import pandas as pd

    from ..integrators import calibration as calib
    from ..parallel.batch_engine import build_batch

    dtype = jnp.float32 if cfg.fast_float32 else jnp.float64
    mass = jnp.asarray(mass, dtype)
    pos = jnp.asarray(pos, dtype)
    vel = jnp.asarray(vel, dtype)
    mask = jnp.asarray(mask, bool)

    jcfg = _engine_cfg(cfg)
    states, dyns = build_batch(mass, pos, vel, mask, jcfg, G, softening,
                               min_softening, dt)
    if cfg.integrator_mode == "ham_soft":
        mu_new = calib.calibrate_mu_from_pi_budget(
            dyns.mu_soft, dyns.k_soft, jnp.asarray(abs(dt), dtype),
            jnp.asarray(cfg.theta_imp, dtype))
        dyns = dyns.replace(mu_soft=mu_new)
    n_sub_raw = np.asarray(jax.device_get(dyns.n_sub))

    res_np = {}
    if include_ics:
        res_np.update(serialize_ic_columns(
            mass, pos, vel, np.asarray(jax.device_get(mask)), G=G,
            softening=jax.device_get(softening),
            min_softening=min_softening, cfg=cfg))
    feats = _fetch_packed(_features_batch_jit(states, dyns, jcfg),
                          mass.shape[0])
    res_np.update({f"initial_{k}": v for k, v in feats.items()})
    res_np["n_sub"] = n_sub_raw.astype(np.int64)
    res_np["n_sub_capped"] = n_sub_raw > _n_sub_cap(cfg)
    return pd.DataFrame(res_np)


def analyze_population(mass, pos, vel, mask, cfg, *, G=1.0, softening=0.05,
                       min_softening=0.0, dt=0.01, n_steps=1000,
                       mode="core", seed=0, show_progress=True,
                       include_ics=True, id_offset=0, timing_out=None):
    """Fully-batched population analysis: ONE construction program and
    ONE analysis program for (B, N, d) arrays — no per-system host
    work.  This is the path that makes the 1e5-system sweep of
    BASELINE config #5 feasible (the facade path costs ~0.25 s of host
    dispatch per system over a remote-TPU link).

    ``softening`` / ``G`` / ``min_softening`` may be scalars or (B,)
    arrays.  Returns a pandas DataFrame shaped like
    ``BatchStabilityAnalyzer.analyze_batch``'s, prefixed (when
    ``include_ics``) with the reference's serialize_to_dict schema:
    per-body IC columns and sim metadata
    (minbody/stability_analyzer.py:521-561).

    ``timing_out``: optional dict that receives the wall-clock phase
    breakdown — setup_s (construction + scheduling), dispatch_s (the
    pipelined group-launch loop), drain_s (the packed device->host
    fetch), frame_s (host DataFrame assembly), n_groups, n_dispatches
    — so a bench can tell engine time from tunnel-latency variance
    (VERDICT round-4 item 1a).
    """
    import pandas as pd

    from ..integrators import calibration as calib
    from ..parallel.batch_engine import build_batch

    _t_setup0 = __import__("time").perf_counter()
    B = pos.shape[0]
    dtype = jnp.float32 if cfg.fast_float32 else jnp.float64
    mass = jnp.asarray(mass, dtype)
    pos = jnp.asarray(pos, dtype)
    vel = jnp.asarray(vel, dtype)
    mask = jnp.asarray(mask, bool)

    if show_progress:
        print(f"Analyzing {B} systems (batched)...")

    jcfg = _engine_cfg(cfg)
    states, dyns = build_batch(mass, pos, vel, mask, jcfg, G, softening,
                               min_softening, dt)
    if cfg.integrator_mode == "ham_soft":
        mu_new = calib.calibrate_mu_from_pi_budget(
            dyns.mu_soft, dyns.k_soft, jnp.asarray(abs(dt), dtype),
            jnp.asarray(cfg.theta_imp, dtype))
        dyns = dyns.replace(mu_soft=mu_new)
    n_sub_raw = np.asarray(jax.device_get(dyns.n_sub))
    dyns = dyns.replace(n_sub=jnp.minimum(
        dyns.n_sub, jnp.asarray(int(_n_sub_cap(cfg)), jnp.int32)))

    megno_steps = 0
    if mode == "full":
        n_samp = min(50, n_steps // 2)
        megno_steps = min(100, n_samp) if n_samp > 0 else 0

    # per-system keys from the GLOBAL system id so a process-sharded
    # run (parallel/distributed.py) reproduces the single-process
    # MEGNO draws exactly
    keys = jax.vmap(lambda i: jax.random.fold_in(jax.random.PRNGKey(seed),
                                                 i))(
        jnp.arange(id_offset, id_offset + B, dtype=jnp.uint32))

    # --- n_sub bucketing: in a masked batch every system pays the
    # group's max substep count, so split the population into n_sub
    # buckets (typical populations are dominated by n_sub <= 2 with a
    # pathological tail at split_n_max).  The ladder steps by ~1.5x —
    # finer than the round-1 power-of-two ladder, which wasted up to 2x
    # substeps on systems just above a boundary (VERDICT round-1
    # item 3c) — at the price of a few more compiled programs.
    n_subs = np.asarray(jax.device_get(dyns.n_sub))
    # tight-binary tail fast path: re-schedule dominated high-n_sub
    # systems onto the kepler_split integrator at the OUTER timescale
    # (integrators/kepler_split.py; VERDICT round-2 item 1)
    tail_sel, n_tail = _tail_selection(states, dyns, cfg, n_sub_raw, dt)
    n_sub_eff = np.where(tail_sel, n_tail, n_subs)
    cfg_tail = jcfg
    if tail_sel.any():
        dyns = dyns.replace(n_sub=jnp.asarray(n_sub_eff, jnp.int32))
        cfg_tail = jcfg.replace(integrator_mode="kepler_split")
    buckets = _bucket_ladder_values(n_sub_eff)
    res_rows = {}
    feats_rows = {}
    # fused-kernel path gating (see analysis/fused.py): the pipeline's
    # exact ham_soft configuration with uniform G on a TPU batch
    from .fused import analyze_batch_fused, fused_path_applicable

    g_np = np.asarray(jax.device_get(G), np.float64)
    g_uniform = g_np.size == 1 or bool((g_np == g_np.flat[0]).all())
    _LANES = 128  # 256-lane blocks spill the 16M scoped-VMEM budget at N=8 slots

    quantum = int(getattr(cfg, "analysis_group_quantum", 0) or 0)

    def _group_pad(idx, min_bsz=1):
        """Power-of-two padding so repeated runs reuse compiled
        programs (shared by the metric runs and the feature pass)."""
        bsz = max(1 << int(np.ceil(np.log2(len(idx)))), int(min_bsz))
        pad_idx = np.concatenate([idx, np.repeat(idx[:1], bsz - len(idx))])
        take = lambda t: jax.tree_util.tree_map(lambda x: x[pad_idx], t)
        return bsz, pad_idx, take

    def _chunks(idx, min_bsz=1):
        """Dispatch plan for a group: list of (pad_idx, bsz, n_valid).

        quantum == 0: one power-of-two padded dispatch (interactive
        default).  quantum > 0: fixed chunks of exactly ``quantum``
        lanes, so the compiled program shape — hence per-lane f32
        rounding — is identical no matter how the population was
        sharded (cfg.analysis_group_quantum; the bit-reproducibility
        contract of parallel/distributed.py)."""
        if quantum <= 0:
            bsz, pad_idx, _ = _group_pad(idx, min_bsz)
            return [(pad_idx, bsz, len(idx))]
        out = []
        for s in range(0, len(idx), quantum):
            part = idx[s:s + quantum]
            pad = np.concatenate(
                [part, np.repeat(part[:1], quantum - len(part))])
            out.append((pad, quantum, len(part)))
        return out

    fused_misses = []

    def _engine_for(rcfg, mode_run, bsz):
        """'fused' | 'scan' for one chunk, recording gate misses for
        the observability log (VERDICT round-3 hygiene item: small /
        odd-shaped groups silently fell off the fused engine)."""
        fused = (g_uniform and bsz % (8 * _LANES) == 0
                 and fused_path_applicable(rcfg, mode_run, bsz, dtype,
                                           _LANES))
        if (not fused and getattr(rcfg, "use_fused_analysis", False)
                and rcfg.integrator_mode == "ham_soft"  # tail kepler_split
                # chunks ride the scan engine by design — not a miss
                and jax.devices()[0].platform != "cpu"):
            why = []
            if not g_uniform:
                why.append("non-uniform G")
            if bsz % (8 * _LANES) != 0:
                why.append(f"chunk width {bsz} % {8 * _LANES} != 0")
            if not fused_path_applicable(rcfg, mode_run, bsz, dtype,
                                         _LANES):
                why.append("cfg/platform gate")
            fused_misses.append((bsz, "; ".join(why)))
        return "fused" if fused else "scan"

    def _dispatch_group(idx, n_steps_run, mode_run, b, megno_run,
                        rcfg, want_features, min_bsz=1):
        """Gather the chunks of one group in stacked programs and launch
        ``lax.map``-over-chunks analysis programs (metrics + merged
        features + device-side column packing in one exported module;
        see ``_analysis_multi``).  The chunk plan is split into
        power-of-two-sized sub-stacks (binary decomposition, largest
        first) so the set of DISTINCT compiled (k, quantum) shapes per
        bucket is O(log k) instead of one per group size — a 10M-row
        run meets hundreds of distinct bucket sizes and a fresh
        stacked-program trace costs ~50-75 s on this host.  Launches
        are all asynchronous (the caller drains later), so the extra
        log2(k) dispatches ride the device queue for free.  Returns a
        list of (packed_device_dict, sel_lanes, global_rows) triples —
        nothing fetched.
        """
        from ..utils.aot_cache import aot_call

        plan = _chunks(idx, min_bsz)
        bsz = plan[0][1]
        out = []
        s = 0
        while s < len(plan):
            k = min(1 << ((len(plan) - s).bit_length() - 1), _STACK_MAX)
            sub = plan[s:s + k]
            s += k
            pad2d = np.stack([p[0] for p in sub])
            sel = np.concatenate([np.arange(i * bsz, i * bsz + nv)
                                  for i, (_p, _b, nv) in enumerate(sub)])
            rows = np.concatenate([p[0][:p[2]] for p in sub])
            st, dy, ks = _take_stack_jit(states, dyns, keys, pad2d)
            # Engine programs go through the jax.export AOT cache: the
            # per-(bucket, engine) ladder costs ~50-75 s of host-side
            # tracing per program in a fresh process, which the
            # persistent XLA compile cache cannot skip; exported
            # StableHLO reloads in milliseconds and its compile hits
            # the compile cache byte-exactly (utils/aot_cache.py).
            pk = aot_call(
                "an_multi", _analysis_multi, (st, dy),
                dict(keys=ks, dt=jnp.asarray(dt, dtype)),
                dict(cfg=rcfg, feat_cfg=jcfg, n_steps=int(n_steps_run),
                     mode=mode_run, n_sub_max=int(b),
                     megno_steps=megno_run,
                     engine=_engine_for(rcfg, mode_run, bsz),
                     lanes=_LANES, g_static=float(g_np.flat[0]),
                     with_features=bool(want_features)))
            out.append((pk, sel, rows))
        return out

    def _run_group(idx, n_steps_run, mode_run, b, megno_run, min_bsz=1,
                   run_cfg=None, want_features=False):
        """Analyze the systems at ``idx``; returns unpadded column
        dict (fetched).  Lanes are independent on both engines, so
        results per system do not depend on the padded batch size —
        only on WHICH engine runs (``min_bsz`` lets a shrunken
        survivor group stay on the fused path its bucket used).
        ``run_cfg`` overrides the integrator config (the tail fast
        path's kepler_split mode).  Used by the early-exit probe path,
        which must fetch before deciding; the default path pipelines
        dispatch across ALL groups instead (see the group loop)."""
        rcfg = jcfg if run_cfg is None else run_cfg
        parts = _drain_packed(_dispatch_group(
            idx, n_steps_run, mode_run, b, megno_run, rcfg,
            want_features, min_bsz=min_bsz))
        if len(parts) == 1:
            return parts[0]
        return {k: np.concatenate([p[k] for p in parts])
                for k in parts[0]}

    # early-exit policy for the pathological tail (see cfg docstrings):
    # high-n_sub systems dominate wall clock, and most of them blow up
    # (|energy drift| > 10 -> forced unstable) within the first ~10% of
    # steps.  Probe those buckets briefly in core mode, then run ONLY
    # the survivors to the full horizon — survivors recompute from
    # scratch, so their columns are bit-identical to a non-early-exit
    # run; aborted rows keep their (already > threshold) probe drift,
    # NaN chaos columns, and an early_exit marker.
    probe_frac = float(getattr(cfg, "early_exit_probe", 0.0) or 0.0)
    min_b = int(getattr(cfg, "early_exit_min_n_sub", 8))
    early_rows = np.zeros(B, bool)

    import os as _os
    import time as _time

    _timing = _os.environ.get("NB_ANALYSIS_TIMING") == "1"
    _t_setup = _time.perf_counter() - _t_setup0
    groups = []
    for b in np.unique(buckets):
        for is_tail in (False, True):
            gidx = np.nonzero((buckets == b) & (tail_sel == is_tail))[0]
            if len(gidx):
                groups.append((int(b), is_tail, gidx))
    if quantum > 0 and getattr(cfg, "analysis_bucket_packing", True):
        groups = _pack_groups(groups, quantum)

    def _scatter(r, part):
        for k, v in r.items():
            target = feats_rows if k.startswith("initial_") else res_rows
            target.setdefault(k, np.zeros(B, v.dtype))[part] = v

    # Pipelined dispatch: launch EVERY group's chunks first (gather +
    # one analysis program each, all asynchronous), then drain with one
    # packed transfer for all chunks.  The round-3 loop fetched each
    # group before dispatching the next, so ~10 group boundaries each
    # stalled the host on the tunnel's transfer latency (VERDICT
    # round-3 item 1's "overlap chunk k+1's gather with chunk k's
    # fetch" — generalised to full-population lookahead; chunk outputs
    # are ~0.5 MB each, so device residency is trivial).
    pending = []  # (packed_device_dict, sel_lanes, global_rows)
    _t_disp0 = _time.perf_counter()
    for b, is_tail, idx in groups:
        _t0 = _time.perf_counter() if _timing else 0.0
        run_cfg = cfg_tail if is_tail else jcfg
        # the probe only applies to metric-producing modes: a
        # "minimal" run returns too few columns for the merge to be
        # consistent.  Tail-fast-path buckets skip it — they are cheap
        # already and their Hamiltonian differs from the probe's.
        if (probe_frac > 0.0 and b >= min_b and n_steps >= 20
                and not is_tail and mode in ("core", "full")):
            n_probe = max(10, int(round(n_steps * probe_frac)))
            bucket_bsz = _chunks(idx)[0][1]
            bucket_fused = (g_uniform
                            and bucket_bsz % (8 * _LANES) == 0
                            and fused_path_applicable(jcfg, mode,
                                                      bucket_bsz, dtype,
                                                      _LANES))
            rp = _run_group(idx, n_probe, "core", b, 0)
            drift = np.asarray(rp["energy_drift"], np.float64)
            bad = (~np.isfinite(drift)) | (np.abs(drift) > 10.0)
            if bad.any():
                early_rows[idx[bad]] = True
                for k in ("MEGNO", "lyapunov_time", "megno_slope_med"):
                    if k in rp:
                        rp[k] = np.where(bad, np.nan, rp[k]).astype(
                            rp[k].dtype)
                surv = idx[~bad]
                r = {k: np.array(v) for k, v in rp.items()}  # writable
                if mode == "full":
                    # the probe ran in core mode, so the full-mode-only
                    # chaos columns are absent from rp; pre-create them
                    # as NaN so an all-abort bucket doesn't leave them
                    # to the 0.0 setdefault below (0.0 is a meaningful
                    # MEGNO/lyapunov value) and the frame schema stays
                    # consistent even when every bucket aborts
                    for k in ("MEGNO", "lyapunov_time", "megno_slope_med"):
                        if k not in r:
                            r[k] = np.full(len(idx), np.nan)
                if len(surv):
                    # keep the survivors on the engine their bucket
                    # would use (per-lane results are batch-size
                    # independent but NOT engine independent at f32)
                    rs = _run_group(surv, n_steps, mode, b, megno_steps,
                                    min_bsz=8 * _LANES if bucket_fused
                                    else 1)
                    smask = ~bad
                    for k, v in rs.items():
                        if k not in r:
                            r[k] = np.full(len(idx), np.nan, v.dtype) \
                                if np.issubdtype(v.dtype, np.floating) \
                                else np.zeros(len(idx), v.dtype)
                        r[k][smask] = v
                _scatter(r, idx)
                if mode == "full":
                    # metric rows were assembled from probe + survivor
                    # runs, but the static initial features must cover
                    # every row (aborted ones included)
                    fpending = []
                    for pad_idx, _bsz, n_valid in _chunks(idx):
                        st, dy, _ks = _take_jit(states, dyns, keys,
                                                pad_idx)
                        fr = _features_batch_jit(st, dy, jcfg)
                        fpending.append((fr, n_valid))
                    fparts = [_fetch_packed(fr, nv) for fr, nv in fpending]
                    f = fparts[0] if len(fparts) == 1 else {
                        k: np.concatenate([p[k] for p in fparts])
                        for k in fparts[0]}
                    _scatter({f"initial_{k}": v for k, v in f.items()},
                             idx)
                if _timing:
                    print(f"[analysis-timing] bucket n_sub={b} "
                          f"tail={is_tail} n={len(idx)} probe "
                          f"{_time.perf_counter() - _t0:.3f}s", flush=True)
                continue
            # probe found nothing: fall through to the pipelined path
            # for the full-horizon run (probe columns are recomputed —
            # survivors restart from scratch by contract)
        pending.extend(_dispatch_group(idx, n_steps, mode, b, megno_steps,
                                       run_cfg, mode == "full"))
        if _timing:
            print(f"[analysis-timing] bucket n_sub={b} tail={is_tail} "
                  f"n={len(idx)} pad={_chunks(idx)[0][1]} "
                  f"chunks={len(_chunks(idx))} dispatch "
                  f"{_time.perf_counter() - _t0:.3f}s", flush=True)
    _t_disp = _time.perf_counter() - _t_disp0
    _t0 = _time.perf_counter()
    for (pk, _sel, rows), r in zip(pending, _drain_packed(pending)):
        _scatter(r, rows)
    _t_drain = _time.perf_counter() - _t0
    if _timing and pending:
        print(f"[analysis-timing] drain {len(pending)} groups "
              f"{_t_drain:.3f}s", flush=True)
    _t_frame0 = _time.perf_counter()
    if fused_misses and show_progress:
        from collections import Counter

        tally = Counter(why for _bsz, why in fused_misses)
        for why, cnt in tally.items():
            print(f"[analysis] {cnt} chunk(s) ran the scan engine "
                  f"instead of the fused kernel: {why}")

    res_np = {}
    if include_ics:
        res_np.update(serialize_ic_columns(
            mass, pos, vel, np.asarray(jax.device_get(mask)), G=G,
            softening=jax.device_get(softening), min_softening=min_softening,
            cfg=cfg))
    res_np.update(res_rows)
    res_np.update(feats_rows)
    # schedule transparency: the uncapped frozen substep demand and
    # whether the cap bound (under-integrated systems can carry noisy
    # labels; see cfg.analysis_n_sub_cap)
    res_np["n_sub"] = n_sub_raw.astype(np.int64)
    res_np["n_sub_capped"] = n_sub_raw > _n_sub_cap(cfg)
    if getattr(cfg, "analysis_tail_policy", "off") == "kepler":
        res_np["tail_fast_path"] = tail_sel
    if probe_frac > 0.0:
        res_np["early_exit"] = early_rows
    df = pd.DataFrame(res_np)
    df["mode"] = mode
    bad = (~np.isfinite(df["energy_drift"])) | (df["energy_drift"].abs() > 10)
    df["pathological_energy"] = bad
    df.loc[bad, "is_stable"] = 0.0
    if cfg.integrator_mode == "ham_soft":
        df["softening_policy"] = "adaptive-ham"
    elif cfg.adaptive_softening:
        df["softening_policy"] = "adaptive-classic"
    else:
        df["softening_policy"] = "static"
    df["simulation_id"] = np.arange(B)
    if timing_out is not None:
        timing_out.update(
            setup_s=_t_setup, dispatch_s=_t_disp, drain_s=_t_drain,
            frame_s=_time.perf_counter() - _t_frame0,
            n_groups=len(groups), n_dispatches=len(pending))
    if show_progress:
        print(f"Completed: {B} simulations analyzed")
    return df


class BatchStabilityAnalyzer:
    def __init__(self, n_steps: int = 1000, dt: float = 0.01,
                 mode: str = "core", seed: int = 0) -> None:
        self.n_steps = int(n_steps)
        self.dt = float(dt)
        self.mode = mode
        self.seed = int(seed)
        self.results: list = []

    def analyze_simulation(self, sim) -> dict:
        """Single-system path (batch_stability_analyzer.py:37-58)."""
        analyzer = StabilityAnalyzer(sim, self.n_steps, self.dt,
                                     mode=self.mode)
        result = analyzer.run_stability_analysis() or {}
        self._postprocess(result, sim)
        return result

    @staticmethod
    def _postprocess(result: dict, sim) -> None:
        if "energy_drift" in result:
            if abs(result["energy_drift"]) > 10 or not np.isfinite(
                    result["energy_drift"]):
                result["is_stable"] = 0.0
                result["pathological_energy"] = True
            else:
                result["pathological_energy"] = False
        else:
            result["pathological_energy"] = False
        if sim._integrator_mode == "ham_soft":
            result["softening_policy"] = "adaptive-ham"
        elif sim._adaptive_softening:
            result["softening_policy"] = "adaptive-classic"
        else:
            result["softening_policy"] = "static"

    def analyze_batch(self, simulations, show_progress: bool = True):
        """One compiled vmap per (cfg, mode, N-slots) group."""
        import pandas as pd

        self.results = [None] * len(simulations)
        if show_progress:
            print(f"Analyzing {len(simulations)} simulations...")

        groups = defaultdict(list)
        for i, sim in enumerate(simulations):
            groups[(sim.cfg, self.mode)].append(i)

        megno_steps = 0
        if self.mode == "full":
            n_samp = min(50, self.n_steps // 2)
            megno_steps = min(100, n_samp) if n_samp > 0 else 0

        key0 = jax.random.PRNGKey(self.seed)
        for (cfg, mode), idxs in groups.items():
            sims = [simulations[i] for i in idxs]
            # schedule for this dt without mutating the caller's sims
            # (strang_substeps' pi-budget raise, HSI:800)
            raw_list = [_scheduled_dyn(s, self.dt, cap=False)
                        for s in sims]
            # n_sub columns record the PRE-cap schedule demand like
            # analyze_population (n_sub_raw there); integration uses
            # the capped schedule
            n_subs_raw = np.asarray(jax.device_get(
                jnp.stack([d.n_sub for d in raw_list])))
            dyns_list = [
                d.replace(n_sub=jnp.minimum(
                    d.n_sub, jnp.asarray(int(_n_sub_cap(cfg)), jnp.int32)))
                for d in raw_list]
            n_subs = np.asarray(jax.device_get(
                jnp.stack([d.n_sub for d in dyns_list])))
            n_sub_max = int(n_subs.max())
            states, dyns = stack_sims(sims, dyns_list)
            keys = jax.random.split(jax.random.fold_in(key0, idxs[0]),
                                    len(idxs))
            res, _ = analyze_batch_jit(
                states, dyns, cfg, keys, self.n_steps,
                jnp.asarray(self.dt, states.pos.dtype), mode, n_sub_max,
                megno_steps)
            if self.mode == "full":
                from ..diagnostics import features as F

                feats = _features_batch_jit(states, dyns, cfg)
                res = dict(res)
                for k, v in feats.items():
                    res[f"initial_{k}"] = v
            res_np = {k: np.asarray(v) for k, v in res.items()}
            # schema parity with analyze_population: per-body IC columns
            # + sim metadata (serialize_to_dict, stability_analyzer.py:521)
            res_np.update(serialize_ic_columns(
                states.mass, states.pos, states.vel,
                np.asarray(jax.device_get(states.mask)),
                G=np.asarray(jax.device_get(dyns.G), np.float64),
                softening=np.asarray(jax.device_get(dyns.s0), np.float64),
                min_softening=np.asarray(
                    jax.device_get(dyns.min_softening), np.float64),
                cfg=cfg))
            res_np["n_sub"] = n_subs_raw.astype(np.int64)
            res_np["n_sub_capped"] = n_subs_raw > _n_sub_cap(cfg)
            for j, i in enumerate(idxs):
                row = {}
                for k, v in res_np.items():
                    val = v[j]
                    if isinstance(val, str):
                        row[k] = val
                    elif isinstance(val, (np.bool_, bool)):
                        row[k] = bool(val)
                    elif isinstance(val, (np.integer, int)):
                        row[k] = int(val)
                    else:
                        row[k] = float(val)
                row["mode"] = self.mode
                self._postprocess(row, simulations[i])
                row["simulation_id"] = i
                self.results[i] = row

        if show_progress:
            print(f"Completed: {len(self.results)} simulations analyzed")
        return pd.DataFrame(self.results)

    def save_batch_results(self, filename: str) -> None:
        import pandas as pd

        if not self.results:
            print("[error] No results to save. Run analyze_batch first.")
            return
        df = pd.DataFrame(self.results)
        df.to_csv(filename, index=False)
        print(f"Saved {len(df)} results to {filename}")

    def get_feature_matrix(self) -> np.ndarray:
        import pandas as pd

        if not self.results:
            print("[error] No results available. Run analyze_batch first.")
            return np.array([])
        return pd.DataFrame(self.results).values
