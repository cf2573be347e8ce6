"""Fused multi-step batched Verlet kernel (interpret mode on CPU)."""

import numpy as np
import pytest

import nbodysimproject_tpu as nb


def _batch(B=16, n=3, d=2, seed=0):
    import jax.numpy as jnp

    from nbodysimproject_tpu.parallel import build_batch

    cfg = nb.SimConfig(integrator_mode="verlet")
    rng = np.random.default_rng(seed)
    base_q = np.zeros((n, d))
    base_q[1, 0] = 1.0
    base_q[2, 1] = 2.0
    q = base_q[None] + 0.01 * rng.normal(size=(B, n, d))
    m = np.broadcast_to(np.linspace(1.0, 0.1, n), (B, n)).copy()
    v = rng.normal(size=(B, n, d)) * 0.3
    mask = np.ones((B, n), bool)
    return cfg, build_batch(jnp.asarray(m), jnp.asarray(q), jnp.asarray(v),
                            jnp.asarray(mask), cfg, 1.0, 1e-3, 0.0, 0.01)


def test_matches_xla_scan():
    import jax.numpy as jnp

    from nbodysimproject_tpu.ops.pallas_batch import verlet_multistep
    from nbodysimproject_tpu.parallel import integrate_batch

    cfg, (states, dyns) = _batch()
    ref = integrate_batch(states, dyns, cfg, jnp.float64(0.01), 40, 1)
    po, vo = verlet_multistep(states.pos, states.vel, states.mass,
                              states.step_s2, h=0.01, G=1.0, n_steps=40,
                              lanes=2, interpret=True)
    np.testing.assert_allclose(np.asarray(po), np.asarray(ref.pos),
                               rtol=1e-7, atol=1e-8)
    np.testing.assert_allclose(np.asarray(vo), np.asarray(ref.vel),
                               rtol=1e-7, atol=1e-8)


def test_unroll_matches_unrolled():
    """unroll > 1 is a pure scheduling change: identical float32 output
    (the op sequence per step is unchanged, only the loop trip count)."""
    from nbodysimproject_tpu.ops.pallas_batch import verlet_multistep

    cfg, (states, dyns) = _batch(B=16)
    p1, v1 = verlet_multistep(states.pos, states.vel, states.mass,
                              states.step_s2, h=0.01, G=1.0, n_steps=40,
                              lanes=2, unroll=1, interpret=True)
    p4, v4 = verlet_multistep(states.pos, states.vel, states.mass,
                              states.step_s2, h=0.01, G=1.0, n_steps=40,
                              lanes=2, unroll=4, interpret=True)
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p4))
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v4))


def test_yoshida4_matches_xla_scan():
    """The staged composition kernel reproduces the yoshida4 triple-jump
    scan (integrators/classical.py) — fused-kick algebra included."""
    import jax.numpy as jnp

    from nbodysimproject_tpu.ops.pallas_batch import yoshida4_multistep
    from nbodysimproject_tpu.parallel import integrate_batch

    cfg, (states, dyns) = _batch()
    cfg = cfg.replace(integrator_mode="yoshida4")
    ref = integrate_batch(states, dyns, cfg, jnp.float64(0.01), 40, 1)
    po, vo = yoshida4_multistep(states.pos, states.vel, states.mass,
                                states.step_s2, h=0.01, G=1.0, n_steps=40,
                                lanes=2, interpret=True)
    np.testing.assert_allclose(np.asarray(po), np.asarray(ref.pos),
                               rtol=1e-7, atol=1e-8)
    np.testing.assert_allclose(np.asarray(vo), np.asarray(ref.vel),
                               rtol=1e-7, atol=1e-8)


def test_yoshida4_momentum_conserved():
    from nbodysimproject_tpu.ops.pallas_batch import yoshida4_multistep

    cfg, (states, dyns) = _batch(B=8)
    p0 = np.asarray((states.mass[..., None] * states.vel).sum(axis=1))
    po, vo = yoshida4_multistep(states.pos, states.vel, states.mass,
                                states.step_s2, h=0.01, G=1.0, n_steps=100,
                                lanes=1, interpret=True)
    m = np.asarray(states.mass)
    p1 = (m[..., None] * np.asarray(vo)).sum(axis=1)
    assert np.abs(p1 - p0).max() < 1e-12


def test_momentum_conserved():
    from nbodysimproject_tpu.ops.pallas_batch import verlet_multistep

    cfg, (states, dyns) = _batch(B=8)
    p0 = np.asarray((states.mass[..., None] * states.vel).sum(axis=1))
    po, vo = verlet_multistep(states.pos, states.vel, states.mass,
                              states.step_s2, h=0.01, G=1.0, n_steps=100,
                              lanes=1, interpret=True)
    m = np.asarray(states.mass)
    p1 = (m[..., None] * np.asarray(vo)).sum(axis=1)
    assert np.abs(p1 - p0).max() < 1e-12


class TestHamsoftFusedKernel:
    def test_interpret_parity_vs_xla_scan(self):
        """The fused multi-step ham_soft kernel reproduces the XLA scan
        path (macro_step_dynamic) to f32 rounding, including per-system
        dynamic n_sub and the (eps*, grad) cache semantics."""
        import functools

        import jax
        import jax.numpy as jnp

        import nbodysimproject_tpu as nb
        from nbodysimproject_tpu.parallel.batch_engine import build_batch
        from nbodysimproject_tpu.integrators.step import macro_step_dynamic
        from nbodysimproject_tpu.ops.pallas_hamsoft import hamsoft_multistep

        B, N, T, DT = 32, 3, 3, 0.01
        cfg = nb.SimConfig(integrator_mode="ham_soft", fast_float32=True)
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        base_q = jnp.asarray([[0.0, 0.0], [1.0, 0.0], [0.0, 2.0]],
                             jnp.float32)
        base_v = jnp.asarray([[0.0, 0.0], [0.0, 1.0], [-0.5, 0.0]],
                             jnp.float32)
        pos = base_q[None] + 0.01 * jax.random.normal(k1, (B, N, 2),
                                                      jnp.float32)
        vel = base_v[None] + 0.01 * jax.random.normal(k2, (B, N, 2),
                                                      jnp.float32)
        mass = jnp.broadcast_to(jnp.asarray([1.0, 0.5, 0.1], jnp.float32),
                                (B, N))
        mask = jnp.ones((B, N), bool)
        states, dyns = build_batch(mass, pos, vel, mask, cfg, 1.0, 5e-2,
                                   0.0, DT)
        n_sub = np.asarray(dyns.n_sub)
        nsm = int(n_sub.max())
        assert nsm >= 1

        @functools.partial(jax.jit, static_argnames=("cfg", "T", "nsm"))
        def run_xla(states, dyns, cfg, dt, T, nsm):
            def body(s, _):
                step = lambda s1, d1: macro_step_dynamic(s1, d1, cfg, dt,
                                                         nsm)
                return jax.vmap(step)(s, dyns), None

            out, _ = jax.lax.scan(body, states, None, length=T)
            return out

        out = run_xla(states, dyns, cfg, jnp.float32(DT), T, nsm)

        h = DT / np.maximum(n_sub, 1).astype(np.float32)
        po, vo, eo, pio = hamsoft_multistep(
            states.pos, states.vel, states.mass, states.eps, states.pi,
            k_soft=dyns.k_soft, mu=dyns.mu_soft, alpha=dyns.alpha_run,
            eps_min=dyns.min_softening, eps_max=dyns.max_softening,
            h=jnp.asarray(h), n_sub=dyns.n_sub, n_steps=T, n_sub_max=nsm,
            G=1.0, k_wall=float(cfg.k_wall), eta=float(cfg.eta),
            jcap=float(cfg.j_max_cap), bexp=int(cfg.barrier_exponent),
            lanes=B // 8, interpret=True)

        np.testing.assert_allclose(np.asarray(po), np.asarray(out.pos),
                                   rtol=2e-5, atol=2e-6)
        np.testing.assert_allclose(np.asarray(vo), np.asarray(out.vel),
                                   rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(np.asarray(eo), np.asarray(out.eps),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(pio), np.asarray(out.pi),
                                   rtol=1e-3, atol=5e-5)


class TestHamsoftMegnoFusedKernel:
    def test_interpret_parity_vs_megno_scan(self):
        """The MEGNO-fused kernel reproduces the XLA megno_scan tail
        (state advance + tangent map + accumulator + slope median) to
        f32 rounding."""
        import jax
        import jax.numpy as jnp

        import nbodysimproject_tpu as nb
        from nbodysimproject_tpu.parallel.batch_engine import build_batch
        from nbodysimproject_tpu.diagnostics.megno import (init_tangent,
                                                           megno_scan)
        from nbodysimproject_tpu.ops.pallas_hamsoft import (
            hamsoft_megno_multistep)

        B, N, T, DT = 16, 3, 4, 0.01
        cfg = nb.SimConfig(integrator_mode="ham_soft", fast_float32=True)
        k1, k2 = jax.random.split(jax.random.PRNGKey(3))
        base_q = jnp.asarray([[0.0, 0.0], [1.0, 0.0], [0.0, 2.0]],
                             jnp.float32)
        base_v = jnp.asarray([[0.0, 0.0], [0.0, 1.0], [-0.5, 0.0]],
                             jnp.float32)
        pos = base_q[None] + 0.01 * jax.random.normal(k1, (B, N, 2),
                                                      jnp.float32)
        vel = base_v[None] + 0.01 * jax.random.normal(k2, (B, N, 2),
                                                      jnp.float32)
        mass = jnp.broadcast_to(jnp.asarray([1.0, 0.5, 0.1], jnp.float32),
                                (B, N))
        mask = jnp.ones((B, N), bool)
        states, dyns = build_batch(mass, pos, vel, mask, cfg, 1.0, 5e-2,
                                   0.0, DT)
        n_sub = np.asarray(dyns.n_sub)
        nsm = int(n_sub.max())
        keys = jax.vmap(jax.random.fold_in,
                        (None, 0))(jax.random.PRNGKey(9),
                                   jnp.arange(B, dtype=jnp.uint32))

        st1, Y, lyap, slope = jax.vmap(
            lambda s, d, k: megno_scan(s, d, cfg, k, T,
                                       jnp.float32(DT), n_sub_max=nsm))(
            states, dyns, keys)

        dr0, dv0 = jax.vmap(init_tangent)(keys, states)
        h = DT / np.maximum(n_sub, 1).astype(np.float32)
        po, vo, eo, pio, Yk, lyapk, slopek = hamsoft_megno_multistep(
            states.pos, states.vel, states.mass, states.eps, states.pi,
            dr0, dv0, k_soft=dyns.k_soft, mu=dyns.mu_soft,
            alpha=dyns.alpha_run, eps_min=dyns.min_softening,
            eps_max=dyns.max_softening, h=jnp.asarray(h),
            n_sub=dyns.n_sub, dt=jnp.float32(DT), n_steps=T,
            n_sub_max=nsm, G=1.0, k_wall=float(cfg.k_wall),
            eta=float(cfg.eta), jcap=float(cfg.j_max_cap),
            bexp=int(cfg.barrier_exponent), lanes=B // 8, interpret=True)

        np.testing.assert_allclose(np.asarray(po), np.asarray(st1.pos),
                                   rtol=2e-5, atol=2e-6)
        np.testing.assert_allclose(np.asarray(eo), np.asarray(st1.eps),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(Yk), np.asarray(Y),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(slopek), np.asarray(slope),
                                   rtol=1e-3, atol=1e-4)
        lyap_np = np.asarray(lyap)
        lyapk_np = np.asarray(lyapk)
        fin = np.isfinite(lyap_np)
        np.testing.assert_array_equal(fin, np.isfinite(lyapk_np))
        np.testing.assert_allclose(lyapk_np[fin], lyap_np[fin], rtol=1e-3)


class TestHamsoftAnalysisFusedEngine:
    """Round-5 coverage of the PRODUCTION analysis engine (VERDICT
    round-4 item 2): ``analyze_batch_fused`` with
    ``cfg.use_fused_metrics=True`` routes every on-TPU full/core-mode
    analysis through ``hamsoft_analysis_multistep``
    (ops/pallas_hamsoft.py) — these tests pin that whole engine
    (kernel + sampled-row J/theta derivation + verdict) against the
    XLA scan engine (``analyze_batch_jit``) in interpret mode on CPU,
    across dimensions, masks, barrier policies, and gradient modes.
    Any metric perturbation in the kernel breaks the column parity
    asserted here."""

    #: per-column (rtol, atol) for fused-vs-scan agreement: the two
    #: engines run the same Strang map in different reduction orders
    #: (plus the kernel's fixed 8-iteration SPH solve, <=1e-6 relative
    #: eps* perturbation), so columns agree to f32 trajectory noise
    _TOL = {
        "is_stable": (0.0, 0.0),
        "energy_drift": (0.05, 1e-5),
        "angular_momentum_drift": (0.05, 1e-5),
        "com_drift_mean": (1e-3, 1e-5),
        "com_drift_max": (1e-3, 1e-5),
        "j_eps_mean": (2e-3, 1e-6),
        "j_eps_std": (2e-3, 1e-6),
        "theta_eps_mean": (2e-3, 1e-3),
        "theta_eps_std": (2e-3, 1e-3),
        "cos_theta_mean": (1e-4, 1e-5),
        "cos_theta_min": (1e-4, 1e-5),
        "ang_mom_var_mean": (2e-3, 1e-7),
        "ang_mom_var_max": (2e-3, 1e-7),
        "tidal_trace_mean": (2e-3, 1e-3),
        "tidal_trace_max": (2e-3, 1e-3),
        "MEGNO": (1e-3, 1e-4),
        "lyapunov_time": (1e-2, 0.0),
        "megno_slope_med": (5e-3, 1e-3),
    }

    def _population(self, B=16, n=3, d=2, masked=False, seed=5, cfg_kw=()):
        import jax
        import jax.numpy as jnp

        from nbodysimproject_tpu.parallel.batch_engine import build_batch

        cfg = nb.SimConfig(integrator_mode="ham_soft", fast_float32=True,
                           **dict(cfg_kw))
        rng = np.random.default_rng(seed)
        base_q = np.zeros((n, d))
        base_q[1, 0] = 1.0
        base_q[2, 1] = 2.0
        if d == 3 and n > 2:
            base_q[2, 2] = 0.5
        q = base_q[None] + 0.01 * rng.normal(size=(B, n, d))
        m = np.broadcast_to(np.linspace(1.0, 0.2, n), (B, n)).copy()
        v = rng.normal(size=(B, n, d)) * 0.2
        mask = np.ones((B, n), bool)
        if masked:
            mask[:, -1] = False
            m[:, -1] = 0.0
        states, dyns = build_batch(
            jnp.asarray(m, jnp.float32), jnp.asarray(q, jnp.float32),
            jnp.asarray(v, jnp.float32), jnp.asarray(mask), cfg, 1.0,
            5e-2, 0.0, 0.01)
        keys = jax.vmap(jax.random.fold_in,
                        (None, 0))(jax.random.PRNGKey(31),
                                   jnp.arange(B, dtype=jnp.uint32))
        return cfg, states, dyns, keys

    def _run_both(self, cfg, states, dyns, keys, mode="core", T=12,
                  megno_steps=0):
        import jax
        import jax.numpy as jnp

        from nbodysimproject_tpu.analysis.fused import analyze_batch_fused
        from nbodysimproject_tpu.analysis.stability import analyze_batch_jit

        nsm = int(np.asarray(dyns.n_sub).max())
        rs, _ = analyze_batch_jit(states, dyns, cfg, keys, T,
                                  jnp.float32(0.01), mode, nsm, megno_steps)
        B = states.pos.shape[0]
        rf, _ = analyze_batch_fused(states, dyns, cfg, keys, T,
                                    jnp.float32(0.01), mode, nsm,
                                    megno_steps, lanes=B // 8,
                                    g_static=1.0, interpret=True)
        return ({k: np.asarray(v) for k, v in rs.items()},
                {k: np.asarray(v) for k, v in rf.items()})

    def _assert_columns(self, rs, rf):
        assert set(rs) == set(rf)
        for k in sorted(rs):
            rtol, atol = self._TOL[k]
            a, b = rs[k], rf[k]
            fin = np.isfinite(a)
            np.testing.assert_array_equal(
                fin, np.isfinite(b), err_msg=f"finiteness mismatch: {k}")
            if k == "is_stable":
                np.testing.assert_array_equal(a, b, err_msg=k)
                continue
            np.testing.assert_allclose(b[fin], a[fin], rtol=rtol,
                                       atol=atol, err_msg=k)

    def test_full_mode_parity_d2(self):
        """The flagship config: full mode with in-register metric
        moments + sampled (eps, pi) rows + fused MEGNO tail."""
        cfg, states, dyns, keys = self._population()
        assert bool(cfg.use_fused_metrics)  # the production default
        rs, rf = self._run_both(cfg, states, dyns, keys, mode="full",
                                T=12, megno_steps=6)
        self._assert_columns(rs, rf)

    def test_core_mode_parity_d3(self):
        cfg, states, dyns, keys = self._population(d=3)
        rs, rf = self._run_both(cfg, states, dyns, keys)
        self._assert_columns(rs, rf)

    def test_core_mode_parity_masked_slots(self):
        cfg, states, dyns, keys = self._population(n=4, masked=True)
        rs, rf = self._run_both(cfg, states, dyns, keys)
        self._assert_columns(rs, rf)

    def test_core_mode_parity_reflection_policy(self):
        cfg, states, dyns, keys = self._population(
            cfg_kw=dict(use_soft_barrier=False))
        rs, rf = self._run_both(cfg, states, dyns, keys)
        self._assert_columns(rs, rf)

    def test_core_mode_parity_reference_grads(self):
        cfg, states, dyns, keys = self._population(
            cfg_kw=dict(eps_grad_mode="reference"))
        rs, rf = self._run_both(cfg, states, dyns, keys)
        self._assert_columns(rs, rf)

    def test_fused_metrics_matches_chunked_sampling(self):
        """use_fused_metrics is a scheduling change on the fused
        engine: one analysis-kernel call per horizon must reproduce
        the round-3 form (multistep-kernel chunks alternating with XLA
        step_metrics) on every column."""
        import jax.numpy as jnp

        from nbodysimproject_tpu.analysis.fused import analyze_batch_fused

        cfg, states, dyns, keys = self._population()
        nsm = int(np.asarray(dyns.n_sub).max())
        out = {}
        for flag in (True, False):
            cfg_f = cfg.replace(use_fused_metrics=flag)
            r, _ = analyze_batch_fused(states, dyns, cfg_f, keys, 12,
                                       jnp.float32(0.01), "core", nsm, 0,
                                       lanes=2, g_static=1.0,
                                       interpret=True)
            out[flag] = {k: np.asarray(v) for k, v in r.items()}
        self._assert_columns(out[False], out[True])
