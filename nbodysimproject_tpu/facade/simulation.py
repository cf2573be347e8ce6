"""NBodySimulation — the user-facing facade.

API parity: ``minbody/simulation.py:37`` (constructor signature,
properties, step/snapshot/restore, Jacobi transforms, accelerations,
set_integrator_mode, softening bounds, copy, min separation).

Architecture: unlike the reference's mutable object web, this class is
a thin host-side shell over the functional core — it owns a ``SimState``
PyTree, a ``DynParams`` PyTree and a static ``SimConfig``, and calls
jit-compiled pure functions.  All construction-time calibration
(mode demotions, softening manager, ham_soft cascade) happens here with
concrete values, mirroring simulation.py:39-162 and
hamiltonian_softening_integrator.py:47-141.
"""

from __future__ import annotations

import math
from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import SimConfig, _ALLOWED_MODES
from ..core.state import SimState, DynParams, build_state, remove_center_of_mass_velocity
from ..integrators import calibration as calib
from ..integrators import step as step_mod
from ..integrators.classical import apply_corrector, classical_accel, hamsoft_accel
from ..integrators.whfast import whfast_corrector, to_jacobi as _to_jac, from_jacobi as _from_jac
from ..integrators import hamsoft as hs
from ..ops.geometry import min_separation
from .body import Body, BodyView


# --------------------------------------------------------------------------
# jitted kernels (module-level so compilation caches across instances)
# --------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("cfg", "n_sub"))
def _jit_macro_step(state, dyn, cfg, dt, n_sub):
    return step_mod.macro_step(state, dyn, cfg, dt, n_sub)


@partial(jax.jit, static_argnames=("cfg", "n_steps", "n_sub"))
def _jit_integrate(state, dyn, cfg, dt, n_steps, n_sub):
    return step_mod.integrate(state, dyn, cfg, dt, n_steps, n_sub)


@partial(jax.jit, static_argnames=("cfg",))
def _jit_corrector(state, dyn, cfg, h_ref):
    if cfg.integrator_mode == "whfast":
        return whfast_corrector(state, dyn, cfg, h_ref)
    return apply_corrector(state, dyn, cfg, h_ref)


@partial(jax.jit, static_argnames=("cfg",))
def _jit_accel(state, dyn, cfg):
    if cfg.integrator_mode == "ham_soft":
        return hamsoft_accel(state, dyn, cfg)
    return classical_accel(state, dyn, cfg)


class NBodySimulation:
    def __init__(
        self,
        config: Optional[SimConfig] = None,
        bodies=None,
        masses=None,
        positions=None,
        velocities=None,
        G: float = 1.0,
        softening: float = 1e-3,
        min_softening: float = 0.0,
        adaptive: bool = False,
        adaptive_timestep: Optional[bool] = None,
        adaptive_softening: Optional[bool] = None,
        skip_init_corrector: bool = False,
        skip_cm_recenter: bool = False,
        integrator_mode: Optional[str] = None,
    ):
        self.cfg = config.copy() if config else SimConfig()

        # --- adaptivity flags (simulation.py:62-74) ---------------------
        if adaptive_timestep is not None:
            self._adaptive_timestep = bool(adaptive_timestep)
        elif adaptive is not None:
            self._adaptive_timestep = bool(adaptive)
        else:
            self._adaptive_timestep = bool(self.cfg.adaptive_timestep)
        if adaptive_softening is not None:
            self._adaptive_softening = bool(adaptive_softening)
        else:
            self._adaptive_softening = bool(self.cfg.adaptive_softening)
        if self._adaptive_softening and not self._adaptive_timestep:
            self._adaptive_timestep = True

        # --- state construction (simulation_state.py:98-144) ------------
        arrays = self._coerce_inputs(bodies, masses, positions, velocities)
        if arrays is None:
            self._disabled = True
            self._make_empty()
            return
        self._disabled = False
        m_np, q_np, v_np = arrays

        self._dtype = jnp.float32 if self.cfg.fast_float32 else jnp.float64

        # --- COM recenter (simulation.py:85-86) --------------------------
        if not skip_cm_recenter and m_np.size:
            M = m_np.sum()
            if M > 0:
                v_np = v_np - (m_np[:, None] * v_np).sum(0) / M

        # --- softening defaults (simulation.py:88-94) --------------------
        min_softening = max(0.0, float(min_softening))
        softening = float(softening)
        if softening < 0.0:
            softening = min_softening
        if min_softening == 0.0 and softening > 0.0:
            min_softening = 0.1 * softening
        self._min_softening = float(min_softening)
        # construction-time floor, before any ham_soft calibration raise
        # — needed so snapshot/restore reproduces the calibration
        self._min_softening_init = float(min_softening)
        self._softening_scale = float(self.cfg.softening_scale)

        # --- mode resolution (simulation.py:96-120) ----------------------
        if integrator_mode is not None:
            self.cfg = self.cfg.replace(integrator_mode=str(integrator_mode))
        mode = self.cfg.integrator_mode
        self.G = float(G)
        if self.G == 0.0 and mode != "ham_soft":
            mode = "verlet"
        if mode == "whfast":
            if self._adaptive_softening:
                print("[info] WHFast incompatible with adaptive softening; using Verlet")
                mode = "verlet"
            elif m_np.size > 0:
                dominance = float(np.max(m_np) / np.sum(m_np))
                if dominance < 0.2:
                    mode = "verlet"

        # --- softening manager scalars (softening_manager.py:38-70) ------
        s0 = float(max(softening, min_softening))
        self._s0 = s0
        self._max_softening = 10.0 * s0

        if s0 > 0.0 and mode == "whfast":
            mode = "verlet"  # simulation.py:119-120

        if mode == "ham_soft":
            self._adaptive_softening = False  # simulation.py:132-133
        self._integrator_mode = mode
        # The compiled step program is selected by the static cfg — keep
        # the resolved mode and adaptivity flags in sync with it.
        self.cfg = self.cfg.replace(
            integrator_mode=mode,
            adaptive_softening=self._adaptive_softening,
            adaptive_timestep=self._adaptive_timestep,
        )

        self.softening_energy_delta = 0.0
        self._has_integrated = False
        self._in_integration = False
        self._acc_cached = False
        self._last_dt = None

        bucket = max(1, int(self.cfg.slot_bucket))
        n_slots = -(-m_np.size // bucket) * bucket
        self._state = build_state(m_np, q_np, v_np, eps=s0,
                                  n_slots=n_slots, dtype=self._dtype)
        self._n_bodies = int(m_np.size)

        # --- integrator construction -------------------------------------
        # Large-N force engines (P3M / tiled direct) bypass the few-body
        # calibration: it builds dense (N, N) pairwise intermediates that
        # do not fit HBM at N >= 1e5, and its adaptive schedules target
        # close few-body encounters the softened large-N regime smooths
        # away.  integrators/largen.py is the step engine instead.
        self._largen = (self.cfg.force_mode != "direct"
                        and mode == "verlet")
        if self._largen:
            self._init_largen()
        elif mode == "ham_soft":
            self._init_hamsoft()
        else:
            self._init_classical()

        self._top_dt = float(self.cfg.initial_dt)

        # --- startup corrector (simulation.py:150-157) --------------------
        if (
            not skip_init_corrector
            and not self._largen
            and self.G != 0.0
            and not self._adaptive_softening
            and not self._adaptive_timestep
            and mode != "ham_soft"
            and self.cfg.corrector_order > 0
            and self._n_bodies >= (2 if mode == "whfast" else 1)
        ):
            self._state = _jit_corrector(self._state, self._dyn, self.cfg,
                                         self._as_dtype(self._top_dt))

    # ------------------------------------------------------------------
    # construction helpers
    # ------------------------------------------------------------------

    def _as_dtype(self, x):
        return jnp.asarray(x, self._dtype)

    def _coerce_inputs(self, bodies, masses, positions, velocities):
        d = int(self.cfg.dim)
        if bodies is not None:
            m = np.array([b.mass for b in bodies], dtype=np.float64)
            if d == 3:
                q = np.array([[b.x, b.y, getattr(b, "z", 0.0)]
                              for b in bodies], dtype=np.float64)
                v = np.array([[b.vx, b.vy, getattr(b, "vz", 0.0)]
                              for b in bodies], dtype=np.float64)
            else:
                q = np.array([[b.x, b.y] for b in bodies],
                             dtype=np.float64)
                v = np.array([[b.vx, b.vy] for b in bodies],
                             dtype=np.float64)
        elif masses is not None:
            m = np.asarray(masses, dtype=np.float64).ravel()
            q = np.atleast_2d(np.asarray(positions, dtype=np.float64))
            if velocities is None:
                v = np.zeros_like(q)
            else:
                v = np.asarray(velocities, dtype=np.float64)
                if v.ndim == 1:
                    v = np.broadcast_to(v, q.shape).copy()
        else:
            return None
        if m.size == 0 or q.shape[0] != m.size:
            print("[error] invalid state arrays; simulation disabled")
            return None
        if not (np.all(np.isfinite(m)) and np.all(m > 0)
                and np.all(np.isfinite(q)) and np.all(np.isfinite(v))):
            print("[error] non-finite or non-positive inputs; simulation disabled")
            return None
        if q.shape[1] != d:
            # reference is strictly 2-D (simulation_validator.py:43); we
            # accept any d matching cfg.dim
            print(f"[error] positions must be (N, {d}); simulation disabled")
            return None
        return m, q, v

    def _make_empty(self):
        self._n_bodies = 0
        self._dtype = jnp.float64
        self.G = 0.0
        self._integrator_mode = "verlet"
        self._largen = False
        self._state = None
        self._dyn = None
        self.softening_energy_delta = 0.0

    def _init_largen(self):
        """Large-N engine construction: a fixed-softening, fixed-step
        DynParams (no pairwise calibration — that is O(N^2) dense and
        meaningless for mesh forces).  h/n_sub come straight from the
        requested dt."""
        from ..core.state import DynParams

        z = self._as_dtype(0.0)
        self._dyn = DynParams(
            G=self._as_dtype(self.G), s0=self._as_dtype(self._s0),
            min_softening=self._as_dtype(self._min_softening),
            max_softening=self._as_dtype(self._max_softening),
            softening_scale=self._as_dtype(self._softening_scale),
            k_soft=self._as_dtype(self.cfg.k_soft), mu_soft=z,
            chi_eps=z, k_wall=self._as_dtype(self.cfg.k_wall),
            alpha_run=z, omega_spr0=z,
            h_sub_ref=self._as_dtype(self.cfg.initial_dt),
            n_sub=jnp.int32(1),
            frozen_dt=self._as_dtype(self.cfg.initial_dt))
        self.h_sub_ref = float(self.cfg.initial_dt)
        self.largen_info = None

    def _init_classical(self):
        """Integrator.__init__ (integrator.py:37-61) via the jitted
        construction path (identical to the batch engine)."""
        self._run_jit_init()
        self.h_sub_ref = float(self._dyn.h_sub_ref)

    def _classical_eps_target(self) -> float:
        """Integrator._eps_target fallback chain s0 -> softening_scale ->
        eps (integrator.py:165-189)."""
        if self._s0 > 0.0:
            return self._s0
        if self._softening_scale > 0.0:
            return self._softening_scale
        return float(self._state.eps)

    def _init_hamsoft(self):
        """HamiltonianSofteningIntegrator.__init__ cascade (HSI:47-141)
        via the jitted construction path (identical math to the batch
        engine; eager construction costs hundreds of per-op round
        trips on a remote-TPU link)."""
        cfg = self.cfg
        self._run_jit_init()
        self._min_softening = float(self._dyn.min_softening)
        if cfg.fixed_eps_star and cfg.eps_star_value is not None \
                and math.isfinite(cfg.eps_star_value):
            self.force_epsilon_override = float(cfg.eps_star_value)
        else:
            self.force_epsilon_override = None
        self.force_adaptive_timestep = bool(self._adaptive_timestep)
        self._frozen_n_sub = int(self._dyn.n_sub)
        self._frozen_dt = abs(float(cfg.initial_dt))
        self.h_sub_ref = float(self._dyn.h_sub_ref)

    def _run_jit_init(self):
        """One fused construction call: COM-removal already applied on
        host, so skip_cm_recenter=True; mode demotions were resolved
        into cfg before this point."""
        from ..parallel.batch_engine import init_system_jit

        st = self._state
        state, dyn = init_system_jit(
            st.mass, st.pos, st.vel, st.mask, self.cfg,
            self._as_dtype(self.G), self._as_dtype(self._s0),
            self._as_dtype(self._min_softening),
            self._as_dtype(self.cfg.initial_dt), skip_cm_recenter=True)
        # preserve evolving scalars already set on the state (restore
        # paths overlay them afterwards anyway)
        self._state = state
        self._dyn = dyn

    def _refreeze(self, dt: float):
        from ..parallel.batch_engine import refreeze_jit

        self._dyn = refreeze_jit(self._state, self._dyn, self.cfg,
                                 self._as_dtype(dt))
        self._frozen_n_sub = int(self._dyn.n_sub)
        self._frozen_dt = abs(float(dt))

    # ------------------------------------------------------------------
    # properties (simulation.py:164-274)
    # ------------------------------------------------------------------

    @property
    def integrator_mode(self) -> str:
        return str(self._integrator_mode)

    @property
    def n_bodies(self) -> int:
        return self._n_bodies

    @property
    def _mass(self) -> np.ndarray:
        return np.asarray(self._state.mass)[: self._n_bodies]

    @_mass.setter
    def _mass(self, value) -> None:
        self._set_array("mass", value)

    mass = _mass

    @property
    def _pos(self) -> np.ndarray:
        return np.asarray(self._state.pos)[: self._n_bodies]

    @_pos.setter
    def _pos(self, value) -> None:
        self._set_array("pos", value)

    @property
    def pos(self) -> np.ndarray:
        return self._pos

    @pos.setter
    def pos(self, value) -> None:
        self._set_array("pos", value)

    @property
    def _vel(self) -> np.ndarray:
        return np.asarray(self._state.vel)[: self._n_bodies]

    @_vel.setter
    def _vel(self, value) -> None:
        self._set_array("vel", value)

    @property
    def vel(self) -> np.ndarray:
        return self._vel

    @vel.setter
    def vel(self, value) -> None:
        self._set_array("vel", value)

    def _set_array(self, name, value):
        cur = getattr(self._state, name)
        arr = jnp.asarray(np.asarray(value, dtype=np.float64), cur.dtype)
        if arr.shape != cur[: self._n_bodies].shape:
            print(f"[error] shape mismatch setting {name}; ignored")
            return
        full = cur.at[: self._n_bodies].set(arr)
        self._state = self._state.replace(**{name: full})

    @property
    def _acc(self) -> np.ndarray:
        return self.accelerations()

    @property
    def acc(self) -> np.ndarray:
        return self.accelerations()

    @property
    def _epsilon(self) -> float:
        return float(self._state.eps)

    @_epsilon.setter
    def _epsilon(self, v: float) -> None:
        v = self._as_dtype(float(v))
        self._state = self._state.replace(eps=v, s=v, step_s2=v * v)

    @property
    def _pi(self) -> float:
        return float(self._state.pi)

    @_pi.setter
    def _pi(self, v: float) -> None:
        self._state = self._state.replace(pi=self._as_dtype(float(v)))

    @property
    def soft(self) -> float:
        return float(self._state.s)

    @property
    def softening(self) -> float:
        return float(self._state.s)

    @property
    def s(self) -> float:
        return float(self._state.s)

    @property
    def max_softening(self) -> float:
        return self._max_softening

    @property
    def adaptive_softening(self) -> bool:
        return self._adaptive_softening

    @adaptive_softening.setter
    def adaptive_softening(self, value: bool) -> None:
        new_val = bool(value)
        if new_val == self._adaptive_softening:
            return
        self._adaptive_softening = new_val
        self.cfg = self.cfg.replace(adaptive_softening=new_val)
        if not new_val:
            # update_base_softening (softening_manager.py:392-407)
            s0 = self._as_dtype(self._s0)
            self._state = self._state.replace(
                s=s0, step_s2=s0 * s0, softening_energy_delta=self._as_dtype(0.0),
                hist_count=self._as_dtype(1.0), hist_sum=s0, hist_sumsq=s0 * s0)
            self.softening_energy_delta = 0.0
            self._max_softening = 10.0 * self._s0

    @property
    def _adaptive(self) -> bool:
        return self._adaptive_timestep

    @property
    def bodies(self) -> List[BodyView]:
        return [BodyView(self, i) for i in range(self._n_bodies)]

    def set_adaptive(self, value: bool) -> None:
        self._adaptive_timestep = bool(value)

    # ------------------------------------------------------------------
    # stepping
    # ------------------------------------------------------------------

    def _n_sub_for(self, dt: float) -> int:
        """Substep count for a macro step of dt (integrator.py:91 for
        classical, HSI:781-888 frozen schedule for ham_soft)."""
        if self._integrator_mode == "ham_soft":
            return self._hamsoft_schedule(dt)
        h_sub = float(self._dyn.h_sub_ref)
        if not (math.isfinite(h_sub) and h_sub > 0.0):
            h_sub = abs(dt)
        return int(max(1, min(self.cfg.split_n_max,
                              math.ceil(abs(dt) / h_sub))))

    def step(self, dt: float) -> None:
        """simulation.py:667-676 -> integrator.step / HSI.step."""
        if dt == 0.0 or self._n_bodies == 0 or self._disabled:
            return
        if self._largen:
            self._largen_run(float(dt), 1)
            return
        dt = float(dt)
        self._top_dt = abs(dt)
        n_sub = self._n_sub_for(dt)

        record = self._adaptive_softening and self._integrator_mode != "ham_soft"
        if record:
            old_s = float(self._state.s)
            old_sed = self.softening_energy_delta
        self._state = _jit_macro_step(self._state, self._dyn, self.cfg,
                                      self._as_dtype(dt), n_sub)
        self._has_integrated = True
        self._last_dt = dt
        self.softening_energy_delta = float(self._state.softening_energy_delta)
        if record:
            new_s = float(self._state.s)
            dE = self.softening_energy_delta - old_sed
            if dE != 0.0 or new_s != old_s:
                # per-step ledger entry for the jitted adaptive-refresh
                # path (validate_energy's replay side; the OO
                # refresh_softening path appends its own entries)
                self._ledger_append(old_s, new_s, dE)

    def run(self, dt: float, n_steps: int) -> None:
        """TPU-native extension: n_steps macro steps fused in one jitted
        scan — the fast path for long rollouts (no per-step host sync)."""
        if dt == 0.0 or n_steps <= 0 or self._n_bodies == 0 or self._disabled:
            return
        if self._largen:
            self._largen_run(float(dt), int(n_steps))
            return
        dt = float(dt)
        self._top_dt = abs(dt)
        n_sub = self._n_sub_for(dt)
        record = self._adaptive_softening and self._integrator_mode != "ham_soft"
        if record:
            old_s = float(self._state.s)
            old_sed = self.softening_energy_delta
        self._state = _jit_integrate(self._state, self._dyn, self.cfg,
                                     self._as_dtype(dt), int(n_steps), n_sub)
        self._has_integrated = True
        self._last_dt = dt
        self.softening_energy_delta = float(self._state.softening_energy_delta)
        if record:
            # the fused scan exposes no per-step deltas; one aggregated
            # ledger entry keeps the replay decomposition exact
            self._ledger_append(old_s, float(self._state.s),
                                self.softening_energy_delta - old_sed)

    def _largen_run(self, dt: float, n_steps: int) -> None:
        """Fused large-N rollout (integrators/largen.py): the whole
        n_steps KDK-leapfrog under one jit with the P3M / tiled-direct
        force engine."""
        from ..integrators.largen import largen_rollout

        self._top_dt = abs(dt)
        q, v, info = largen_rollout(
            self._state.pos, self._state.vel, self._state.mass,
            self._as_dtype(self._s0), self._as_dtype(self.G),
            self._as_dtype(dt), n_steps, self.cfg)
        self._state = self._state.replace(pos=q, vel=v)
        self.largen_info = info
        self._has_integrated = True
        self._last_dt = dt

    def _hamsoft_schedule(self, dt: float) -> int:
        """strang_substeps (HSI:781-888): pi-budget mu raise each call,
        frozen n_sub reused while |dt| within 1% of the frozen dt."""
        mu_new = calib.calibrate_mu_from_pi_budget(
            self._dyn.mu_soft, self._dyn.k_soft, self._as_dtype(abs(dt)),
            self._as_dtype(self.cfg.theta_imp))
        self._dyn = self._dyn.replace(mu_soft=mu_new)
        if self.cfg._validate_S_only:
            return 1
        prev = getattr(self, "_frozen_dt", None)
        if prev is not None and prev > 0.0 and abs(abs(dt) - prev) / prev <= 0.01:
            return max(1, self._frozen_n_sub)
        self._refreeze(dt)
        return max(1, self._frozen_n_sub)

    # ------------------------------------------------------------------
    # kinematics / helpers
    # ------------------------------------------------------------------

    def accelerations(self) -> np.ndarray:
        if self._n_bodies < 2 or self.G == 0.0:
            return np.zeros((self._n_bodies, int(self.cfg.dim)))
        acc = _jit_accel(self._state, self._dyn, self.cfg)
        return np.asarray(acc)[: self._n_bodies]

    def _accel(self, *, pos=None, s2=None) -> np.ndarray:
        return self.accelerations()

    def _compute_accelerations(self, *, pos=None, s2=None) -> np.ndarray:
        return self.accelerations()

    def to_jacobi(self):
        jp, jv = _to_jac(jnp.asarray(self._mass), jnp.asarray(self._pos),
                         jnp.asarray(self._vel))
        return np.asarray(jp), np.asarray(jv)

    def from_jacobi(self, jac_pos, jac_vel):
        p, v = _from_jac(jnp.asarray(self._mass), jnp.asarray(jac_pos),
                         jnp.asarray(jac_vel))
        return np.asarray(p), np.asarray(v)

    def _get_min_separation(self) -> float:
        if self._n_bodies < 2:
            return float("inf")
        return float(min_separation(self._state.pos, self._state.mask))

    def get_current_softening_squared(self) -> float:
        return float(self._state.step_s2)

    def get_integrator_name(self) -> str:
        return self._integrator_mode

    def set_integrator_mode(self, mode: str) -> None:
        """simulation.py:281-303 — rebuilds the integrator stack."""
        if self.G == 0.0:
            mode = "verlet"
        if mode not in _ALLOWED_MODES:
            return
        self._integrator_mode = mode
        self.cfg = self.cfg.replace(integrator_mode=mode)
        if mode == "ham_soft":
            self._adaptive_softening = False
            self._init_hamsoft()
        else:
            self._init_classical()

    def set_fast_mode(self, *, float32: bool = True, barrier: bool = True):
        self.cfg = self.cfg.replace(fast_float32=bool(float32),
                                    disable_barrier=not barrier)

    def set_softening_bounds(self, eps_min: float, eps_max: float, *,
                             clamp_epsilon: bool = True,
                             reset_pi_on_clamp: bool = True) -> None:
        """simulation.py:679-728."""
        a = float(eps_min) if math.isfinite(eps_min) else 0.0
        b = float(eps_max) if math.isfinite(eps_max) else a
        if b < a:
            a, b = b, a
        a = max(a, 0.0)
        self._min_softening = a
        self._max_softening = b
        self._dyn = self._dyn.replace(min_softening=self._as_dtype(a),
                                      max_softening=self._as_dtype(b))
        if clamp_epsilon:
            eps_now = self._epsilon
            new_eps = min(max(eps_now, a), b)
            if new_eps != eps_now:
                self._epsilon = new_eps
                if reset_pi_on_clamp:
                    self._pi = -self._pi

    # ------------------------------------------------------------------
    # snapshot / restore (simulation.py:324-484)
    # ------------------------------------------------------------------

    def commit_state(self) -> None:
        # Reference re-applies the corrector on snapshot (simulation.py:319-322);
        # that double-kicks velocities and is widely considered part of
        # "reference behaviour" only via snapshot(); we keep state pure and
        # do NOT re-kick here — snapshot/restore is an exact round-trip.
        return

    def snapshot(self) -> dict:
        soft_state = {
            "s0": self._s0,
            "min_softening_init": self._min_softening_init,
            "s": float(self._state.s),
            "s2": float(self._state.s) ** 2,
            "step_s2": float(self._state.step_s2),
            "_step_s2": float(self._state.step_s2),
            "min_softening": self._min_softening,
            "_pending_energy_delta": 0.0,
            "_history": [self._s0],
            "_hist_moments": (float(self._state.hist_count),
                              float(self._state.hist_sum),
                              float(self._state.hist_sumsq)),
            "_step_finished": True,
        }
        int_state = {
            "dt_prev": None,
            "eps_prev": None,
            "_top_dt": self._top_dt,
            "_last_update_tick": 0,
            "_cached_min_sep": None,
            "k_soft": float(self._dyn.k_soft),
            "mu_soft": float(self._dyn.mu_soft),
        }
        sim_flags = {
            "_acc_cached": False,
            "_in_integration": False,
            "softening_energy_delta": self.softening_energy_delta,
            "_adaptive_timestep": self._adaptive_timestep,
            "_adaptive_softening": self._adaptive_softening,
            "_epsilon": self._epsilon,
            "_pi": self._pi,
            "_min_softening": self._min_softening,
            "_max_softening": self._max_softening,
        }
        snap = {
            "masses": self._mass.copy(),
            "positions": self._pos.copy(),
            "velocities": self._vel.copy(),
            "softening": soft_state["s"],
            "softening_s2": soft_state["s2"],
            "pending_energy": self.softening_energy_delta,
            "integrator_state": int_state,
            "softening_mgr_state": soft_state,
            "sim_state": sim_flags,
            "cfg": self.cfg.copy(),
            "has_integrated": self._has_integrated,
            "G": self.G,
            "sim": {
                "masses": self._mass.copy(),
                "positions": self._pos.copy(),
                "velocities": self._vel.copy(),
                "flags": sim_flags,
            },
            "integrator": int_state,
            "softening_mgr": soft_state,
        }
        return snap

    @classmethod
    def restore(cls, state: dict) -> "NBodySimulation":
        cfg_in = state.get("cfg", state.get("sim", {}).get("cfg"))
        cfg = cfg_in.copy() if cfg_in else SimConfig()
        sim_data = state.get("sim", state)
        soft_data = state.get("softening_mgr_state", state.get("softening_mgr", {}))
        sim_flags = state.get("sim_state", sim_data.get("flags", {}))

        s0_snap = soft_data.get("s0")
        if s0_snap is None:
            hist = soft_data.get("_history") or []
            if hist and np.isfinite(hist[0]):
                s0_snap = float(hist[0])
            else:
                s0_snap = float(state.get("softening", soft_data.get("s", 1e-3)))

        # reconstruct with the *construction-time* floor so the ham_soft
        # calibration cascade reproduces the original run exactly; the
        # evolved bounds are overlaid below
        min_snap = soft_data.get("min_softening_init")
        if min_snap is None:
            min_snap = 0.1 * s0_snap if s0_snap > 0 else 0.0

        sim = cls(
            config=cfg,
            masses=sim_data["masses"],
            positions=sim_data["positions"],
            velocities=sim_data["velocities"],
            G=float(state.get("G", 1.0)),
            softening=float(s0_snap),
            min_softening=float(min_snap),
            adaptive_timestep=bool(sim_flags.get("_adaptive_timestep", False)),
            adaptive_softening=bool(sim_flags.get("_adaptive_softening", False)),
            skip_init_corrector=True,
            skip_cm_recenter=True,
            integrator_mode=getattr(cfg, "integrator_mode", None),
        )

        # reapply evolving scalars
        eps_now = float(sim_flags.get("_epsilon", soft_data.get("s", s0_snap)))
        sim._epsilon = eps_now
        sim._pi = float(sim_flags.get("_pi", 0.0))
        s = float(soft_data.get("s", eps_now))
        step_s2 = float(soft_data.get("step_s2", s * s))
        sim._state = sim._state.replace(
            s=sim._as_dtype(s), step_s2=sim._as_dtype(step_s2))
        sed = float(sim_flags.get("softening_energy_delta", 0.0))
        sim.softening_energy_delta = sed
        sim._state = sim._state.replace(
            softening_energy_delta=sim._as_dtype(sed))
        hm = soft_data.get("_hist_moments")
        if hm:
            sim._state = sim._state.replace(
                hist_count=sim._as_dtype(hm[0]), hist_sum=sim._as_dtype(hm[1]),
                hist_sumsq=sim._as_dtype(hm[2]))
        ints = state.get("integrator_state", state.get("integrator", {}))
        if ints:
            if ints.get("k_soft") is not None:
                sim._dyn = sim._dyn.replace(k_soft=sim._as_dtype(ints["k_soft"]))
            if ints.get("mu_soft") is not None:
                sim._dyn = sim._dyn.replace(mu_soft=sim._as_dtype(ints["mu_soft"]))
        # overlay evolved softening bounds (e.g. set_softening_bounds)
        ms = sim_flags.get("_min_softening")
        if ms is not None:
            sim._min_softening = float(ms)
            sim._dyn = sim._dyn.replace(min_softening=sim._as_dtype(ms))
        mx = sim_flags.get("_max_softening")
        if mx is not None:
            sim._max_softening = float(mx)
            sim._dyn = sim._dyn.replace(max_softening=sim._as_dtype(mx))
        else:
            sim._max_softening = 10.0 * float(sim._s0)
        sim._has_integrated = bool(state.get("has_integrated", False))
        return sim

    def copy(self, *, deep: bool = True) -> "NBodySimulation":
        if not deep:
            return self
        return NBodySimulation.restore(self.snapshot())

    def __copy__(self):
        return self.copy(deep=True)

    def __deepcopy__(self, memo=None):
        return self.copy(deep=True)

    #: bounded per-refresh delta ring depth (validate_energy replay)
    _LEDGER_DEPTH = 512

    def _ledger_append(self, e_old: float, e_new: float, dE: float) -> None:
        """Record one softening-refresh energy delta in the bounded
        replay ring (the reference's ``_history`` deque analogue;
        entries evicted past the depth fold their delta into ``base``
        so the replayed total stays exact)."""
        led = getattr(self, "_eps_ledger", None)
        if led is None:
            # anchored to the PRE-entry accumulated delta, so a restored
            # snapshot (which carries the delta but not the ring) stays
            # consistent: base + sum(ring) == ledger from here on
            led = {"base": float(self.softening_energy_delta) - float(dE),
                   "entries": []}
            self._eps_ledger = led
        led["entries"].append((float(e_old), float(e_new), float(dE)))
        while len(led["entries"]) > self._LEDGER_DEPTH:
            led["base"] += led["entries"].pop(0)[2]

    def debug_adaptive_softening(self) -> dict:
        return {
            "current_s2": float(self._state.step_s2),
            "min_separation": self._get_min_separation(),
            "adaptive": bool(self._adaptive_softening),
        }

    # compatibility shims -------------------------------------------------
    @property
    def manager(self):
        return _ManagerShim(self)

    @property
    def _integrator(self):
        return _IntegratorShim(self)


class _ManagerShim:
    """Read-mostly stand-in for SofteningManager attribute access
    (softening_manager.py:38-120) used by diagnostics and analyzers."""

    def __init__(self, sim: NBodySimulation):
        self._sim = sim

    @property
    def s0(self) -> float:
        return self._sim._s0

    @property
    def s(self) -> float:
        return float(self._sim._state.s)

    @s.setter
    def s(self, v: float) -> None:
        st = self._sim._state
        self._sim._state = st.replace(s=self._sim._as_dtype(float(v)))

    @property
    def s2(self) -> float:
        return float(self._sim._state.s) ** 2

    @property
    def softening(self) -> float:
        return self.s

    @property
    def step_s2(self) -> float:
        return float(self._sim._state.step_s2)

    @property
    def pending_energy_delta(self) -> float:
        return 0.0

    def update_continuous(self, eps_new: float) -> None:
        sim = self._sim
        v = sim._as_dtype(float(eps_new))
        sim._state = sim._state.replace(s=v, step_s2=v * v)

    def begin_step(self) -> None:
        sim = self._sim
        sim._state = step_mod.begin_step(sim._state, sim.cfg)

    def finish_step(self) -> None:
        sim = self._sim
        sim._state = step_mod.finish_step(sim._state, sim.cfg)

    def debug_info(self) -> dict:
        st = self._sim._state
        cnt = max(float(st.hist_count), 1.0)
        mean = float(st.hist_sum) / cnt
        var = max(float(st.hist_sumsq) / cnt - mean * mean, 0.0)
        return dict(
            softening=self.s,
            step_s2=self.step_s2,
            history=self.history,
            history_mean=mean,
            history_std=var ** 0.5,
            history_count=cnt,
            pending_energy_delta=0.0,
        )

    @staticmethod
    def _limited_softening(old_eps: float, proposed_eps: float, *,
                           factor: float = 2.0) -> float:
        """softening_manager.py:100-103."""
        return max(old_eps / factor, min(old_eps * factor, proposed_eps))

    def softening_from_min_sep(self, min_sep: float) -> float:
        """softening_manager.py:541-547."""
        if not math.isfinite(min_sep) or min_sep <= 0.0:
            return self.s
        proposed = max(self._sim._min_softening,
                       min_sep / self._sim._softening_scale)
        proposed = min(proposed, 10.0 * self.s0)
        return self._limited_softening(self.s, proposed)

    def refresh_softening(self, eps_new: float, sim=None) -> None:
        """softening_manager.py:298-336 — softening change with energy
        bookkeeping (classical modes)."""
        from ..integrators.classical import _energy_correction

        s = self._sim
        if s._integrator_mode == "ham_soft":
            self.update_continuous(eps_new)
            return
        e_old = float(s._state.s)
        dE = float(_energy_correction(s._state, s._dyn, s.cfg,
                                      s._state.s, s._as_dtype(eps_new)))
        if math.isfinite(dE):
            s.softening_energy_delta += dE
            s._state = s._state.replace(
                softening_energy_delta=s._as_dtype(s.softening_energy_delta))
            s._ledger_append(e_old, float(eps_new), dE)
        self.update_continuous(eps_new)

    def validate_energy(self) -> None:
        """Ledger self-check (softening_manager.py:376-389): replay the
        recorded per-refresh deltas (bounded ring + evicted-entry base,
        accumulated in the same order as the incremental ledger) and
        compare against the accumulated ``softening_energy_delta`` —
        a corrupted ledger, or a refresh path that bypassed the
        bookkeeping, trips the warning (asserted by the corruption test
        in tests/test_aux_subsystems.py).  Tolerance: the reference's
        1e-10 in float64; the jitted f32 fast path accumulates the
        state-side ledger in float32, so its replay agrees only to f32
        rounding (~1e-5 relative over hundreds of refreshes)."""
        s = self._sim
        ref = s.softening_energy_delta
        if not math.isfinite(ref):
            print(f"[warning] energy mismatch: softening ledger is {ref}")
            return
        led = getattr(s, "_eps_ledger", None)
        if led is None or len(led["entries"]) < 2:
            return  # reference parity: needs >= 2 history points
        total = led["base"]
        for _e_old, _e_new, dE in led["entries"]:
            total += dE
        err = abs(total - ref) if ref == 0.0 else abs((total - ref) / ref)
        tol = 1e-5 if s.cfg.fast_float32 else 1e-10
        if err > tol:
            print(f"[warning] energy mismatch: {err:.3g}")

    def update_base_softening(self, adaptive: bool) -> None:
        """softening_manager.py:392-407."""
        if adaptive:
            return
        s = self._sim
        s0 = s._as_dtype(s._s0)
        s._state = s._state.replace(
            s=s0, step_s2=s0 * s0,
            softening_energy_delta=s._as_dtype(0.0),
            hist_count=s._as_dtype(1.0), hist_sum=s0, hist_sumsq=s0 * s0)
        s.softening_energy_delta = 0.0
        s._max_softening = 10.0 * s._s0
        s._eps_ledger = {"base": 0.0, "entries": []}

    @property
    def history(self):
        """Recent eps values reconstructed from the refresh ring (the
        reference's bounded ``_history`` deque, softening_manager.py)."""
        led = getattr(self._sim, "_eps_ledger", None)
        if not led or not led["entries"]:
            return []
        return [led["entries"][0][0]] + [e[1] for e in led["entries"]]


class _IntegratorShim:
    """Attribute-level stand-in for the reference integrator object."""

    def __init__(self, sim: NBodySimulation, **_kw):
        self._sim = sim

    @property
    def sim(self):
        return self._sim

    def step(self, dt: float) -> None:
        self._sim.step(dt)

    @property
    def k_soft(self) -> float:
        return float(self._sim._dyn.k_soft)

    @property
    def mu_soft(self) -> float:
        return float(self._sim._dyn.mu_soft)

    @property
    def chi_eps(self) -> float:
        return float(self._sim._dyn.chi_eps)

    @property
    def k_wall(self) -> float:
        return float(self._sim._dyn.k_wall)

    @property
    def h_sub_ref(self) -> float:
        return float(self._sim._dyn.h_sub_ref)

    @property
    def split_n_max(self) -> int:
        return int(self._sim.cfg.split_n_max)

    @property
    def barrier_policy(self) -> str:
        return "soft" if hs.policy_is_soft(self._sim.cfg) else "reflection"

    def _barrier_n(self) -> int:
        return int(self._sim.cfg.barrier_exponent)

    def _eps_target(self, q=None, **kw) -> float:
        sim = self._sim
        if sim._integrator_mode == "ham_soft":
            st = sim._state
            if q is not None:
                qq = jnp.asarray(np.asarray(q, dtype=np.float64), st.pos.dtype)
                full = st.pos.at[: qq.shape[0]].set(qq)
                st = st.replace(pos=full)
            return float(hs.eps_target(st, sim._dyn, sim.cfg))
        return sim._classical_eps_target()

    def eps_star_and_grad(self, q=None):
        sim = self._sim
        st = sim._state
        if q is not None:
            qq = jnp.asarray(np.asarray(q, dtype=np.float64), st.pos.dtype)
            full = st.pos.at[: qq.shape[0]].set(qq)
            st = st.replace(pos=full)
        es, g = hs.eps_star_and_grad(st, sim._dyn, sim.cfg)
        return float(es), np.asarray(g)[: sim._n_bodies]

    def canonical_eom(self):
        sim = self._sim
        qd, pd, ed, pid = hs.canonical_eom(sim._state, sim._dyn, sim.cfg)
        n = sim._n_bodies
        return (np.asarray(qd)[:n], np.asarray(pd)[:n], float(ed), float(pid))

    def compute_extended_hamiltonian(self) -> float:
        from ..diagnostics.energy import extended_hamiltonian_of_sim

        return extended_hamiltonian_of_sim(self._sim)

    # --- probe accessors (SURVEY.md section 5; HSI:300, :1242, :340) ---
    def report_epsilon_policies(self) -> dict:
        eps = self._sim._epsilon
        return {"eom_eps_eff": eps, "vkick_eps_eff": eps}

    def last_eps_star_probe(self) -> dict:
        from .. import diagnostics as _d
        import numpy as np

        es, grad = self.eps_star_and_grad()
        rn = np.sqrt((grad ** 2).sum(axis=1))
        return {"eps_star": float(es),
                "grad_norm_max": float(rn.max()) if rn.size else 0.0}

    def _last_vkick_probe(self) -> dict:
        from ..diagnostics.probes import vkick_probe

        sim = self._sim
        d = vkick_probe(sim._state, sim._dyn, sim.cfg,
                        sim._as_dtype(sim._top_dt or sim.cfg.initial_dt))
        out = {k: float(v) for k, v in d.items()}
        out["eps_used"] = out["epsilon_used"]
        return out

    def last_spring_probe(self) -> dict:
        from ..diagnostics.probes import spring_probe

        sim = self._sim
        d = spring_probe(sim._state, sim._dyn, sim.cfg,
                         sim._as_dtype(sim._top_dt or sim.cfg.initial_dt))
        import numpy as np

        return {k: (np.asarray(v) if getattr(v, "ndim", 0) else float(v))
                for k, v in d.items()}

    def last_strang_schedule_info(self) -> dict:
        from ..diagnostics.probes import schedule_probe

        sim = self._sim
        d = schedule_probe(sim._state, sim._dyn, sim.cfg,
                           sim._as_dtype(sim._top_dt or sim.cfg.initial_dt))
        out = {k: float(v) for k, v in d.items()}
        out["n_sub"] = int(out["n_sub"])
        out["barrier_policy"] = self.barrier_policy
        return out


class Integrator(_IntegratorShim):
    """Name-parity class (integrator.py:31): the integrator state lives
    in the sim's DynParams; this view exposes the reference attribute
    surface over it."""

    def __init__(self, sim: NBodySimulation, *, split_n_max: int = 10000):
        super().__init__(sim)


class HamiltonianSofteningIntegrator(_IntegratorShim):
    """Name-parity class (hamiltonian_softening_integrator.py:40)."""

    def __init__(self, sim: NBodySimulation, *, split_n_max: int = 10000,
                 force_adaptive_timestep: bool = False):
        super().__init__(sim)


class SofteningManager(_ManagerShim):
    """Name-parity class (softening_manager.py:37); softening state is
    carried in the SimState PyTree."""

    def __init__(self, sim: NBodySimulation, softening: float | None = None,
                 min_softening: float | None = None, history: int = 1024,
                 tol: float = 1e-12):
        super().__init__(sim)
