"""utils/aot_cache: the jax.export-backed AOT program cache.

The cache lets a fresh process skip host-side tracing of the
per-bucket analysis engine programs (utils/aot_cache.py docstring for
the measurements).  Contract under test:

* miss path (export + serialize) and hit path (deserialize) both run
  the exported module and agree bitwise with the direct jitted call;
* artifacts land in NB_AOT_CACHE_DIR and reload after the in-process
  memo is cleared (the fresh-process simulation);
* corrupt artifacts are discarded and rebuilt, not crashed on;
* NB_AOT_CACHE=0 bypasses everything.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nbodysimproject_tpu.core.state import SimState
from nbodysimproject_tpu.utils import aot_cache


@pytest.fixture()
def cache_env(tmp_path, monkeypatch):
    monkeypatch.setenv("NB_AOT_CACHE", "1")
    monkeypatch.setenv("NB_AOT_CACHE_DIR", str(tmp_path))
    saved = dict(aot_cache._mem)
    aot_cache._mem.clear()
    yield tmp_path
    aot_cache._mem.clear()
    aot_cache._mem.update(saved)


def _state(b=4, n=3):
    key = jax.random.PRNGKey(0)
    pos = jax.random.normal(key, (b, n, 2), jnp.float32)
    z = jnp.zeros((b,), jnp.float32)
    return SimState(
        mass=jnp.ones((b, n), jnp.float32), pos=pos,
        vel=0.1 * pos, mask=jnp.ones((b, n), bool),
        eps=jnp.full((b,), 0.05, jnp.float32),
        pi=z, s=jnp.full((b,), 0.05, jnp.float32),
        step_s2=jnp.full((b,), 0.0025, jnp.float32),
        softening_energy_delta=z, hist_count=z, hist_sum=z, hist_sumsq=z)


from functools import partial


@partial(jax.jit, static_argnames=("k",))
def _fn(st, w, k):
    return {"q": jnp.sum(st.pos * w, axis=(1, 2)) * k,
            "p": jnp.sum(st.vel, axis=(1, 2))}


def test_roundtrip_and_fresh_process_reload(cache_env):
    st = _state()
    w = jnp.asarray(2.0, jnp.float32)
    direct = _fn(st, w, k=3)
    got = aot_cache.aot_call("t1", _fn, (st,), dict(w=w), dict(k=3))
    assert set(got) == {"q", "p"}
    np.testing.assert_array_equal(np.asarray(got["q"]),
                                  np.asarray(direct["q"]))
    arts = [f for f in os.listdir(cache_env) if f.endswith(".jaxexp")]
    assert len(arts) == 1

    # simulate a fresh process: drop the in-process memo, call again —
    # this exercises deserialize + compile of the stored artifact
    aot_cache._mem.clear()
    got2 = aot_cache.aot_call("t1", _fn, (st,), dict(w=w), dict(k=3))
    np.testing.assert_array_equal(np.asarray(got2["q"]),
                                  np.asarray(direct["q"]))
    np.testing.assert_array_equal(np.asarray(got2["p"]),
                                  np.asarray(direct["p"]))


def test_static_args_key_separation(cache_env):
    st = _state()
    w = jnp.asarray(1.0, jnp.float32)
    a = aot_cache.aot_call("t2", _fn, (st,), dict(w=w), dict(k=2))
    b = aot_cache.aot_call("t2", _fn, (st,), dict(w=w), dict(k=5))
    assert not np.allclose(np.asarray(a["q"]), np.asarray(b["q"]))
    arts = [f for f in os.listdir(cache_env) if f.endswith(".jaxexp")]
    assert len(arts) == 2


def test_out_select_drops_unexportable_output(cache_env):
    @jax.jit
    def fn2(st):
        return {"e": jnp.sum(st.pos)}, st  # SimState not serializable

    st = _state()
    got = aot_cache.aot_call("t3", fn2, (st,), {}, {},
                             out_select=lambda o: o[0])
    assert float(got["e"]) == pytest.approx(float(jnp.sum(st.pos)))
    aot_cache._mem.clear()
    got2 = aot_cache.aot_call("t3", fn2, (st,), {}, {},
                              out_select=lambda o: o[0])
    assert float(got2["e"]) == float(got["e"])


def test_corrupt_artifact_rebuilds(cache_env):
    st = _state()
    w = jnp.asarray(1.5, jnp.float32)
    direct = _fn(st, w, k=7)
    aot_cache.aot_call("t4", _fn, (st,), dict(w=w), dict(k=7))
    (art,) = [f for f in os.listdir(cache_env) if f.endswith(".jaxexp")]
    with open(os.path.join(cache_env, art), "wb") as f:
        f.write(b"not an exported module")
    aot_cache._mem.clear()
    got = aot_cache.aot_call("t4", _fn, (st,), dict(w=w), dict(k=7))
    np.testing.assert_array_equal(np.asarray(got["q"]),
                                  np.asarray(direct["q"]))


def test_disabled_bypasses(cache_env, monkeypatch):
    monkeypatch.setenv("NB_AOT_CACHE", "0")
    st = _state()
    w = jnp.asarray(1.0, jnp.float32)
    got = aot_cache.aot_call("t5", _fn, (st,), dict(w=w), dict(k=2))
    assert not os.listdir(cache_env)
    np.testing.assert_array_equal(np.asarray(got["q"]),
                                  np.asarray(_fn(st, w, k=2)["q"]))


class TestDependencyScopedKeys:
    """Round-5 (VERDICT round-4 item 8): cache keys are scoped to the
    traced function's transitive import closure, so an ml/- or
    generators/-only edit no longer invalidates the analysis engine
    ladder, while any edit in the closure (kernels included) still
    does."""

    def _tree(self, tmp_path, files):
        root = tmp_path / "pkg"
        for rel, src in files.items():
            p = root / rel
            p.parent.mkdir(parents=True, exist_ok=True)
            p.write_text(src)
        return str(root)

    _FILES = {
        "__init__.py": "from .analysis import run\nfrom .ml import train\n",
        "analysis/__init__.py": "from .engine import run\n",
        "analysis/engine.py": (
            "from ..ops.kernel import f\n"
            "def run():\n"
            "    from ..ops import helper  # lazy function-level import\n"
            "    import importlib\n"
            "    importlib.import_module('nbodysimproject_tpu.ops.lazy')\n"
            "    return f()\n"),
        "ops/__init__.py": "",
        "ops/kernel.py": "def f():\n    return 1\n",
        "ops/helper.py": "H = 2\n",
        "ops/lazy.py": "L = 3\n",
        "ml/__init__.py": "from .train import train\n",
        "ml/train.py": "def train():\n    return 0\n",
    }

    def _fp(self, root):
        from nbodysimproject_tpu.utils.aot_cache import (
            _dependency_fingerprint)

        return _dependency_fingerprint("nbodysimproject_tpu.analysis.engine",
                                       root)

    def test_non_dependency_edit_keeps_key(self, tmp_path):
        root = self._tree(tmp_path, self._FILES)
        fp0 = self._fp(root)
        assert fp0 is not None
        files = dict(self._FILES)
        files["ml/train.py"] = "def train():\n    return 42  # edited\n"
        root2 = self._tree(tmp_path / "b", files)
        assert self._fp(root2) == fp0

    def test_dependency_edit_changes_key(self, tmp_path):
        fp0 = self._fp(self._tree(tmp_path, self._FILES))
        for rel in ("ops/kernel.py", "analysis/engine.py", "__init__.py"):
            files = dict(self._FILES)
            files[rel] = self._FILES[rel] + "# edited\n"
            root2 = self._tree(tmp_path / rel.replace("/", "_"), files)
            assert self._fp(root2) != fp0, f"{rel} edit must invalidate"

    def test_lazy_and_string_imports_in_closure(self, tmp_path):
        """Function-level imports and importlib string literals are
        dependency edges too (analysis/fused.py uses both forms)."""
        fp0 = self._fp(self._tree(tmp_path, self._FILES))
        for rel in ("ops/helper.py", "ops/lazy.py"):
            files = dict(self._FILES)
            files[rel] = self._FILES[rel] + "# edited\n"
            root2 = self._tree(tmp_path / rel.replace("/", "_"), files)
            assert self._fp(root2) != fp0, f"{rel} edit must invalidate"

    def test_real_analysis_closure_scoped(self):
        """The production analysis program's closure contains the
        compute path (kernels, integrators, diagnostics) and not the
        ml/ or generators/ subpackages — the concrete promise that an
        ml/calibrate.py edit leaves the engine ladder warm."""
        import os as _os

        from nbodysimproject_tpu.utils import aot_cache as A

        pkg_root = _os.path.dirname(_os.path.dirname(
            _os.path.abspath(A.__file__)))
        seen, todo = {}, ["nbodysimproject_tpu.analysis.batch"]
        while todo:
            name = todo.pop()
            if name in seen:
                continue
            path = A._module_path(name, pkg_root)
            seen[name] = path
            if path is None:
                continue
            todo.extend(A._module_imports(name, path, pkg_root))
        rel = sorted(_os.path.relpath(p, pkg_root)
                     for p in seen.values() if p)
        for need in ("ops/pallas_hamsoft.py", "analysis/fused.py",
                     "diagnostics/megno.py", "integrators/hamsoft.py",
                     "integrators/kepler_split.py"):
            assert any(need in r for r in rel), (need, rel)
        bad = [r for r in rel if r.startswith(("ml/", "generators/"))]
        assert not bad, bad

    def test_unresolvable_root_falls_back(self, cache_env):
        """A traced function outside the package (this test module)
        still caches — under the conservative whole-package key."""
        st = _state()
        w = jnp.asarray(1.0, jnp.float32)
        got = aot_cache.aot_call("t6", _fn, (st,), dict(w=w), dict(k=4))
        np.testing.assert_array_equal(
            np.asarray(got["q"]), np.asarray(_fn(st, w, k=4)["q"]))
        arts = [f for f in os.listdir(cache_env) if f.endswith(".jaxexp")]
        assert len(arts) == 1
