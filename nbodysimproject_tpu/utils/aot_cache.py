"""Disk-backed AOT program cache built on ``jax.export``.

The batched-analysis ladder compiles one large program per (n_sub
bucket, engine, mode) and a fresh process repays ~50-75 s *per
program* before the first result — and measurement shows most of that
is host-side **tracing/lowering**, which the persistent XLA
compilation cache (``__init__._enable_compile_cache``) cannot skip:
with the compile cache warm, the 16k ladder still costs ~545 s vs
~618 s cold (tracing-bound; the XLA-compile share is the minority).

``jax.export`` closes the gap: the traced+lowered StableHLO module is
serialized to disk once, and later processes deserialize it in
milliseconds and hand it straight to XLA — whose compile then hits
the persistent compilation cache byte-exactly, because every process
compiles the *same* artifact bytes.  Measured on the fused ham_soft
multistep kernel: 15 s trace+compile fresh -> 2.2 s (deserialize +
cached compile + run).

Correctness:

* The cache key includes a content hash of every ``.py`` file in the
  package, so ANY source edit invalidates all artifacts (stale
  programs can never replay old numerics silently).
* Keys also carry jax/jaxlib versions, the backend platform + device
  kind, the static-argument repr, and the aval signature (treedef +
  shape/dtype of every leaf).
* Miss and hit paths both execute the exported module (the miss path
  compiles the module it just exported, not the original trace), so
  numerics are identical whichever path a process takes.

Opt out with ``NB_AOT_CACHE=0``; relocate with ``NB_AOT_CACHE_DIR``
(default: ``.jax_export_cache/`` beside the package, mirroring the
compile cache).
"""

from __future__ import annotations

import hashlib
import os

_mem: dict = {}
_pkg_fp: str | None = None


def enabled() -> bool:
    return os.environ.get("NB_AOT_CACHE", "1") != "0"


def cache_dir() -> str:
    path = os.environ.get("NB_AOT_CACHE_DIR")
    if not path:
        parent = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        path = (os.path.join(parent, ".jax_export_cache")
                if os.access(parent, os.W_OK)
                else os.path.expanduser("~/.cache/nbodysimproject_tpu/aot"))
    return path


def _package_fingerprint() -> str:
    """Content hash of the package's Python source — any edit
    invalidates every artifact (safe-direction invalidation)."""
    global _pkg_fp
    if _pkg_fp is None:
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        h = hashlib.sha256()
        for dirpath, dirnames, filenames in sorted(os.walk(root)):
            dirnames.sort()
            for fn in sorted(filenames):
                if fn.endswith(".py"):
                    p = os.path.join(dirpath, fn)
                    h.update(p.encode())
                    with open(p, "rb") as f:
                        h.update(f.read())
        _pkg_fp = h.hexdigest()[:16]
    return _pkg_fp


def _leaf_sig(leaves) -> str:
    import jax

    parts = []
    for x in leaves:
        a = jax.api_util.shaped_abstractify(x)
        parts.append(f"{a.shape}{a.dtype}")
    return "|".join(parts)


def _key(tag: str, statics: dict, treedef, leaves) -> str:
    import jax

    dev = jax.devices()[0]
    raw = "\x1e".join([
        tag, jax.__version__,
        dev.platform, getattr(dev, "device_kind", "?"),
        _package_fingerprint(),
        repr(sorted(statics.items())),
        str(treedef), _leaf_sig(leaves),
    ])
    return f"{tag}-{hashlib.sha256(raw.encode()).hexdigest()[:20]}"


def aot_call(tag: str, jit_fn, dyn_args: tuple, dyn_kwargs: dict,
             statics: dict, out_select=None):
    """``jit_fn(*dyn_args, **dyn_kwargs, **statics)`` through the
    exported-program cache.

    ``statics`` are baked into the exported module (pass them by
    keyword name); dynamic arguments may contain custom pytrees
    (SimState/DynParams) — they are flattened to leaves before export
    because ``jax.export`` can only serialize registered-by-name tree
    types, and re-flattened on every call (cheap).  ``out_select``
    maps the raw output to the exportable subset the caller wants
    (e.g. dropping a SimState output); the returned value is whatever
    ``out_select`` keeps.  Miss and hit paths both run the exported
    module, so numerics cannot depend on which path a process took.
    Falls back to a direct call on export failure (and remembers the
    bypass for the process).
    """
    import jax

    if out_select is None:
        out_select = lambda o: o  # noqa: E731
    if not enabled():
        return out_select(jit_fn(*dyn_args, **dyn_kwargs, **statics))

    leaves, treedef = jax.tree_util.tree_flatten((dyn_args, dyn_kwargs))
    key = _key(tag, statics, treedef, leaves)
    fn = _mem.get(key)
    if fn is None:
        from jax import export as jexport

        path = os.path.join(cache_dir(), key + ".jaxexp")
        exp = None
        if os.path.exists(path):
            try:
                with open(path, "rb") as f:
                    exp = jexport.deserialize(f.read())
            except Exception:  # corrupt/stale artifact: rebuild
                exp = None
                try:
                    os.remove(path)
                except OSError:
                    pass
        if exp is None:
            @jax.jit
            def _flat(*ls):
                a, k = jax.tree_util.tree_unflatten(treedef, ls)
                return out_select(jit_fn(*a, **k, **statics))

            try:
                exp = jexport.export(_flat)(*leaves)
                blob = exp.serialize()
            except Exception:
                # unexportable program: bypass the cache this process
                fn = _Direct(jit_fn, statics, out_select)
                _mem[key] = fn
                return fn(*dyn_args, **dyn_kwargs)
            try:
                os.makedirs(cache_dir(), exist_ok=True)
                tmp = f"{path}.tmp.{os.getpid()}"
                with open(tmp, "wb") as f:
                    f.write(blob)
                os.replace(tmp, path)
            except OSError:
                pass  # unwritable cache: still use the in-memory export
        fn = jax.jit(exp.call)
        _mem[key] = fn
    if isinstance(fn, _Direct):
        return fn(*dyn_args, **dyn_kwargs)
    return fn(*leaves)


class _Direct:
    """Fallback wrapper: call the original jitted fn with its statics."""

    def __init__(self, jit_fn, statics, out_select):
        self._fn = jit_fn
        self._statics = statics
        self._sel = out_select

    def __call__(self, *args, **kwargs):
        return self._sel(self._fn(*args, **kwargs, **self._statics))
