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

* The cache key includes a content hash of the traced function's
  transitive package-internal import closure (static AST walk from
  ``jit_fn.__module__``; ``_dependency_fingerprint``), so any edit to
  code the program could trace invalidates its artifacts — while an
  edit to an unrelated subpackage (ml/, generators/) leaves the
  analysis engine ladder warm (round-4's any-edit invalidation cost a
  ~9 min cold re-trace per iteration).  Unresolvable roots fall back
  to a hash of every ``.py`` file in the package (safe direction);
  ``NB_AOT_KEY=package`` forces that conservative mode.
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
_dep_fp: dict = {}


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


_PKG = "nbodysimproject_tpu"


def _module_path(name: str, root: str) -> str | None:
    """``nbodysimproject_tpu.a.b`` -> the source file that defines it
    (``a/b.py`` or ``a/b/__init__.py``), or None if neither exists."""
    rel = name.split(".")[1:]
    base = os.path.join(root, *rel) if rel else root
    if os.path.isfile(base + ".py"):
        return base + ".py"
    init = os.path.join(base, "__init__.py")
    return init if os.path.isfile(init) else None


def _module_imports(name: str, path: str, root: str) -> set:
    """Package-internal modules imported by one source file whose
    IMPORTS must be traversed in turn: every ``import`` /
    ``from ... import`` statement (function-level lazy imports
    included — the AST walk sees them all) plus any
    ``nbodysimproject_tpu.x.y`` dotted string literal (the
    ``importlib.import_module`` pattern, analysis/fused.py).

    ``from X import name`` resolution: when ``X.name`` is itself a
    module, the edge is to ``X.name`` (X's __init__ still joins the
    hash as an implied parent, but its re-export imports are not
    followed — that is what keeps ``from .. import diagnostics`` from
    pulling the top-level __init__'s whole flat API, ml/ and
    generators/ included, into every closure).  When ``name`` is a
    plain attribute, it may be re-exported from a submodule, so ``X``
    itself is traversed."""
    import ast
    import re

    with open(path, "rb") as f:
        src = f.read()
    tree = ast.parse(src)
    pkg_parts = name.split(".")
    # the package a relative import resolves against: the module's
    # parent for plain modules, the module itself for __init__.py
    is_pkg = path.endswith("__init__.py")
    parent = pkg_parts if is_pkg else pkg_parts[:-1]
    out = set()

    def add(mod: str, names=None):
        if not (mod == _PKG or mod.startswith(_PKG + ".")):
            return
        if names is None:  # `import X` / dotted literal: traverse X
            out.add(mod)
            return
        for n in names:
            sub = f"{mod}.{n}"
            if _module_path(sub, root) is not None:
                out.add(sub)
            else:
                out.add(mod)

    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            for alias in node.names:
                add(alias.name)
        elif isinstance(node, ast.ImportFrom):
            if node.level == 0:
                add(node.module or "",
                    [a.name for a in node.names])
            else:
                base = parent[:len(parent) - (node.level - 1)]
                mod = ".".join(base + ([node.module]
                                       if node.module else []))
                add(mod, [a.name for a in node.names])
    for m in re.findall(rb"nbodysimproject_tpu(?:\.\w+)+",
                        src):
        out.add(m.decode())
    return out


def _dependency_fingerprint(root_module: str,
                            root: str | None = None) -> str | None:
    """Content hash of the transitive package-internal import closure
    of ``root_module`` (static AST walk, no execution).  Scopes cache
    invalidation to the code a program can actually trace: an ml/- or
    tools/-only edit no longer invalidates the analysis engine ladder
    (round-4 cost: any source edit -> ~9 min cold re-trace), while an
    edit anywhere in the closure — kernels included — still does.
    Returns None when the root cannot be resolved (caller falls back
    to the whole-package fingerprint: safe-direction)."""
    memo = root is None  # explicit root = test mode, no memoisation
    if memo:
        fp = _dep_fp.get(root_module)
        if fp is not None:
            return fp or None
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    try:
        if _module_path(root_module, root) is None:
            if memo:
                _dep_fp[root_module] = ""
            return None
        # BFS over EXPLICIT import edges only.  Parent-package
        # __init__ files also run at import time (and the top-level
        # one flips global config like x64), so their CONTENT joins
        # the hash — but their imports are not traversed: the
        # top-level __init__ re-exports the whole API surface, and
        # traversing it would pull ml/ and generators/ into every
        # closure, undoing the scoping this exists for.  A traced
        # program only reaches other code through its own modules'
        # explicit imports (all captured by the AST walk, lazy
        # function-level ones included).
        seen: dict = {}
        todo = [root_module]
        while todo:
            name = todo.pop()
            if name in seen:
                continue
            path = _module_path(name, root)
            seen[name] = path
            if path is None:
                continue
            todo.extend(_module_imports(name, path, root))
        content_only = set()
        for name in list(seen):
            parts = name.split(".")
            for k in range(1, len(parts)):
                content_only.add(".".join(parts[:k]))
        for name in content_only - set(seen):
            seen[name] = _module_path(name, root)
        h = hashlib.sha256()
        for name in sorted(seen):
            path = seen[name]
            if path is None:
                continue
            # root-relative path: checkout location cannot perturb keys
            h.update(os.path.relpath(path, root).encode())
            with open(path, "rb") as f:
                h.update(f.read())
        fp = h.hexdigest()[:16]
        if memo:
            _dep_fp[root_module] = fp
        return fp
    except Exception:
        if memo:
            _dep_fp[root_module] = ""
        return None


def _code_fingerprint(root_module: str | None) -> str:
    """Dependency-scoped fingerprint when the traced function lives in
    the package (and NB_AOT_KEY != 'package'); whole-package hash
    otherwise."""
    if (root_module and os.environ.get("NB_AOT_KEY") != "package"):
        fp = _dependency_fingerprint(root_module)
        if fp is not None:
            return fp
    return _package_fingerprint()


def _leaf_sig(leaves) -> str:
    import jax

    parts = []
    for x in leaves:
        a = jax.api_util.shaped_abstractify(x)
        parts.append(f"{a.shape}{a.dtype}")
    return "|".join(parts)


def _key(tag: str, statics: dict, treedef, leaves,
         root_module: str | None = None) -> str:
    import jax

    dev = jax.devices()[0]
    raw = "\x1e".join([
        tag, jax.__version__,
        dev.platform, getattr(dev, "device_kind", "?"),
        _code_fingerprint(root_module),
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
    root_module = getattr(jit_fn, "__module__", None)
    key = _key(tag, statics, treedef, leaves, root_module)
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
