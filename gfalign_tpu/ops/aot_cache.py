"""Persistent AOT executable cache for device kernels.

The persistent XLA compile cache does not capture executables over this
box's TPU transport (measured: every process pays the full 200-460 s
Mosaic compile per banded-kernel shape, which is why the align scoring
ladder defaults to the native host engine).  This cache serializes
COMPILED executables (jax.experimental.serialize_executable) keyed by
(kernel name, jax version, device kind, static config, arg
shapes/dtypes), so a machine pays each compile once and every later
process deserializes in milliseconds — making GFALIGN_TPU_ALIGN_DEVICE=1
viable for one-shot CLI runs after a single warmup.

Degrades transparently: backends whose executables don't support
serialization (serialize raises) just run the plain jit path, and a
cache entry that fails to deserialize (jax upgrade, different chip) is
ignored and recompiled.  Disable with GFALIGN_TPU_AOT_CACHE=0; redirect
with GFALIGN_TPU_AOT_DIR.
"""

from __future__ import annotations

import hashlib
import os
import pathlib
import pickle
import tempfile
from typing import Dict

_MEM: Dict[str, object] = {}
_DIR = [None]
_SRC_HASH: Dict[str, str] = {}
STATS = {"disk_hits": 0, "compiles": 0, "mem_hits": 0}


def _source_fingerprint(jitted) -> str:
    """Content hash of the module file defining the jitted function, so a
    kernel edit invalidates its cached executables instead of silently
    reusing a stale binary (the cache exists precisely for paths where
    nothing would recompile and notice)."""
    try:
        import functools

        fn = getattr(jitted, "__wrapped__", jitted)
        while isinstance(fn, functools.partial):
            fn = fn.func
        path = getattr(getattr(fn, "__code__", None), "co_filename", None)
        if not path:
            return "nosrc"
        h = _SRC_HASH.get(path)
        if h is None:
            with open(path, "rb") as fh:
                h = hashlib.sha256(fh.read()).hexdigest()[:12]
            _SRC_HASH[path] = h
        return h
    except Exception:
        return "nosrc"


def _cache_dir() -> pathlib.Path:
    if _DIR[0] is None:
        d = os.environ.get(
            "GFALIGN_TPU_AOT_DIR",
            os.path.join(os.path.expanduser("~"), ".cache", "gfalign_tpu_aot"))
        p = pathlib.Path(d)
        p.mkdir(parents=True, exist_ok=True)
        _DIR[0] = p
    return _DIR[0]


def enabled() -> bool:
    """Cache only on TPU backends (CPU compiles are fast and the XLA
    disk cache works there) unless explicitly disabled."""
    if os.environ.get("GFALIGN_TPU_AOT_CACHE", "1") == "0":
        return False
    try:
        import jax

        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _sig_of(name: str, args, static, src: str) -> str:
    import jax

    parts = [name, src, jax.__version__, jax.devices()[0].device_kind,
             repr(tuple(static))]
    for a in args:
        shape = getattr(a, "shape", None)
        dtype = getattr(a, "dtype", None)
        parts.append(f"{shape}:{dtype}" if shape is not None else repr(a))
    return hashlib.sha256("|".join(parts).encode()).hexdigest()[:24]


def call(name: str, jitted, args, static=()):
    """Run jitted(*args) through the persistent executable cache.

    `jitted` must be a jax.jit-wrapped callable; `static` is any extra
    configuration baked into it (widths, strides) that the arg shapes
    alone don't capture."""
    if not enabled():
        return jitted(*args)
    try:  # under an outer jit trace, inline as usual (lower() would fail)
        from jax.core import Tracer
    except Exception:
        from jax._src.core import Tracer  # type: ignore
    if any(isinstance(a, Tracer) for a in args):
        return jitted(*args)
    key = _sig_of(name, args, static, _source_fingerprint(jitted))
    compiled = _MEM.get(key)
    if compiled is not None:
        STATS["mem_hits"] += 1
        return compiled(*args)
    path = _cache_dir() / f"{name}-{key}.jaxexec"
    if path.exists():
        try:
            from jax.experimental import serialize_executable as se

            payload = pickle.loads(path.read_bytes())
            compiled = se.deserialize_and_load(
                payload["exe"], payload["in_tree"], payload["out_tree"])
            STATS["disk_hits"] += 1
        except Exception:
            compiled = None  # stale/foreign entry: recompile below
    if compiled is None:
        STATS["compiles"] += 1
        compiled = jitted.lower(*args).compile()
        try:
            from jax.experimental import serialize_executable as se

            exe, in_tree, out_tree = se.serialize(compiled)
            blob = pickle.dumps({"exe": exe, "in_tree": in_tree,
                                 "out_tree": out_tree})
            fd, tmp = tempfile.mkstemp(dir=str(_cache_dir()))
            with os.fdopen(fd, "wb") as fh:
                fh.write(blob)
            os.replace(tmp, path)  # atomic: concurrent processes race safely
        except Exception:
            pass  # backend doesn't support serialization; cache in-memory only
    _MEM[key] = compiled
    return compiled(*args)
