"""Unit tests for the persistent AOT executable cache (ops/aot_cache.py).

The full compile/serialize/deserialize round trip needs a real TPU
(tools/tpu_smoke.py asserts it there); these cover the pure-host logic:
key composition, source-fingerprint invalidation, and the CPU no-op."""

import numpy as np
import pytest

from gfalign_tpu.ops import aot_cache


def test_disabled_on_cpu_backend_calls_through():
    import jax

    calls = []

    @jax.jit
    def f(x):
        return x + 1

    def fake(x):
        calls.append(1)
        return f(x)

    fake.__wrapped__ = f.__wrapped__
    out = aot_cache.call("t", fake, (np.zeros(3, np.int32),))
    assert calls == [1]  # CPU backend: plain call, no cache machinery
    assert list(np.asarray(out)) == [1, 1, 1]


def test_sig_includes_source_fingerprint_and_shapes(tmp_path):
    import jax

    src1 = tmp_path / "k1.py"
    src1.write_text("def f(x):\n    return x\n")
    ns = {}
    exec(compile(src1.read_text(), str(src1), "exec"), ns)
    fp1 = aot_cache._source_fingerprint(ns["f"])
    # editing the file changes the fingerprint (stale-executable guard)
    aot_cache._SRC_HASH.clear()
    src1.write_text("def f(x):\n    return x * 2\n")
    ns2 = {}
    exec(compile(src1.read_text(), str(src1), "exec"), ns2)
    fp2 = aot_cache._source_fingerprint(ns2["f"])
    assert fp1 != fp2

    a = np.zeros((4, 8), np.int32)
    b = np.zeros((4, 16), np.int32)
    s1 = aot_cache._sig_of("k", (a,), (), fp1)
    s2 = aot_cache._sig_of("k", (b,), (), fp1)
    s3 = aot_cache._sig_of("k", (a,), (1,), fp1)
    s4 = aot_cache._sig_of("k", (a,), (), fp2)
    assert len({s1, s2, s3, s4}) == 4  # shape, static, and source all key


def test_tracer_guard_falls_through_under_jit():
    import jax
    import jax.numpy as jnp

    @jax.jit
    def inner(x):
        return x * 3

    @jax.jit
    def outer(x):
        # aot_cache.call on tracers must inline rather than .lower()
        return aot_cache.call("t2", inner, (x,))

    out = outer(jnp.arange(4))
    assert list(np.asarray(out)) == [0, 3, 6, 9]
