"""Folklore retest probes (CLAUDE.md axon rules 1-3 predate the complex128
diagnosis and may be stale). ONE probe per invocation, tiny shapes, so a
wedge costs one serialized compile slot only. Run under `timeout`.

Usage: probe_folklore.py {reverse_scan|ad_of_scan|batched_getrf|f64_lu|
                          batched_getrf_f64|reverse_scan_big|ad_of_scan_big}
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

which = sys.argv[1]
t0 = time.time()
status = "ok"
detail = ""

try:
    if which in ("reverse_scan", "reverse_scan_big"):
        n = 64 if which == "reverse_scan" else 2048
        A = jnp.asarray(np.random.default_rng(0).standard_normal((8, 8)) * 0.1)

        @jax.jit
        def f(x):
            def body(c, _):
                c = jnp.tanh(A @ c)
                return c, c
            _, ys = jax.lax.scan(body, x, None, length=n, reverse=True)
            return ys.sum()

        out = float(f(jnp.ones(8)))
        detail = f"n={n} out={out:.4f}"

    elif which in ("ad_of_scan", "ad_of_scan_big"):
        n = 64 if which == "ad_of_scan" else 2048
        A = jnp.asarray(np.random.default_rng(0).standard_normal((8, 8)) * 0.1)

        @jax.jit
        def g(x):
            def body(c, _):
                c = jnp.tanh(A @ c)
                return c, None
            c, _ = jax.lax.scan(body, x, None, length=n)
            return (c * c).sum()

        out = jax.grad(g)(jnp.ones(8))
        out = float(jnp.linalg.norm(out))
        detail = f"n={n} |g|={out:.4e}"

    elif which in ("batched_getrf", "batched_getrf_f64"):
        dt = jnp.float32 if which == "batched_getrf" else jnp.float64
        rng = np.random.default_rng(0)
        M = jnp.asarray(rng.standard_normal((8, 16, 16)), dtype=dt) \
            + 4.0 * jnp.eye(16, dtype=dt)
        b = jnp.asarray(rng.standard_normal((8, 16)), dtype=dt)

        @jax.jit
        def h(M, b):
            import jax.scipy.linalg as jsl
            lu, piv = jax.vmap(jsl.lu_factor)(M)
            return jax.vmap(jsl.lu_solve)((lu, piv), b)

        out = h(M, b)
        jax.block_until_ready(out)
        detail = f"dtype={dt.__name__} sum={float(out.sum()):.4f}"

    elif which == "f64_lu":
        rng = np.random.default_rng(0)
        M = jnp.asarray(rng.standard_normal((16, 16))) + 4.0 * jnp.eye(16)
        b = jnp.asarray(rng.standard_normal(16))
        out = jax.jit(jnp.linalg.solve)(M, b)
        jax.block_until_ready(out)
        detail = f"sum={float(out.sum()):.4f}"

    else:
        raise SystemExit(f"unknown probe {which}")
except Exception as e:  # noqa: BLE001
    status = "error"
    detail = f"{type(e).__name__}: {str(e)[:300]}"

print(json.dumps({"probe": which, "status": status,
                  "elapsed_s": round(time.time() - t0, 1),
                  "backend": jax.default_backend(), "detail": detail}),
      flush=True)
