#!/usr/bin/env python
"""TPU probe (rule 4: tiny shapes first): does lax.associative_scan over
matrix products / affine maps compile and run on the axon remote backend?

This is the program family behind the prefix-product propagator
(qgd_tpu/prefix.py): O(log T) depth of batched matmuls instead of 3T
serial stage solves. The folklore table shows reverse scans and
AD-of-scan are pathological on this compiler; associative_scan lowers to
slicing + concat + batched matmuls (no scan primitive), but it is UNTESTED
here. One client, tiny sizes, hard timeout upstream.
"""
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

t_start = time.time()
print(f"backend={jax.default_backend()}", flush=True)

rng = np.random.default_rng(0)
T, n, b = 64, 16, 4
# near-identity, norm ~1 (like Hermite step maps)
F = jnp.asarray(np.eye(n)[None] + 0.05 * rng.standard_normal((T, n, n)),
                dtype=jnp.float32)
g = jnp.asarray(0.01 * rng.standard_normal((T, n, b)), dtype=jnp.float32)
w0 = jnp.asarray(rng.standard_normal((n, b)), dtype=jnp.float32)


@jax.jit
def prefix_states(F, w0):
    P = lax.associative_scan(lambda a, c: jnp.matmul(c, a), F)
    return P @ w0


@jax.jit
def affine_prefix(F, g):
    def comb(x, y):
        A1, b1 = x
        A2, b2 = y
        return jnp.matmul(A2, A1), jnp.matmul(A2, b1) + b2
    A, bb = lax.associative_scan(comb, (F, g))
    return A, bb


t0 = time.time()
W = prefix_states(F, w0)
s = float(jnp.sum(W))          # fetch = sync
print(f"matmul prefix: compile+run {time.time()-t0:.1f} s sum={s:.6f}",
      flush=True)

# host reference
Pn = np.eye(n)
ref = []
for k in range(T):
    Pn = np.asarray(F[k], dtype=np.float64) @ Pn
    ref.append(Pn @ np.asarray(w0, np.float64))
ref = np.stack(ref)
err = np.max(np.abs(ref - np.asarray(W, np.float64)))
print(f"matmul prefix max err vs host serial: {err:.3e}", flush=True)

t0 = time.time()
A, bb = affine_prefix(F, g)
s2 = float(jnp.sum(A)) + float(jnp.sum(bb))
print(f"affine prefix: compile+run {time.time()-t0:.1f} s sum={s2:.6f}",
      flush=True)

# affine host reference
Acc = np.eye(n); bcc = np.zeros((n, b))
for k in range(T):
    Fk = np.asarray(F[k], np.float64); gk = np.asarray(g[k], np.float64)
    Acc = Fk @ Acc; bcc = Fk @ bcc + gk
err2 = max(np.max(np.abs(Acc - np.asarray(A[-1], np.float64))),
           np.max(np.abs(bcc - np.asarray(bb[-1], np.float64))))
print(f"affine prefix final-map err vs host: {err2:.3e}", flush=True)
print(f"TOTAL {time.time()-t_start:.1f} s OK", flush=True)
