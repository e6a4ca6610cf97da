"""Single-core CPU baseline for the headline benchmark: the CNOT3 order-4
Hermite forward+adjoint step loop in plain numpy (dense LU stage solve),
pinned to one thread — a stand-in for the reference's single-core-Julia
hardware budget (examples/cnot3_optimize_gate.sb:3-13), since the reference
publishes no numbers (BASELINE.md).

Run: OMP_NUM_THREADS=1 OPENBLAS_NUM_THREADS=1 python tools/baseline_cpu.py
"""

import os

os.environ.setdefault("OMP_NUM_THREADS", "1")
os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")
os.environ.setdefault("MKL_NUM_THREADS", "1")

import time

import numpy as np
import scipy.linalg


def main():
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    os.environ["JAX_PLATFORMS"] = "cpu"
    import qgd_tpu  # noqa: F401  (for the problem builder only)

    prob = qgd_tpu.models.cnot3_problem(nsteps=1000)
    K0 = np.asarray(prob.system_sym)
    S0 = np.asarray(prob.system_asym)
    sym = np.asarray(prob.sym_operators)
    asym = np.asarray(prob.asym_operators)
    W = np.asarray(prob.w0)
    n2 = 2 * K0.shape[0]
    m = 2  # order 4
    nsteps = 300
    dt = float(prob.tf) / prob.nsteps
    rng = np.random.default_rng(0)
    # constant-ish control tables (values don't affect cost)
    P = rng.standard_normal((nsteps + 1, m, 3)) * 0.01
    Q = rng.standard_normal((nsteps + 1, m, 3)) * 0.01
    c = [1.0, 0.5, 2.0 / 24.0 * 2]  # order-4 weights c_j2

    def a_stack(p, q):
        out = np.empty((m, n2, n2))
        for k in range(m):
            S = np.einsum("j,jab->ab", q[k], asym)
            K = np.einsum("j,jab->ab", p[k], sym)
            if k == 0:
                S = S + S0
                K = K + K0
            out[k, :n2 // 2, :n2 // 2] = S
            out[k, :n2 // 2, n2 // 2:] = K
            out[k, n2 // 2:, :n2 // 2] = -K
            out[k, n2 // 2:, n2 // 2:] = S
        return out

    eye = np.eye(n2)

    def derivs(A, X):
        Ws = [X]
        for j in range(m):
            acc = A[j] @ Ws[0]
            for i in range(1, j + 1):
                acc = acc + A[j - i] @ Ws[i]
            Ws.append(acc / (j + 1))
        return Ws

    def sweep(transpose=False):
        w = W.copy()
        for n in range(nsteps):
            A_n = a_stack(P[n], Q[n])
            A_np1 = a_stack(P[n + 1], Q[n + 1])
            Ws = derivs(A_n, w)
            rhs = sum(cc * dt ** j * Wj for j, (cc, Wj) in enumerate(zip(c, Ws)))
            D = derivs(A_np1, eye)
            lhs = sum(cc * (-dt) ** j * Dj
                      for j, (cc, Dj) in enumerate(zip(c, D)))
            if transpose:
                w = scipy.linalg.solve(lhs.T, rhs)
            else:
                w = scipy.linalg.solve(lhs, rhs)
        return w

    # warm caches
    sweep()
    t0 = time.perf_counter()
    sweep(False)  # objective forward
    sweep(False)  # gradient forward
    sweep(True)   # adjoint backward
    elapsed = time.perf_counter() - t0
    steps_per_sec = 3 * nsteps / elapsed
    print(f"single-core CNOT3 order-4 fwd+adj steps/sec: {steps_per_sec:.1f}")


if __name__ == "__main__":
    main()
