"""External ground-truth cross-checks (the role of the reference's
OrdinaryDiffEq and QuTiP extensions: ext/OrdinaryDiffEqInterface.jl,
ext/QuTipIntegration.jl): integrate the same Schrodinger problem with
scipy's adaptive ODE solvers and compare against the Hermite propagator.
"""

from __future__ import annotations

import numpy as np


def ode_rhs(prob, controls, pcof):
    """Right-hand side ``dw/dt = A(t) w`` as a numpy-callable — the
    reference's ``ODE_f!`` wrapper around ``apply_hamiltonian!``
    (ext/OrdinaryDiffEqInterface.jl:34-70)."""
    import jax
    import jax.numpy as jnp
    from ..controls import control_tables_at, as_control_tuple
    from ..ops.hermite import assemble_generator_stack

    controls = as_control_tuple(controls)
    pcof = jnp.asarray(pcof)

    @jax.jit
    def rhs(t, w):
        p, q = control_tables_at(controls, pcof, t, 1)
        A = assemble_generator_stack(prob, p, q, 1)[0]
        return A @ w

    def f(t, y):
        w = y.reshape(prob.real_system_size, -1)
        return np.asarray(rhs(jnp.asarray(t), jnp.asarray(w))).reshape(-1)

    return f


def solve_ivp_reference(prob, controls, pcof, *, rtol=1e-10, atol=1e-10,
                        method="DOP853"):
    """Integrate with scipy.solve_ivp as an external ground truth
    (``construct_ODEProb``/``sesolve`` analogue). Returns the final
    real-stacked state ``(2N, B)``."""
    from scipy.integrate import solve_ivp

    f = ode_rhs(prob, controls, pcof)
    y0 = np.asarray(prob.w0).reshape(-1)
    sol = solve_ivp(f, (0.0, float(prob.tf)), y0, method=method, rtol=rtol,
                    atol=atol)
    if not sol.success:
        raise RuntimeError(f"solve_ivp failed: {sol.message}")
    return sol.y[:, -1].reshape(prob.real_system_size, -1)


def test_agreement(prob, controls, pcof, *, order=4, rtol=1e-8):
    """Compare the Hermite propagator's final state to the scipy ground
    truth (the reference's ``test_agreement``,
    ext/OrdinaryDiffEqInterface.jl:72-107). Returns the max abs deviation."""
    from ..forward import eval_forward

    hist = eval_forward(prob, controls, pcof, order)
    ours = np.asarray(hist[-1])
    truth = solve_ivp_reference(prob, controls, pcof, rtol=rtol, atol=rtol)
    return float(np.abs(ours - truth).max())


# ---------------------------------------------------------------------------
# QuTiP bridge (reference ext/QuTipIntegration.jl) — optional dependency
# ---------------------------------------------------------------------------

def to_qutip_qobj(prob):
    """Drift Hamiltonian as a ``qutip.Qobj`` (the reference's ``Qobj``
    conversion, ext/QuTipIntegration.jl:55-86): ``H = K + i S`` with
    ``K = system_sym`` (real symmetric part) and ``S = system_asym``
    (imaginary anti-symmetric part)."""
    import qutip

    H = np.asarray(prob.system_sym) + 1j * np.asarray(prob.system_asym)
    return qutip.Qobj(H)


def simulate_prob_no_control(prob, nsteps_out: int = 101):
    """Integrate the drift-only Schrodinger equation with ``qutip.sesolve``
    (reference ``simulate_prob_no_control``, ext/QuTipIntegration.jl:88-128)
    as an independent-library ground truth. Returns the complex state
    history ``(nsteps_out, N, B)``.

    Raises ImportError when qutip is not installed (optional dependency;
    the scipy DOP853 path above is the always-available cross-check).
    """
    import qutip

    H = to_qutip_qobj(prob)
    tlist = np.linspace(0.0, float(prob.tf), nsteps_out)
    u0 = np.asarray(prob.u0)
    v0 = np.asarray(prob.v0)
    out = np.zeros((nsteps_out, prob.N_tot_levels, u0.shape[1]),
                   dtype=np.complex128)
    opts = {"atol": 1e-12, "rtol": 1e-12}
    for b in range(u0.shape[1]):
        psi0 = qutip.Qobj((u0[:, b] + 1j * v0[:, b]).reshape(-1, 1))
        res = qutip.sesolve(H, psi0, tlist, options=opts)
        out[:, :, b] = np.stack([np.asarray(s.full()).ravel()
                                 for s in res.states])
    return out
