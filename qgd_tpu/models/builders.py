"""Model zoo: multi-qudit dispersive / Jaynes-Cummings systems, gate and
state builders, and the small canonical test problems
(reference src/ProblemConstructors/*.jl).

All constructors run in numpy at setup time (never inside jit) and return
immutable :class:`~qgd_tpu.problem.SchrodingerProblem` pytrees.
"""

from __future__ import annotations

import itertools

import numpy as np

from ..problem import (
    SchrodingerProblem,
    schrodinger_problem,
    schrodinger_problem_complex,
)


# ---------------------------------------------------------------------------
# Operators (reference src/ProblemConstructors/multi_qudit_systems.jl:352-389)
# ---------------------------------------------------------------------------

def lowering_operator_subsystem(subsystem_size: int) -> np.ndarray:
    """``a`` for one subsystem: ``sqrt(diag(1..n-1, k=1))``
    (multi_qudit_systems.jl:355-357)."""
    return np.sqrt(np.diag(np.arange(1, subsystem_size, dtype=np.float64), k=1))


def lowering_operator(subsystem_size: int) -> np.ndarray:
    """Alias used by ``rotating_frame_qubit`` — the reference exports this
    name but never defines it (latent defect, SURVEY.md §2.2); here it is the
    single-subsystem lowering operator."""
    return lowering_operator_subsystem(subsystem_size)


def lowering_operators_system(subsystem_sizes) -> list[np.ndarray]:
    """Per-subsystem lowering operators kron-lifted to the full system,
    bitstring ordering (first subsystem = leftmost ket factor;
    multi_qudit_systems.jl:364-389)."""
    mats = []
    eyes = [np.eye(n) for n in subsystem_sizes]
    for i in range(len(subsystem_sizes)):
        factors = list(eyes)
        factors[i] = lowering_operator_subsystem(subsystem_sizes[i])
        out = factors[0]
        for f in factors[1:]:
            out = np.kron(out, f)
        mats.append(out)
    return mats


# ---------------------------------------------------------------------------
# States, gates, guard projectors (multi_qudit_systems.jl:229-455)
# ---------------------------------------------------------------------------

def basis_state(subsystem_sizes, subsystem_indices,
                bitstring_ordered: bool = True) -> np.ndarray:
    """Composite-system basis ket ``|n_0 n_1 ...>`` with 0-based per-subsystem
    level indices (multi_qudit_systems.jl:229-250)."""
    subsystem_indices = list(subsystem_indices)
    if any(i >= n for i, n in zip(subsystem_indices, subsystem_sizes)):
        raise ValueError(
            f"Subsystem indices {subsystem_indices} are invalid for "
            f"subsystem sizes {tuple(subsystem_sizes)}.")
    vec = np.ones((1,))
    if bitstring_ordered:
        it = zip(subsystem_sizes, subsystem_indices)
    else:
        it = zip(reversed(subsystem_sizes), reversed(subsystem_indices))
    for n, i in it:
        e = np.zeros(n)
        e[i] = 1.0
        vec = np.kron(vec, e)
    return vec


def _essential_iter(essential_subsystem_sizes):
    """Iterate essential-state index tuples in the reference's column order:
    the *first* subsystem's index varies slowest (quantum bitstring order;
    multi_qudit_systems.jl:266-276)."""
    return itertools.product(*[range(n) for n in essential_subsystem_sizes])


def create_initial_conditions(subsystem_sizes, essential_subsystem_sizes,
                              bitstring_ordered: bool = True) -> np.ndarray:
    """Complex (N_tot, N_ess) matrix whose columns are the essential basis
    states in gate order (multi_qudit_systems.jl:255-279)."""
    n_tot = int(np.prod(subsystem_sizes))
    cols = []
    for idx in _essential_iter(essential_subsystem_sizes):
        cols.append(basis_state(subsystem_sizes, idx, bitstring_ordered))
    return np.stack(cols, axis=1).astype(np.complex128)


def guard_projector(subsystem_sizes, essential_subsystem_sizes,
                    bitstring_ordered: bool = True) -> np.ndarray:
    """Real (2N, 2N) projector ``[[G, 0], [0, G]]`` onto non-essential
    (guard) levels (multi_qudit_systems.jl:316-349).

    Note a latent reference defect not replicated here: for *asymmetric*
    essential sizes the reference compares the reversed iteration tuple
    against the unreversed essential sizes (multi_qudit_systems.jl:333-335),
    pairing subsystem i's level index with subsystem (Q-1-i)'s essential
    size — inconsistent with its own ``create_initial_conditions``. Here a
    state is guarded iff any subsystem's level index exceeds *that
    subsystem's* essential size. Identical for the symmetric benchmark
    configs (e.g. (2,2,2))."""
    n_tot = int(np.prod(subsystem_sizes))
    G = np.zeros((n_tot, n_tot))
    for idx in itertools.product(*[range(n) for n in subsystem_sizes]):
        if all(i < e for i, e in zip(idx, essential_subsystem_sizes)):
            continue
        v = basis_state(subsystem_sizes, idx, bitstring_ordered)
        G += np.outer(v, v)
    Z = np.zeros_like(G)
    return np.block([[G, Z], [Z, G]])


def create_gate(subsystem_sizes, essential_subsystem_sizes,
                initial_final_pairs, bitstring_ordered: bool = True) -> np.ndarray:
    """Start from the identity on the essential subspace and overwrite the
    columns named by ``initial_final_pairs`` (a list of
    ``(initial_indices, final_indices)`` tuples;
    multi_qudit_systems.jl:391-410)."""
    G = create_initial_conditions(subsystem_sizes, essential_subsystem_sizes,
                                  bitstring_ordered)
    ordered = list(_essential_iter(essential_subsystem_sizes))
    for initial, final in initial_final_pairs:
        i = ordered.index(tuple(initial))
        G[:, i] = basis_state(subsystem_sizes, final, bitstring_ordered)
    return G


def rotation_matrix(subsystem_sizes, rotation_frequencies, t):
    """Per-subsystem frame-rotation matrices
    ``kron-lift(diag(exp(i w_i t n)))`` (multi_qudit_systems.jl:412-455)."""
    mats = []
    eyes = [np.eye(n, dtype=np.complex128) for n in subsystem_sizes]
    for i, n in enumerate(subsystem_sizes):
        factors = list(eyes)
        factors[i] = np.diag(
            np.exp(1j * rotation_frequencies[i] * t * np.arange(n)))
        out = factors[0]
        for f in factors[1:]:
            out = np.kron(out, f)
        mats.append(out)
    return mats


# ---------------------------------------------------------------------------
# Hamiltonians (multi_qudit_systems.jl:26-116)
# ---------------------------------------------------------------------------

def multi_qudit_hamiltonian_dispersive(subsystem_sizes, transition_freqs,
                                       rotation_freqs, kerr_coeffs) -> np.ndarray:
    """Dispersive drift ``sum_q (w_q - w_rot) a'a - xi_q/2 a'a'aa -
    sum_{p>q} xi_pq a'_p a_p a'_q a_q`` (multi_qudit_systems.jl:26-58)."""
    kerr = np.asarray(kerr_coeffs, dtype=np.float64)
    assert kerr.shape[0] == kerr.shape[1] == len(transition_freqs)
    assert np.allclose(kerr, kerr.T)
    n_tot = int(np.prod(subsystem_sizes))
    H = np.zeros((n_tot, n_tot), dtype=np.complex128)
    a_ops = lowering_operators_system(subsystem_sizes)
    Q = len(subsystem_sizes)
    for q in range(Q):
        a_q = a_ops[q]
        num_q = a_q.conj().T @ a_q
        H += (transition_freqs[q] - rotation_freqs[q]) * num_q
        H -= 0.5 * kerr[q, q] * (a_q.conj().T @ a_q.conj().T @ a_q @ a_q)
        for p in range(q + 1, Q):
            a_p = a_ops[p]
            H -= kerr[p, q] * (a_p.conj().T @ a_p @ num_q)
    return H


def multi_qudit_hamiltonian_jayne(subsystem_sizes, transition_freqs,
                                  rotation_freq, kerr_coeffs,
                                  jayne_cummings_coeffs) -> np.ndarray:
    """Dispersive + Jaynes-Cummings coupling (single common rotation
    frequency so the drift stays time-independent;
    multi_qudit_systems.jl:81-116)."""
    kerr = np.asarray(kerr_coeffs, dtype=np.float64)
    jc = np.asarray(jayne_cummings_coeffs, dtype=np.float64)
    assert np.allclose(kerr, kerr.T)
    assert np.allclose(jc, jc.T)
    assert np.allclose(np.diag(jc), 0.0)
    H = multi_qudit_hamiltonian_dispersive(
        subsystem_sizes, transition_freqs,
        [rotation_freq] * len(subsystem_sizes), kerr).astype(np.complex128)
    a_ops = lowering_operators_system(subsystem_sizes)
    Q = len(subsystem_sizes)
    for q in range(Q):
        for p in range(q + 1, Q):
            a_q, a_p = a_ops[q], a_ops[p]
            H += jc[p, q] * (a_q.conj().T @ a_p + a_q @ a_p.conj().T)
    return H


def control_ops(subsystem_sizes):
    """Per-subsystem control operator pairs ``(a + a', a - a')``
    (multi_qudit_systems.jl:60-71)."""
    a_ops = lowering_operators_system(subsystem_sizes)
    sym_ops = [a + a.conj().T for a in a_ops]
    asym_ops = [a - a.conj().T for a in a_ops]
    return [np.real(s) for s in sym_ops], [np.real(s) for s in asym_ops]


# ---------------------------------------------------------------------------
# Full problems
# ---------------------------------------------------------------------------

def DispersiveProblem(subsystem_sizes, essential_subsystem_sizes,
                      transition_freqs, rotation_freqs, kerr_coeffs,
                      tf, nsteps, **kwargs) -> SchrodingerProblem:
    """Multi-qudit dispersive gate-design problem with guard projector and
    essential-basis initial conditions (multi_qudit_systems.jl:118-162)."""
    H = multi_qudit_hamiltonian_dispersive(
        subsystem_sizes, transition_freqs, rotation_freqs, kerr_coeffs)
    sym_ops, asym_ops = control_ops(subsystem_sizes)
    W = guard_projector(subsystem_sizes, essential_subsystem_sizes)
    U0 = create_initial_conditions(subsystem_sizes, essential_subsystem_sizes)
    n_ess = int(np.prod(essential_subsystem_sizes))
    return schrodinger_problem_complex(
        H, sym_ops, asym_ops, U0, tf, nsteps, n_ess, W, **kwargs)


def JaynesCummingsProblem(subsystem_sizes, essential_subsystem_sizes,
                          transition_freqs, rotation_freq, kerr_coeffs,
                          jayne_cummings_coeffs, tf, nsteps,
                          **kwargs) -> SchrodingerProblem:
    """Jaynes-Cummings gate-design problem (multi_qudit_systems.jl:169-217;
    the reference version passes undefined ``u0, v0`` — latent defect,
    SURVEY.md §2.2 — fixed here by using the essential-basis initial
    conditions like ``DispersiveProblem``)."""
    H = multi_qudit_hamiltonian_jayne(
        subsystem_sizes, transition_freqs, rotation_freq, kerr_coeffs,
        jayne_cummings_coeffs)
    sym_ops, asym_ops = control_ops(subsystem_sizes)
    W = guard_projector(subsystem_sizes, essential_subsystem_sizes)
    U0 = create_initial_conditions(subsystem_sizes, essential_subsystem_sizes)
    n_ess = int(np.prod(essential_subsystem_sizes))
    return schrodinger_problem_complex(
        H, sym_ops, asym_ops, U0, tf, nsteps, n_ess, W, **kwargs)


def construct_rabi_prob(tf=np.pi, nsteps=100, **kwargs) -> SchrodingerProblem:
    """2-level Rabi oscillator, zero drift, one control pair; for duration
    ``pi`` an amplitude |Omega| = 0.5 pulse is analytically a SWAP gate
    (src/ProblemConstructors/rabi_oscillator.jl:7-23)."""
    a = np.array([[0.0, 1.0], [0.0, 0.0]])
    H = np.zeros((2, 2), dtype=np.complex128)
    return schrodinger_problem_complex(
        H, [a + a.T], [a - a.T], np.eye(2, dtype=np.complex128),
        tf, nsteps, 2, **kwargs)


def _rand_sym(rng, n):
    m = rng.random((n, n))
    return m + m.T


def _rand_asym(rng, n):
    m = rng.random((n, n))
    return m - m.T


def construct_rand_prob(complex_system_size, N_operators, tf=2.0, nsteps=100,
                        seed: int = 0, **kwargs) -> SchrodingerProblem:
    """Seeded random problem — the reproducible test workhorse
    (src/ProblemConstructors/random_problem.jl:15-35). The reference seeds
    MersenneTwister streams per matrix; here one numpy PCG64 stream seeded by
    ``seed`` generates everything (documented divergence: exact random values
    differ; distributions and symmetry structure match)."""
    n = int(complex_system_size)
    rng = np.random.default_rng(seed)
    re = rng.random((n, n))
    im = rng.random((n, n))
    U0 = re + 1j * im
    H = _rand_sym(rng, n) + 1j * _rand_asym(rng, n)
    sym_ops = [_rand_sym(rng, n) for _ in range(N_operators)]
    asym_ops = [_rand_asym(rng, n) for _ in range(N_operators)]
    return schrodinger_problem_complex(
        H, sym_ops, asym_ops, U0, tf, nsteps, n, **kwargs)


def dahlquist_problem(lam, initial_condition=1.0, with_control: bool = False,
                      tf=1.0, nsteps=10) -> SchrodingerProblem:
    """1x1 sanity problem ``y' = lambda y`` with purely imaginary lambda
    (src/ProblemConstructors/dahlquist_problem.jl:9-47)."""
    lam = complex(lam)
    H = 1j * lam  # hermitian iff lam purely imaginary
    if abs(H.imag) > 1e-14:
        raise ValueError("lambda must be purely imaginary for a Hermitian H")
    u0 = np.array([[np.real(initial_condition)]])
    v0 = np.array([[np.imag(initial_condition)]])
    if with_control:
        sym_ops, asym_ops = [np.ones((1, 1))], [np.zeros((1, 1))]
    else:
        sym_ops, asym_ops = [], []
    return schrodinger_problem(
        np.array([[H.real]]), np.array([[0.0]]), sym_ops, asym_ops,
        u0, v0, tf, nsteps, 1)


def rotating_frame_qubit(N_ess_levels, N_guard_levels, tf=1.0, nsteps=10,
                         detuning_frequency=1.0,
                         self_kerr_coefficient=1.0) -> SchrodingerProblem:
    """Single qudit in the rotating frame with detuning + self-Kerr
    (src/ProblemConstructors/rotating_frame_qubit.jl:8-41)."""
    n_tot = N_ess_levels + N_guard_levels
    a = lowering_operator_subsystem(n_tot)
    num = a.T @ a
    K = (2 * np.pi * detuning_frequency) * num \
        - (0.5 * 2 * np.pi * self_kerr_coefficient) * (a.T @ a.T @ a @ a)
    u0 = np.zeros((n_tot, N_ess_levels))
    v0 = np.zeros((n_tot, N_ess_levels))
    for i in range(N_ess_levels):
        u0[i, i] = 1.0
    return schrodinger_problem(
        K, np.zeros_like(K), [a + a.T], [a - a.T], u0, v0, tf, nsteps,
        N_ess_levels)


# ---------------------------------------------------------------------------
# Benchmark configurations
# ---------------------------------------------------------------------------

def cnot3_problem(tf=550.0, nsteps=5500, **kwargs) -> SchrodingerProblem:
    """The CNOT3 benchmark system: 3 coupled transmons with subsystem sizes
    (4,4,4), essential (2,2,2), dispersive drift with guard levels — the
    configuration of the reference's headline SLURM sweep
    (examples/cnot3_optimize_gate.sb:28-41). The device parameters mirror the
    Juqbox cnot3 example the reference's (absent) ``cnot3_setup.jl`` points
    at: transitions 2pi*(4.10336, 4.81831, 7.8447) GHz rotating at their own
    frequencies, self-Kerr 2pi*(0.2198, 0.2252, 0.001), cross-Kerr
    2pi*(0.01, 0.001, 0.001)."""
    freqs = 2 * np.pi * np.array([4.10336, 4.81831, 7.8447])
    xi = 2 * np.pi * np.array([0.2198, 0.2252, 0.001])
    xi12, xi13, xi23 = 2 * np.pi * np.array([0.01, 0.001, 0.001])
    kerr = np.array([
        [xi[0], xi12, xi13],
        [xi12, xi[1], xi23],
        [xi13, xi23, xi[2]],
    ])
    return DispersiveProblem(
        (4, 4, 4), (2, 2, 2), freqs, freqs, kerr, tf, nsteps, **kwargs)


def cnot3_carrier_frequencies():
    """Carrier frequencies (rad/ns) for the CNOT3 controls, one row per
    oscillator: ``[0, -chi_qp, -chi_qr]`` — the cross-Kerr shifts of each
    oscillator's 0<->1 transition conditioned on the state of the other
    two. This is the Juqbox cnot3 scheme the reference's (absent)
    ``cnot3_setup.jl`` mirrors (examples/cnot3_optimize_gate.jl:46): a
    plain slow envelope cannot resolve the chi12 = 2pi*0.01 conditional
    splitting over tf=550 with D1=10 splines, so the conditional (CNOT)
    drive needs these sidebands. 3 freqs x 10 splines x 2 quadratures x
    3 oscillators = 180 parameters, the documented Juqbox CNOT3 size."""
    x12, x13, x23 = 2 * np.pi * np.array([0.01, 0.001, 0.001])
    return [
        [0.0, -x12, -x13],
        [0.0, -x12, -x23],
        [0.0, -x13, -x23],
    ]


def cnot3_target(tf=550.0, rotating_frame=True) -> np.ndarray:
    """The CNOT3 benchmark target: CNOT on qudits (1,2), identity on the
    spectator, transformed into the rotating frame — the reference's
    documented workflow multiplies the lab-frame gate by
    ``rotation_matrix(subsystem_sizes, rotation_freqs, tf)``
    (docs/src/examples.md:142-146; the dynamics run in the frame rotating
    at the transition frequencies, so the realized gate is
    ``exp(-i sum_q w_q n_q tf) U_rot(tf)`` and the rotating-frame target
    must carry the inverse phases).

    ``rotating_frame=False`` returns the bare lab-frame gate — the target
    round 2's flagship optimized by mistake: the frame's single-qudit Z
    phases are nearly unreachable for bounded resonant drives, which is
    exactly the measured plateau (infidelity stalled at 0.47-0.49 with
    per-column overlap magnitudes 0.95-0.99 but scattered phases;
    results/diag/, tools/probes/cnot3_phase_analysis.py). With the rotated
    target the same optimizer config passes infidelity 1.2e-2 within 130
    L-BFGS iterations.
    """
    pairs = []
    for k in range(2):
        pairs.append(((1, 1, k), (1, 0, k)))
        pairs.append(((1, 0, k), (1, 1, k)))
    target = create_gate((4, 4, 4), (2, 2, 2), pairs)
    if rotating_frame:
        rots = rotation_matrix(
            (4, 4, 4), 2 * np.pi * np.array([4.10336, 4.81831, 7.8447]), tf)
        target = rots[0] @ rots[1] @ rots[2] @ target
    return target


def cnot2_problem(tf=100.0, nsteps=2000, **kwargs) -> SchrodingerProblem:
    """The CNOT2 benchmark: 2 transmons (2,2) dispersive, self-Kerr
    2pi*(0.2198, 0.2252), cross-Kerr 2pi*0.01, tf = 100
    (examples/cnot2_optimization.jl:10-65)."""
    freqs = 2 * np.pi * np.array([4.10336, 4.81831])
    xi = 2 * np.pi * np.array([0.2198, 0.2252])
    x12 = 2 * np.pi * 0.01
    kerr = np.array([[xi[0], x12], [x12, xi[1]]])
    return DispersiveProblem(
        (2, 2), (2, 2), freqs, freqs, kerr, tf, nsteps, **kwargs)
