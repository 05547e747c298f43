from tensorrl_qas_tpu.problems.hamiltonians import (
    Problem,
    heisenberg_hamiltonian,
    load_problem,
    save_problem_npz,
    tfim_hamiltonian,
)
