"""Emit the experiment config corpus (configs/ tree).

Covers the reference's three config families (TensorRL_fixed /
TensorRL_trainable / StructureRL — SURVEY.md section 2.1 "config corpus")
with the published hyperparameters; families differ only in a few keys
(StructureRL sets zero_param_init=1; trainable variants use more layers and
optional random halting), which this generator encodes as deltas on one
canonical template instead of 37 hand-maintained INI files.
"""

import argparse
import pathlib
import sys

H2O_GEOM = "H -0.021 -0.002 0.000; O 0.835 0.452 0.000; H 1.477 -0.273 0.000"
BEH2_GEOM = "H 0.000 0.000 -1.330; Be 0.000 0.000 0.000; H 0.000 0.000 1.330"
CH2_GEOM = "C 0.000 0.000 0.000; H 1.080 0.000 0.000; H -0.225 1.056 0.000"

# problem table: (ham_type, qubits, geometry, tn_bond, fixed_layers,
#                 trainable_layers, accept_err)
PROBLEMS = [
    ("heisenberg", 5, "0", 2, 67, 67, "1e-3"),
    ("BEH2", 6, BEH2_GEOM, 2, 47, 57, "1.6e-3"),
    ("H2O", 8, H2O_GEOM, 2, 47, 67, "1.6e-3"),
    ("CH2", 8, CH2_GEOM, 2, 47, 67, "1.6e-3"),
    ("H2O", 10, H2O_GEOM, 2, 47, 67, "1.6e-3"),
    ("H2O", 10, H2O_GEOM, 3, 47, 67, "1.6e-3"),
    ("CH2", 10, CH2_GEOM, 2, 47, 67, "1.6e-3"),
    ("LIH", 12, "Li .0 .0 .0; H .0 .0 3.4", 2, 47, 67, "1.6e-3"),
]

TEMPLATE = """[general]
episodes = {episodes}

[env]
num_qubits = {qubits}
num_layers = {layers}
err_mitig = 0
rand_halt = {rand_halt}
n_shots = {n_shots}
tn_init = 1
tn_bond = {tn_bond}
zero_param_init = {zero_param_init}
noise_models = 0
noise_values = 0
fn_type = incremental_with_fixed_ends
accept_err = {accept_err}
thresholds = [{accept_err}]
switch_episodes = [100000]
curriculum_type = VanillaCurriculum

[problem]
ham_type = {ham_type}
geometry = {geometry}
taper = 1
mapping = jordan_wigner

[agent]
batch_size = 1000
memory_size = 20000
neurons = [1000,1000,1000,1000,1000]
dropout = 0.
learning_rate = 0.0003
angles = 0
en_state = 1
agent_type = DeepQNstep
agent_class = DQN_Nstep
n_step = 5
init_net = 0
priotitized_replay = 0
update_target_net = 100
final_gamma = 0.005
epsilon_decay = 0.99995
epsilon_min = 0.05
epsilon_restart = 1.0
init_epsilon = 1.0

[non_local_opt]
global_iters = {global_iters}
method = scipy_each_step
optim_alg = COBYLA
"""


def emit(out: pathlib.Path, family: str, name: str, **kw) -> None:
    path = out / family / f"{name}.cfg"
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text(TEMPLATE.format(**kw))


def config_name(ham, qubits, tn_bond):
    base = f"{ham.upper() if ham != 'heisenberg' else ham}{qubits}q" \
        if ham != "heisenberg" else f"heisenberg_{qubits}q"
    if ham not in ("heisenberg",):
        base = f"{ham.upper()}{qubits}q"
    return f"{base}_TNbond{tn_bond}"


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--out", type=str, default="configs")
    p.add_argument("--episodes", type=int, default=10000)
    p.add_argument("--global_iters", type=int, default=100,
                   help="per-step optimizer iterations (reference COBYLA "
                        "used 1000; the on-device adam default needs fewer)")
    args = p.parse_args()
    out = pathlib.Path(args.out)

    for ham, q, geom, bond, fixed_layers, train_layers, err in PROBLEMS:
        name = config_name(ham, q, bond)
        common = dict(episodes=args.episodes, qubits=q, tn_bond=bond,
                      accept_err=err, ham_type=ham, geometry=geom,
                      n_shots=0, global_iters=args.global_iters)
        emit(out, "TensorRL_fixed", name, layers=fixed_layers,
             rand_halt=0, zero_param_init=0, **common)
        emit(out, "TensorRL_trainable", name, layers=train_layers,
             rand_halt=1000, zero_param_init=0, **common)
        emit(out, "StructureRL", name, layers=train_layers,
             rand_halt=1000, zero_param_init=1, **common)
        # noisy + restricted variants for the benchmark problem
        if ham == "H2O" and q == 8:
            emit(out, "TensorRL_fixed", f"{name}_noise", layers=fixed_layers,
                 rand_halt=0, zero_param_init=0, **common)
            restricted = dict(common, n_shots=1024)
            emit(out, "TensorRL_fixed", f"{name}_noise_restricted",
                 layers=fixed_layers, rand_halt=0, zero_param_init=0,
                 **restricted)
    n = sum(1 for _ in out.rglob("*.cfg"))
    print(f"wrote config corpus under {out}/ ({n} files)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
