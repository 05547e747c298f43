"""Config corpus + CLI mode-inference tests."""

import pathlib

import pytest

from tensorrl_qas_tpu.train.cli import infer_modes
from tensorrl_qas_tpu.train.config import load_config_file

CONFIGS = pathlib.Path(__file__).resolve().parents[1] / "configs"


def test_all_generated_configs_load_with_expected_types():
    files = sorted(CONFIGS.rglob("*.cfg"))
    assert len(files) >= 20
    for f in files:
        conf = load_config_file(str(f))
        assert isinstance(conf["env"]["num_qubits"], int)
        assert isinstance(conf["env"]["accept_err"], float)
        assert isinstance(conf["agent"]["neurons"], list)
        assert isinstance(conf["agent"]["learning_rate"], float)
        assert isinstance(conf["problem"]["ham_type"], str)
        assert conf["non_local_opt"]["method"] == "scipy_each_step"
        fam = f.parent.name
        if fam == "StructureRL":
            assert conf["env"]["zero_param_init"] == 1
        else:
            assert conf["env"]["zero_param_init"] == 0


def test_reference_config_compat():
    """The loader must parse a reference-checkout config identically typed
    (keys lowercased by configparser, json lists, float coercions)."""
    ref = pathlib.Path("/root/reference/configuration_files/TensorRL_fixed/"
                       "H2O8q_TNbond2.cfg")
    if not ref.exists():
        pytest.skip("reference checkout not available")
    conf = load_config_file(str(ref))
    assert conf["env"]["tn_bond"] == 2            # key lowercased from TN_bond
    assert conf["env"]["accept_err"] == pytest.approx(1.6e-3)
    assert conf["agent"]["neurons"] == [1000] * 5
    assert conf["agent"]["epsilon_decay"] == pytest.approx(0.99995)
    assert conf["general"]["episodes"] == 10000


@pytest.mark.parametrize("exp,cfg,expected", [
    ("TensorRL_fixed/", "H2O8q_TNbond2", ("fixed", "none", "all_to_all")),
    ("TensorRL_fixed/", "H2O8q_TNbond2_noise",
     ("fixed", "depolarizing", "all_to_all")),
    ("TensorRL_fixed/", "H2O8q_TNbond2_noise_restricted",
     ("fixed", "shot", "hexagon")),
    ("TensorRL_trainable/", "LIH12q_TNbond2",
     ("in_state", "none", "all_to_all")),
    ("StructureRL/", "H2O8q_TNbond2", ("in_state", "none", "all_to_all")),
])
def test_infer_modes_capability_matrix(exp, cfg, expected):
    assert infer_modes(exp, cfg) == expected
