"""Curriculum scheduler semantics (reference curricula.py behaviors)."""

import pytest

from tensorrl_qas_tpu.envs.curricula import (
    MovingThreshold,
    SuccesCountThreshold,
    VanillaCurriculum,
    make_curriculum,
)


def test_vanilla_holds_then_switches():
    conf = {"thresholds": [1e-2, 1e-3, 1e-4],
            "switch_episodes": [5, 10, 100000], "accept_err": 1e-2}
    c = VanillaCurriculum(conf, target_energy=-10.0)
    assert c.get_current_threshold() == 1e-2
    for _ in range(5):
        c.update_threshold(energy_done=1)
    assert c.get_current_threshold() == 1e-3
    for _ in range(5):
        c.update_threshold(energy_done=0)
    assert c.get_current_threshold() == 1e-4
    # past the last switch point: hold the final threshold (the reference
    # would crash on min() of an empty list)
    for _ in range(200000):
        c.episodes_completed += 1
    assert c.get_current_threshold() == 1e-4


def test_moving_threshold_shrinks_on_successes():
    conf = {"shift_threshold_ball": 0.04, "shift_threshold_time": 1000,
            "success_thresh": 2, "succ_radius_shift": 4,
            "succes_switch": 1.0, "accept_err": 0.1}
    c = MovingThreshold(conf, target_energy=-10.0)
    c.lowest_energy = -9.95          # gap 0.05 < succes_switch
    t0 = c.get_current_threshold()
    c.update_threshold(energy_done=1)
    assert c.get_current_threshold() == t0          # 1 success: no shrink yet
    c.update_threshold(energy_done=1)
    # 2 successes -> shrink by amortisation / succ_radius_shift
    assert c.get_current_threshold() == pytest.approx(t0 - 0.01)


def test_moving_threshold_greedy_shift():
    conf = {"shift_threshold_ball": 0.0, "shift_threshold_time": 5,
            "success_thresh": 0, "succ_radius_shift": 1,
            "succes_switch": 1.0, "accept_err": 0.1}
    c = MovingThreshold(conf, target_energy=-10.0)
    c.lowest_energy = -9.98
    # shift only after 10 warmup calls, at multiples of greedy_shift_time
    for _ in range(15):
        c.update_threshold(energy_done=0)
    assert c.get_current_threshold() == pytest.approx(0.02)  # |min - lowest|


def test_succes_count_threshold():
    conf = {"success_thresh": 3, "accept_err": 0.1}
    c = SuccesCountThreshold(conf, target_energy=-10.0)
    c.lowest_energy = -9.99
    for _ in range(2):
        c.update_threshold(energy_done=1)
    assert c.get_current_threshold() == 0.1
    c.update_threshold(energy_done=1)               # third success: snap
    assert c.get_current_threshold() == pytest.approx(0.01)
    # failures never advance the counter
    c2 = SuccesCountThreshold(conf, target_energy=-10.0)
    for _ in range(10):
        c2.update_threshold(energy_done=0)
    assert c2.get_current_threshold() == 0.1


def test_factory_and_state_roundtrip():
    conf = {"thresholds": [1e-3], "switch_episodes": [100000],
            "accept_err": 1e-3}
    c = make_curriculum("VanillaCurriculum", conf, target_energy=-1.0)
    c.update_threshold(energy_done=1)
    c.lowest_energy = -0.999
    d = c.state_dict()
    c2 = make_curriculum("VanillaCurriculum", conf, target_energy=-1.0)
    c2.load_state_dict(d)
    assert c2.episodes_completed == 1
    assert c2.lowest_energy == -0.999
    with pytest.raises(KeyError):
        make_curriculum("NoSuchCurriculum", conf, target_energy=0.0)
