"""Schedule parity with reference solver.py:82-119."""

import numpy as np

from ndjir_tpu.config import load_config
from ndjir_tpu.train import schedules


def _conf():
    return load_config("default")


def test_lr_warmup_and_endpoints():
    conf = _conf()
    E = conf.train.epoch              # 1500
    warmup = int(E * conf.train.warmup_term_ratio)  # 22
    base = 5e-4
    assert schedules.learning_rate(0, base, conf) == 0.0
    np.testing.assert_allclose(
        schedules.learning_rate(warmup // 2, base, conf),
        base * (warmup // 2) / warmup)
    # exact reference formula at the boundary and the end
    lr_end = schedules.learning_rate(E, base, conf)
    x = np.pi * (E - warmup) / (E - warmup)
    a = (1 - 0.01) * base / (1 + np.cos(np.pi * warmup / E))
    b = a + 0.01 * base
    np.testing.assert_allclose(lr_end, np.cos(x) * a + b)
    assert lr_end < base * 0.02   # decays to ~end_ratio


def test_scaled_base_lrs():
    conf = _conf()  # B=4, R=512 -> x4
    w, f = schedules.scaled_base_lrs(conf)
    np.testing.assert_allclose(w, 5e-4 * 4)
    np.testing.assert_allclose(f, 5e-4 * 4)


def test_cos_anneal():
    conf = _conf()
    assert schedules.cos_anneal_ratio(0, conf) == 1.0 * 0.5 + 0.5
    end = int(conf.train.epoch * conf.train.cos_anneal_term_ratio)
    assert schedules.cos_anneal_ratio(end, conf) == 1.0
    assert schedules.cos_anneal_ratio(end + 100, conf) == 1.0
    mid = schedules.cos_anneal_ratio(end // 2, conf)
    assert 0.4 < mid < 0.6


def test_light_visibility_gain():
    conf = _conf()  # sigmoid_gain_lv_end = 1 -> constant 1
    for e in [0, 500, 1500]:
        np.testing.assert_allclose(
            schedules.light_visibility_gain(e, conf), 1.0)
    conf2 = load_config("default", overrides=["train.sigmoid_gain_lv_end=5"])
    np.testing.assert_allclose(schedules.light_visibility_gain(0, conf2), 1.0)
    np.testing.assert_allclose(
        schedules.light_visibility_gain(conf2.train.epoch, conf2), 5.0)
