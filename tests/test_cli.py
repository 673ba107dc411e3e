"""CLI surface smoke tests (arg parsing -> real work, CPU tiny config)."""

import glob
import os

import numpy as np
import pytest

from ndjir_tpu import cli


def test_make_synthetic_and_train_and_render(tmp_path):
    scene = str(tmp_path / "scene")
    cli.main(["make-synthetic", scene, "3", "24", "24"])
    assert os.path.exists(os.path.join(scene, "cameras.npz"))
    assert len(glob.glob(os.path.join(scene, "image", "*.png"))) == 3

    mon = str(tmp_path / "run")
    cli.main(["train", "--config-name", "tiny_test",
              f"data_path={scene}", f"monitor_base_path={mon}",
              "valid.skip=true"])
    assert os.path.exists(mon + "_scene/Training-loss.series.txt")
    assert glob.glob(mon + "_scene/checkpoints/ckpt_*.msgpack")
    # code snapshot for replayability
    assert os.path.exists(mon + "_scene/code/ndjir_tpu/config.py")

    cli.main(["render", "--config-name", "tiny_test",
              f"data_path={scene}", f"monitor_base_path={mon}",
              f"model_load_path={mon}_scene/checkpoints",
              "valid.n_rays=128", "valid.n_down_samples=1"])
    rendered = glob.glob(mon + "_scene/rendered/*[0-9].png")
    masked = glob.glob(mon + "_scene/rendered/*_masked.png")
    assert len(rendered) == 3 and len(masked) == 3

    # eval-image over the rendered views
    cli.main(["eval-image", "--config-name", "tiny_test",
              f"data_path={scene}", f"monitor_base_path={mon}",
              "valid.n_down_samples=1"])
    series = glob.glob(mon + "_scene/Eval-*.series.txt")
    assert series


def test_render_missing_checkpoint_errors(tmp_path):
    scene = str(tmp_path / "s")
    cli.main(["make-synthetic", scene, "2", "16", "16"])
    with pytest.raises(FileNotFoundError, match="model_load_path"):
        cli.main(["render", "--config-name", "tiny_test",
                  f"data_path={scene}",
                  f"monitor_base_path={tmp_path}/m",
                  "model_load_path=/nonexistent"])


def test_unknown_config_errors(tmp_path):
    with pytest.raises(FileNotFoundError):
        cli.main(["train", "--config-name", "no_such_config",
                  f"data_path={tmp_path}"])
