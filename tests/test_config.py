"""Config tree round-trip + split resolution + GameTime."""

import dataclasses
import os

import pytest

from transfuser_tpu.config import GlobalConfig, config_for_backbone
from transfuser_tpu.harness.game_time import GameTime


def test_config_json_roundtrip(tmp_path):
    cfg = config_for_backbone("latentTF", use_velocity=True)
    gpt = dataclasses.replace(cfg.model.gpt, n_layer=2)
    cfg = cfg.replace(model=dataclasses.replace(cfg.model, gpt=gpt))
    path = str(tmp_path / "config.json")
    cfg.save(path)
    loaded = GlobalConfig.load(path)
    assert loaded.model.backbone == "latentTF"
    assert loaded.model.use_velocity is True
    assert loaded.model.gpt.n_layer == 2
    assert loaded.sensors.img_resolution == (160, 704)
    assert loaded.loss.weight_of("loss_wp") == 1.0
    assert loaded.loss.weight_of("loss_velocity") == 0.0
    # frozen dataclasses
    with pytest.raises(dataclasses.FrozenInstanceError):
        loaded.model.backbone = "x"  # type: ignore[misc]


def test_resolve_splits(tmp_path):
    # Reference dataset layout: root/<Scenario>/<TownXX_route...>
    # (config.py:206-243 filters on the route-dir name containing TownXX).
    for scen in ("Scenario1", "Scenario3"):
        for route in ("Town01_r0", "Town02_r0", "Town05_r0"):
            os.makedirs(tmp_path / scen / route)
    cfg = GlobalConfig(root_dir=str(tmp_path), setting="02_05_withheld")
    train, val = cfg.resolve_splits()
    assert len(train) == 2 and all("Town01" in p for p in train)
    assert len(val) == 4
    assert all(("Town02" in p) or ("Town05" in p) for p in val)
    cfg_all = GlobalConfig(root_dir=str(tmp_path), setting="all")
    train_all, val_all = cfg_all.resolve_splits()
    assert len(train_all) == 6


def test_game_time():
    GameTime.restart()
    assert GameTime.get_time() == 0.0
    GameTime.on_carla_tick(frame=5, elapsed_seconds=0.25)
    assert GameTime.get_time() == 0.25
    assert GameTime.get_frame() == 5
    GameTime.on_carla_tick(frame=4, elapsed_seconds=0.1)  # stale frame
    assert GameTime.get_time() == 0.25
    GameTime.restart()
    assert GameTime.get_frame() == 0
