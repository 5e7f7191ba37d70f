"""Config layer tests: presets, derived shapes, JSON round-trip."""

from keras_object_detection_tpu.config import (
    Config, GridConfig, ScheduleConfig, tiny_cpu_config, voc_full_config,
)


def test_grid_derived_shapes():
    g = GridConfig(grid=7, num_boxes=2, num_classes=20)
    assert g.cell_depth == 30
    assert g.output_shape == (7, 7, 30)


def test_presets():
    tiny = tiny_cpu_config()
    assert tiny.model.backbone == "darknet_tiny"
    assert tiny.grid.num_classes == 3
    voc = voc_full_config()
    assert voc.model.backbone == "darknet24"
    assert voc.model.image_size == 448
    assert voc.grid.output_shape == (7, 7, 30)
    assert voc.train.optimizer == "nadam"


def test_json_roundtrip():
    cfg = voc_full_config(train_dir="/a", val_dir="/b", test_dir="/c")
    text = cfg.to_json()
    back = Config.from_json(text)
    assert back == cfg


def test_json_roundtrip_with_schedule():
    cfg = tiny_cpu_config()
    back = Config.from_json(cfg.to_json())
    assert back.train.schedule == cfg.train.schedule
    assert isinstance(back.train.schedule, ScheduleConfig)
    assert back.data.color_jitter == cfg.data.color_jitter  # tuple restored


def test_json_unknown_keys_ignored():
    """Forward compatibility: configs written by newer versions with extra
    fields must still load."""
    import json

    cfg = tiny_cpu_config()
    d = json.loads(cfg.to_json())
    d["model"]["future_knob"] = 42
    d["brand_new_section"] = {"x": 1}
    back = Config.from_json(json.dumps(d))
    assert back.model.backbone == cfg.model.backbone


def test_json_partial_sections():
    back = Config.from_json('{"grid": {"num_classes": 7}}')
    assert back.grid.num_classes == 7
    assert back.model.backbone == "darknet24"  # defaults fill in
