from uresnet_tpu.config import Config, apply_overrides, load_config, parse_kv_text


def test_defaults():
    cfg = Config()
    assert cfg.model.num_class == 3
    assert cfg.model.base_filters == 16
    assert cfg.data.image_size == 512


def test_reference_kv_parse():
    text = """
    # reference-style config (SURVEY.md 2.1)
    NUM_CLASS 3
    BASE_NUM_FILTERS 32
    BATCH_SIZE 8
    ITERATIONS 5000
    LEARNING_RATE 0.0005
    CHECKPOINT_DIR /tmp/ckpt
    SEED 42
    PLANES 0,1,2
    """
    cfg = parse_kv_text(text)
    assert cfg.model.base_filters == 32
    assert cfg.data.batch_size == 8
    assert cfg.train.iterations == 5000
    assert abs(cfg.optim.lr - 5e-4) < 1e-12
    assert cfg.train.checkpoint_dir == "/tmp/ckpt"
    assert cfg.data.planes == (0, 1, 2)


def test_overrides_dotted_and_reference():
    cfg = Config()
    apply_overrides(cfg, ["optim.lr=0.01", "LEARNING_RATE=0.02"])
    assert abs(cfg.optim.lr - 0.02) < 1e-12
    apply_overrides(cfg, ["model.dims=3", "data.random_access=false"])
    assert cfg.model.dims == 3
    assert cfg.data.random_access is False


def test_yaml_roundtrip(tmp_path):
    p = tmp_path / "cfg.yaml"
    p.write_text("model:\n  depth: 4\n  base_filters: 8\ndata:\n  batch_size: 2\n")
    cfg = load_config(str(p), overrides=["train.iterations=7"])
    assert cfg.model.depth == 4
    assert cfg.data.batch_size == 2
    assert cfg.train.iterations == 7


def test_kv_file_load(tmp_path):
    p = tmp_path / "ref.cfg"
    p.write_text("NUM_CLASS 2\nIMAGE_SIZE 256\n")
    cfg = load_config(str(p))
    assert cfg.model.num_class == 2
    assert cfg.data.image_size == 256


def test_bool_override_synonyms_and_rejection():
    """Bool fields accept yes/no/on/off and REJECT arbitrary strings —
    a raw string assigned to a bool field is always truthy and silently
    inverts 'model.pack=no'-style intent (round-2 review finding)."""
    from uresnet_tpu.config import Config, apply_overrides

    cfg = Config()
    apply_overrides(cfg, ["model.pack=no"])
    assert cfg.model.pack is False
    apply_overrides(cfg, ["model.pack=on"])
    assert cfg.model.pack is True
    apply_overrides(cfg, ["model.remat=block"])   # the one tri-state field
    assert cfg.model.remat == "block"
    import pytest as _pytest
    with _pytest.raises(ValueError, match="boolean"):
        apply_overrides(cfg, ["data.augment=maybe"])
