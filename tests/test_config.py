"""Config system: YAML load, dotted access, hydra-style overrides."""

from pafuse_tpu import config as cfg_mod


def test_default_config_loads():
    cfg = cfg_mod.load_config()
    assert cfg.model.number_of_frames == 27
    assert cfg.data.num_kps == 134
    assert cfg.ft2d.timestep == 1000
    assert cfg.general.part_based_model is True
    assert cfg.data.merge_hands is True


def test_overrides():
    cfg = cfg_mod.load_config(overrides=[
        "ft2d.num_proposals=20", "ft2d.sampling_timesteps=10",
        "model.batch_size=64", "general.evaluate=best_epoch.bin",
        "tpu.compute_dtype=bfloat16",
    ])
    assert cfg.ft2d.num_proposals == 20
    assert cfg.ft2d.sampling_timesteps == 10
    assert cfg.model.batch_size == 64
    assert cfg.general.evaluate == "best_epoch.bin"
    assert cfg.tpu.compute_dtype == "bfloat16"


def test_override_types():
    cfg = cfg_mod.load_config(overrides=[
        "experiment.subset=0.5", "general.nolog=true", "data.actions=Walking,Sitting"])
    assert cfg.experiment.subset == 0.5
    assert cfg.general.nolog is True
    assert cfg.data.actions == "Walking,Sitting"


def test_flatten_and_yaml():
    cfg = cfg_mod.load_config()
    flat = cfg_mod.flatten(cfg)
    assert flat["model.number_of_frames"] == 27
    text = cfg_mod.to_yaml(cfg)
    assert "number_of_frames" in text


def test_parse_cli():
    cfg = cfg_mod.parse_cli(["ft2d.debug=true", "model.epochs=2"])
    assert cfg.ft2d.debug is True
    assert cfg.model.epochs == 2


def test_copy_is_independent():
    cfg = cfg_mod.load_config()
    cfg2 = cfg.copy()
    cfg2.model.epochs = 1
    assert cfg.model.epochs == 400


def test_unknown_override_rejected():
    """Hydra strict-mode semantics: a typo'd key must raise, not silently
    no-op; +key=value explicitly adds new keys."""
    import pytest
    from pafuse_tpu import config as c
    with pytest.raises(KeyError):
        c.parse_cli(["ft2d.sampling_timestep=5"])     # typo: missing final s
    with pytest.raises(KeyError):
        c.parse_cli(["bogus_group.x=1"])
    args = c.parse_cli(["+general.brand_new=7"])
    assert args.general.brand_new == 7
    args = c.parse_cli(["+newgroup.sub.key=hi"])
    assert args.newgroup.sub.key == "hi"


def test_plus_on_existing_key_rejected():
    """'+existing.key=v' must raise (hydra errors on appending an existing
    key); silent overwrite could mask a typo'd '+' prefix."""
    import pytest
    with pytest.raises(KeyError, match="already exists"):
        cfg_mod.load_config(overrides=["+model.epochs=5"])


def test_plus_through_scalar_leaf_rejected():
    """'+a.b=v' where 'a' is an existing scalar leaf must not clobber the
    leaf with a new group."""
    import pytest
    with pytest.raises(KeyError, match="is a value, not a group"):
        cfg_mod.load_config(overrides=["+model.epochs.sub=5"])
    # the original value must be intact on a fresh load
    assert cfg_mod.load_config().model.epochs == 400
