"""Config/EnvSetter parity tests (reference: utils/envsetter.py:128-144
inline asserts, which this suite replaces with real tests)."""

from pathlib import Path

from disentangle_mlp_tpu.config import Config, config_from_args


def test_templating_and_dirs(tmp_path):
    cfg = Config(
        name="beta25",
        dataset="celebA",
        save_path=str(tmp_path / "data/%"),
        log_path=str(tmp_path / "data/%/log"),
        image_root_train="/x/%/train",
    ).finalize()
    assert cfg.save_path == str(tmp_path / "data/beta25")
    assert cfg.image_root_train == "/x/celebA/train"
    sp = Path(cfg.save_path)
    for sub in [
        "models", "results/recons", "results/samples",
        "test_results/recons", "test_results/originals",
        "test_results/samples", "fid_results/samples",
        # the reference never created fid_results/recons yet read
        # opt.fid_path_recons (new_betavaegan.py:234); we fix the hole.
        "fid_results/recons", "log",
    ]:
        assert (sp / sub).is_dir(), sub
    assert cfg.model_path == str(sp / "models")
    assert cfg.fid_path_recons == str(sp / "fid_results/recons")


def test_cli_surface(tmp_path):
    cfg = config_from_args([
        "--name", "t", "--beta", "25", "--n_z", "256", "8", "8",
        "--calc_fid", "False", "--batch_size_train", "64",
        "--save_path", str(tmp_path / "%"),
        "--log_path", str(tmp_path / "%/log"),
        "--load_path", "a.ckpt", "b.ckpt",
    ])
    assert cfg.beta == 25.0
    assert cfg.n_z == [256, 8, 8]
    assert cfg.calc_fid is False
    assert cfg.batch_size_train == 64
    assert cfg.load_path == ["a.ckpt", "b.ckpt"]
    # reference defaults preserved
    assert cfg.seed == 999
    assert cfg.n_hidden == 128
    assert cfg.img_size == 64


def test_defaults_match_reference():
    d = Config()
    assert d.epochs == 30
    assert d.batch_size_train == 256
    assert d.n_z == [256, 8, 8]
    assert d.beta == 50.0
    assert d.calc_fid is True and d.to_train is True
    assert d.test_recons is False and d.test_samples is False


def test_negative_checkpoint_every_rejected(tmp_path):
    """Advisor r3: bool(-1) is truthy and negative-divisor modulo never
    hits 0, so --checkpoint_every -1 would silently degrade to
    final-epoch-only saves; finalize must reject it instead."""
    import pytest

    with pytest.raises(ValueError, match="checkpoint_every"):
        Config(name="neg", checkpoint_every=-1,
               save_path=str(tmp_path / "%"),
               log_path=str(tmp_path / "%/log")).finalize(make_dirs=False)
    # the documented contract values still pass
    for ok in (0, 1, 5):
        Config(name=f"ok{ok}", checkpoint_every=ok,
               save_path=str(tmp_path / "%"),
               log_path=str(tmp_path / "%/log")).finalize(make_dirs=False)
