import json
from pathlib import Path

from disentangle_mlp_tpu.config import Config
from disentangle_mlp_tpu.utils.logger import Logger


def test_log_schema(tmp_path):
    cfg = Config(name="t", save_path=str(tmp_path / "%"),
                 log_path=str(tmp_path / "%/log")).finalize()
    logger = Logger(cfg.log_path, cfg)
    logger.log({"Epoch": 0, "Avg Loss": 1.5, "FID": "N/A"})
    logger.log({"Epoch": 1, "Avg Loss": 1.0, "FID": 123.4})

    files = list(Path(cfg.log_path).glob("log_*.json"))
    assert len(files) == 1
    data = json.loads(files[0].read_text())
    # exact schema of reference utils/logger.py:30-37
    assert set(data.keys()) == {"meta_data", "output"}
    assert set(data["meta_data"].keys()) == {"file", "datetime", "args"}
    assert data["meta_data"]["args"]["beta"] == 50.0
    assert data["output"][0] == {"Epoch": 0, "Avg Loss": 1.5, "FID": "N/A"}
    assert data["output"][1]["FID"] == 123.4


def test_logger_never_clobbers_same_second(tmp_path):
    """Two runs starting within the same second (concurrent BO groups) must
    get distinct log files."""
    from disentangle_mlp_tpu.config import Config

    cfg = Config(name="t")
    a = Logger(str(tmp_path), cfg)
    b = Logger(str(tmp_path), cfg)
    assert a.log_file != b.log_file
    a.log({"Epoch": 0})
    b.log({"Epoch": 99})
    import json
    assert json.load(open(a.log_file))["output"] == [{"Epoch": 0}]
    assert json.load(open(b.log_file))["output"] == [{"Epoch": 99}]
