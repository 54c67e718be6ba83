"""Record shard converter/dataset tests (reference:
robonet/robonet/datasets/util/hdf5_2_records.py)."""

import numpy as np

from robot_aware_control_tpu.config import Config
from robot_aware_control_tpu.data.collect import collect_training_data
from robot_aware_control_tpu.data.loader import DataLoader
from robot_aware_control_tpu.data.records import RecordDataset, convert_to_records


def test_records_roundtrip(tmp_path):
    cfg = Config(demo_length=6, video_length=6, robot_dim=5, action_dim=5,
                 robot_joint_dim=5, image_height=48, image_width=64,
                 impute_autograsp_action=False)
    files = collect_training_data("LocobotPush", 3, str(tmp_path / "h5"),
                                  cfg, seed=0)
    shards = convert_to_records(cfg, files, ["locobot_c0"] * 3,
                                str(tmp_path / "rec"), episodes_per_shard=2)
    assert len(shards) == 2  # 2 + 1 episodes

    ds = RecordDataset(str(tmp_path / "rec"))
    assert len(ds) == 3
    item = ds[0]
    assert item["images"].shape == (6, 48, 64, 3)
    assert item["actions"].shape == (5, 5)
    assert item["robot"] == "locobot"

    # streams through the standard loader
    loader = DataLoader(ds, batch_size=2, num_workers=2, seed=0)
    batch = next(iter(loader))
    assert batch["images"].shape == (6, 2, 48, 64, 3)
