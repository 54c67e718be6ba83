"""Loader factory split-size regressions: a test split smaller than
test_batch_size must still yield batches (found via the table-task run)."""

from robot_aware_control_tpu.config import Config
from robot_aware_control_tpu.data.collect import collect_training_data
from robot_aware_control_tpu.data.loader import create_loaders


def test_small_test_split_yields_batches(tmp_path):
    cfg = Config(
        demo_length=5, video_length=5, robot_dim=5, action_dim=5,
        robot_joint_dim=5, image_height=48, image_width=64,
        impute_autograsp_action=False, data_root=str(tmp_path),
        batch_size=16, test_batch_size=8, train_val_split=0.8,
        data_threads=1,
    )
    collect_training_data("LocobotPush", 10, str(tmp_path), cfg, seed=0)
    train_loader, test_loader = create_loaders(cfg)
    # 2 test files < test_batch_size: loader must clamp, not drop everything
    assert len(test_loader) >= 1
    batch = next(iter(test_loader))
    assert batch["images"].shape[0] == 5
    assert len(train_loader) >= 1
