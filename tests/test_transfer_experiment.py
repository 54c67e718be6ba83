"""Transfer-experiment module test (tiny end-to-end run)."""

import json
import os

import pytest

from robot_aware_control_tpu.experiments.transfer import main


@pytest.mark.slow
def test_transfer_experiment_tiny(tmp_path):
    main([
        "--g_dim", "8", "--z_dim", "2", "--image_height", "16",
        "--image_width", "16", "--batch_size", "2", "--test_batch_size", "2",
        "--niter", "1", "--epoch_size", "1", "--n_past", "1",
        "--n_future", "2", "--n_eval", "3", "--video_length", "5",
        "--demo_length", "5", "--num_episodes", "4",
        "--compute_dtype", "float32", "--robot_dim", "5",
        "--action_dim", "5", "--robot_joint_dim", "5",
        "--impute_autograsp_action", "false", "--data_threads", "2",
        "--log_dir", str(tmp_path), "--jobname", "tx",
    ])
    with open(os.path.join(str(tmp_path), "transfer_results.json")) as f:
        result = json.load(f)
    assert "robot_aware" in result and "vanilla" in result
    assert result["robot_aware"]["world_loss"] > 0
