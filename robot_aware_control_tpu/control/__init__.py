from robot_aware_control_tpu.control.episode_runner import (
    EpisodeRunner,
    PickEpisodeRunner,
    PushEpisodeRunner,
)
