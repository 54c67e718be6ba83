"""Unit tests for the projection-contact push model (envs/base.py).

Behaviors fitted against the reference MuJoCo LocobotTableEnv
(locobot_table_env.py:186-256) via benchmarks/physics_fidelity.py:
engagement transfers only the overlap, glancing deflects, trains don't
interpenetrate, blocks coast after contact ends, misses stay put.
"""

import jax.numpy as jnp
import numpy as np

from robot_aware_control_tpu.envs import base as eb


def _state(eef_xy, obj_xys, z=0.12):
    obj_xys = np.atleast_2d(np.asarray(obj_xys, np.float32))
    K = len(obj_xys)
    return eb.SimState(
        eef=jnp.asarray([eef_xy[0], eef_xy[1], z], jnp.float32),
        qpos=jnp.zeros(5, jnp.float32),
        obj_pos=jnp.concatenate(
            [jnp.asarray(obj_xys), jnp.full((K, 1), z, jnp.float32)], -1
        ),
        gripper=jnp.float32(1.0),
        attached=jnp.zeros(K, jnp.float32),
        obj_vel=jnp.zeros((K, 2), jnp.float32),
    )


def _push(state, ax, ay, n):
    for _ in range(n):
        state = eb.physics_step(state, jnp.asarray([ax, ay, 0.0]))
    return state


def test_miss_does_not_move():
    s = _push(_state([0.24, 0.0], [[0.32, 0.12]]), 1.0, 0.0, 6)
    assert float(jnp.abs(s.obj_pos[0, 1] - 0.12)) < 1e-5
    assert float(jnp.abs(s.obj_pos[0, 0] - 0.32)) < 1e-5


def test_steady_push_tracks_tip_speed():
    s0 = _state([0.24, 0.0], [[0.32, 0.0]])
    s = _push(s0, 1.0, 0.0, 6)
    disp = float(s.obj_pos[0, 0] - 0.32)
    # MuJoCo measured ~0.091 m over 6 steps (benchmarks/physics_fidelity)
    assert 0.07 < disp < 0.12, disp
    # block sits at touch distance ahead of the tip, never inside it
    gap = float(jnp.linalg.norm(s.obj_pos[0, :2] - s.eef[:2]))
    assert gap >= eb.CONTACT_RADIUS - 1e-5


def test_engagement_transfers_only_overlap():
    # tip lands just inside touch distance: block moves by the small
    # overlap, not by the full tip displacement
    s0 = _state([0.255, 0.0], [[0.32, 0.0]])
    s1 = eb.physics_step(s0, jnp.asarray([1.0, 0.0, 0.0]))
    disp = float(s1.obj_pos[0, 0] - 0.32)
    tip_disp = float(s1.eef[0] - 0.255)
    assert 0.0 < disp < 0.6 * tip_disp, (disp, tip_disp)


def test_glancing_deflects_laterally():
    s = _push(_state([0.24, 0.0], [[0.32, 0.035]]), 1.0, 0.0, 6)
    dx = float(s.obj_pos[0, 0] - 0.32)
    dy = float(s.obj_pos[0, 1] - 0.035)
    assert dy > 0.005, dy            # pushed off the line
    assert dx < 0.09                 # not dragged at full speed


def test_two_block_train_no_interpenetration():
    s = _push(_state([0.25, 0.0], [[0.31, 0.0], [0.38, 0.0]]), 1.0, 0.0, 8)
    x1, x2 = float(s.obj_pos[0, 0]), float(s.obj_pos[1, 0])
    assert x2 > x1 + eb.BLOCK_TOUCH - 1e-4      # train order preserved
    assert x2 - 0.38 > 0.01                     # second block was shoved
    # train pushes slower than a single block (load-shared efficiency)
    single = _push(_state([0.25, 0.0], [[0.31, 0.0]]), 1.0, 0.0, 8)
    assert x1 - 0.31 < float(single.obj_pos[0, 0]) - 0.31 - 1e-3


def test_coasting_after_contact_ends():
    s = _push(_state([0.26, 0.0], [[0.3, 0.0]]), 1.0, 0.0, 2)
    x_stop = float(s.obj_pos[0, 0])
    assert float(jnp.linalg.norm(s.obj_vel[0])) > 1e-4
    s = _push(s, 0.0, 0.0, 4)  # commands stop; block coasts then settles
    x_final = float(s.obj_pos[0, 0])
    assert x_final > x_stop + 0.005
    assert float(jnp.linalg.norm(s.obj_vel[0])) < 1e-3


def test_bystander_stays_put():
    s = _push(_state([0.25, 0.0], [[0.31, 0.0], [0.31, 0.1]]), 1.0, 0.0, 6)
    assert float(jnp.abs(s.obj_pos[1, 1] - 0.1)) < 1e-4


def test_flattened_state_roundtrip_and_legacy():
    from robot_aware_control_tpu.config import Config
    from robot_aware_control_tpu.envs.locobot_push import LocobotPushEnv

    env = LocobotPushEnv(Config(env="LocobotPush"), seed=0)
    env.reset()
    env.step(np.array([1.0, 0.0, 0.0, 0.0, 0.0], np.float32))
    flat = env.get_flattened_state()
    K = env.num_objects
    assert flat.shape[0] == 3 + 5 + 3 * K + 1 + K + 2 * K
    env.set_flattened_state(flat)
    np.testing.assert_allclose(env.get_flattened_state(), flat, rtol=1e-6)
    # pre-obj_vel serialized states load with zero velocity
    env.set_flattened_state(flat[: 3 + 5 + 3 * K + 1 + K])
    assert float(np.abs(np.asarray(env.state.obj_vel)).max()) == 0.0
