"""Learned robot dynamics MLPs.

Redesign of `JointPosPredictor` / `GripperStatePredictor`
(reference: src/prediction/models/dynamics.py:269-338): 3-hidden-layer
(512) ReLU MLPs predicting the *delta* in joint positions / eef state given
the current value and action. Used by the learned-robot-model finetune path
and for mask prediction via the renderer (reference: trainer.py:205-231).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from robot_aware_control_tpu.ops import nn

HIDDEN = 512


def mlp_init(key, din, dout, hidden=HIDDEN):
    ks = jax.random.split(key, 4)
    return {
        "l1": nn.linear_init(ks[0], din, hidden),
        "l2": nn.linear_init(ks[1], hidden, hidden),
        "l3": nn.linear_init(ks[2], hidden, hidden),
        "out": nn.linear_init(ks[3], hidden, dout),
    }


def mlp_apply(params, x):
    h = jax.nn.relu(nn.linear(params["l1"], x))
    h = jax.nn.relu(nn.linear(params["l2"], h))
    h = jax.nn.relu(nn.linear(params["l3"], h))
    return nn.linear(params["out"], h)


def joint_pos_predictor_init(key, cfg):
    """qpos x action -> delta qpos (reference: dynamics.py:269-302)."""
    return mlp_init(key, cfg.robot_joint_dim + cfg.action_dim, cfg.robot_joint_dim)


def joint_pos_predictor(params, joints, action):
    return mlp_apply(params, jnp.concatenate([joints, action], -1))


def gripper_state_predictor_init(key, cfg):
    """eef-state x action -> delta eef-state (reference: dynamics.py:305-338)."""
    return mlp_init(key, cfg.robot_dim + cfg.action_dim, cfg.robot_dim)


def gripper_state_predictor(params, eef_pose, action):
    return mlp_apply(params, jnp.concatenate([eef_pose, action], -1))
