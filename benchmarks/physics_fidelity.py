"""Quantify the analytic quasi-static contact model against the reference
MuJoCo table env.

The TPU framework replaces MuJoCo stepping with the pure-JAX
`physics_step` (robot_aware_control_tpu/envs/base.py) so ground-truth CEM
rollouts vmap on device. This harness cross-validates it: it reproduces
the reference `LocobotTableEnv` stepping faithfully in mujoco 3 — mocap
weld to finger_r, eef delta x0.05 clipped to the workspace, gravity
compensation on the arm dofs, 20 substeps (reference:
src/env/robotics/locobot_table_env.py:186-256, mocap helpers
src/env/robotics/utils.py:43-100, n_substeps
locobot_table_env.py:35) — then pushes object0 along scripted action
sequences in both simulators from matched states and compares object
displacement curves.

Usage: python benchmarks/physics_fidelity.py [--out PATH]
Writes JSON with per-scenario displacement curves and summary errors.
Skips gracefully if mujoco/EGL or the reference checkout is missing.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REFERENCE_ROOT = os.environ.get("REFERENCE_ROOT", "/root/reference")
ASSET = os.path.join(
    REFERENCE_ROOT, "src/env/robotics/assets/locobot/locobot_table.xml"
)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# table env workspace bounds (reference: locobot_table_env.py:85-86)
WS_LOW = np.array([0.2, -0.17, -np.inf])
WS_HIGH = np.array([0.47, 0.17, np.inf])


class MujocoTableOracle:
    """Reference-faithful LocobotTableEnv stepping under mujoco 3."""

    ROBOT_ABOVE_QPOS = [0.0, 0.43050715, 0.2393125, 0.63018035, 0.0]

    def __init__(self):
        import mujoco

        self.mujoco = mujoco
        self.model = mujoco.MjModel.from_xml_path(ASSET)
        self.data = mujoco.MjData(self.model)
        m, mj = self.model, mujoco
        self.jq = []  # qpos addresses of joint_1..5
        self.jd = []  # dof addresses
        for i in range(1, 6):
            jid = mj.mj_name2id(m, mj.mjtObj.mjOBJ_JOINT, f"joint_{i}")
            self.jq.append(m.jnt_qposadr[jid])
            self.jd.append(m.jnt_dofadr[jid])
        oid = mj.mj_name2id(m, mj.mjtObj.mjOBJ_JOINT, "object0:joint")
        self.obj_adr = m.jnt_qposadr[oid]
        self.grip_bid = mj.mj_name2id(m, mj.mjtObj.mjOBJ_BODY, "finger_r")

    # -- reference helpers ------------------------------------------------
    def _reset_mocap_welds(self):
        """(reference: utils.py:64-70; mujoco 3 weld eq_data layout is
        [anchor(3), relpose pos(3) quat(4), torquescale])."""
        m = self.model
        for i in range(m.neq):
            if m.eq_type[i] == self.mujoco.mjtEq.mjEQ_WELD:
                m.eq_data[i, :10] = np.array(
                    [0, 0, 0, 0, 0, 0, 1, 0, 0, 0], float
                )
        self.mujoco.mj_forward(m, self.data)

    def _reset_mocap2body(self):
        """(reference: utils.py:73-100)"""
        self.data.mocap_pos[0] = self.data.xpos[self.grip_bid]
        self.data.mocap_quat[0] = self.data.xquat[self.grip_bid]

    def grip_pos(self):
        return self.data.xpos[self.grip_bid].copy()

    def reset(self, obj_xy, eef_target):
        mj, m, d = self.mujoco, self.model, self.data
        mj.mj_resetData(m, d)
        for adr, q in zip(self.jq, self.ROBOT_ABOVE_QPOS):
            d.qpos[adr] = q
        mj.mj_forward(m, d)
        self._reset_mocap_welds()
        self._reset_mocap2body()
        # park the object clear of the arm's approach path, drive the eef
        # to the start pose (reference _move, locobot_table_env.py:159-166),
        # then teleport the object to its scenario pose and settle
        d.qpos[self.obj_adr : self.obj_adr + 3] = [0.45, -0.15, 0.075]
        mj.mj_forward(m, d)
        for _ in range(100):
            err = eef_target - self.grip_pos()
            if np.linalg.norm(err) < 0.01:
                break
            self.step(err / 0.05, clip_ws=False)
        d.qpos[self.obj_adr : self.obj_adr + 3] = [*obj_xy, 0.075]
        d.qpos[self.obj_adr + 3 : self.obj_adr + 7] = [1, 0, 0, 0]
        d.qvel[:] = 0
        mj.mj_forward(m, d)

    def step(self, action3, clip_ws=True):
        """(reference: locobot_table_env.py:186-231)"""
        mj, m, d = self.mujoco, self.model, self.data
        action = np.clip(np.asarray(action3, float), -1, 1)
        if clip_ws:
            curr = self.grip_pos()
            nxt = np.clip(curr + action * 0.05, WS_LOW, WS_HIGH)
            action = (nxt - curr) / 0.05
        # mocap_set_action with pos_ctrl*0.05 and rot_ctrl [1,0,1,0]
        self._reset_mocap2body()
        d.mocap_pos[0] = d.mocap_pos[0] + action * 0.05
        d.mocap_quat[0] = d.mocap_quat[0] + np.array([1.0, 0.0, 1.0, 0.0])
        # gravity compensation on arm dofs
        d.qfrc_applied[self.jd] = d.qfrc_bias[self.jd]
        mj.mj_step(m, d, nstep=20)

    def obj_xy(self):
        return self.data.qpos[self.obj_adr : self.obj_adr + 2].copy()


def analytic_rollout(eef0, obj_xy, actions):
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except RuntimeError:
        pass
    import jax.numpy as jnp

    from robot_aware_control_tpu.envs import base as eb

    # same planar geometry; our table lives at TABLE_Z=0.1 so shift z only
    z = eb.TABLE_Z + 0.02
    state = eb.SimState(
        eef=jnp.asarray([eef0[0], eef0[1], z], jnp.float32),
        qpos=jnp.zeros(5, jnp.float32),
        obj_pos=jnp.asarray([[obj_xy[0], obj_xy[1], z]], jnp.float32),
        gripper=jnp.asarray(1.0, jnp.float32),
        attached=jnp.zeros(1, jnp.float32),
    )
    traj = []
    for a in actions:
        state = eb.physics_step(
            state, jnp.asarray([a[0], a[1], 0.0], jnp.float32)
        )
        traj.append(np.asarray(state.obj_pos[0, :2]))
    return np.stack(traj)


SCENARIOS = {
    # head-on push +x through the object
    "head_on_x": {"obj": [0.32, 0.0], "eef": [0.24, 0.0, 0.07],
                  "actions": [[1, 0]] * 6},
    # push +y
    "head_on_y": {"obj": [0.3, 0.06], "eef": [0.3, -0.02, 0.07],
                  "actions": [[0, 1]] * 6},
    # glancing contact (eef offset from object center line)
    "glancing": {"obj": [0.32, 0.025], "eef": [0.24, 0.0, 0.07],
                 "actions": [[1, 0]] * 6},
    # diagonal push
    "diagonal": {"obj": [0.31, 0.03], "eef": [0.26, -0.02, 0.07],
                 "actions": [[0.7, 0.7]] * 6},
    # miss: eef passes clear of the object -> zero displacement expected
    "miss": {"obj": [0.32, 0.12], "eef": [0.24, 0.0, 0.07],
             "actions": [[1, 0]] * 6},
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="benchmarks/physics_fidelity.json")
    args = ap.parse_args()

    os.environ.setdefault("MUJOCO_GL", "egl")
    if not os.path.isfile(ASSET):
        print(json.dumps({"skipped": f"no reference asset {ASSET}"}))
        return
    try:
        import mujoco  # noqa: F401
    except Exception as e:  # pragma: no cover
        print(json.dumps({"skipped": f"mujoco unavailable: {e}"}))
        return

    oracle = MujocoTableOracle()
    results = {}
    errs, ratios = [], []
    for name, sc in SCENARIOS.items():
        oracle.reset(np.array(sc["obj"]), np.array(sc["eef"]))
        start = oracle.obj_xy()
        mj_traj = []
        for a in sc["actions"]:
            oracle.step([a[0], a[1], 0.0])
            mj_traj.append(oracle.obj_xy() - start)
        mj_traj = np.stack(mj_traj)
        an_traj = analytic_rollout(sc["eef"], sc["obj"], sc["actions"])
        an_traj = an_traj - np.array(sc["obj"])
        err = np.abs(mj_traj - an_traj).max(-1)
        mj_final = float(np.linalg.norm(mj_traj[-1]))
        an_final = float(np.linalg.norm(an_traj[-1]))
        results[name] = {
            "mj_disp": [[float(x) for x in r] for r in mj_traj],
            "analytic_disp": [[float(x) for x in r] for r in an_traj],
            "max_step_err_m": float(err.max()),
            "mj_final_disp_m": mj_final,
            "analytic_final_disp_m": an_final,
        }
        errs.append(float(err.max()))
        if mj_final > 5e-3:
            ratios.append(an_final / mj_final)
    results["summary"] = {
        "max_abs_err_m": max(errs),
        "mean_final_ratio": float(np.mean(ratios)) if ratios else None,
        "n_scenarios": len(SCENARIOS),
    }
    print(json.dumps(results["summary"], indent=2))
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
