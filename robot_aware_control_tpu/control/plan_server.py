"""Planning-as-a-service: a warm CEM planner behind a TCP socket.

The reference runs CEM inline in the ROS controller process and re-pays
model construction + GPU warm-up per run (reference: locobot_rospkg/nodes/
visual_MPC_controller.py:319-340 calls CEMPolicy.get_action in-process;
src/cem/cem.py:49-55 builds the model per policy). The TPU-native
deployment splits that: ONE server process on the TPU host holds the
checkpoint and the jit-compiled whole-CEM device program (compiled once,
reused for every request), and any number of robot-side clients send
(start, goal) and receive the planned action sequence. Wire protocol is
the robot bridge's JSON-header + float32-payload framing
(control/real_robot.py), extended to multi-array messages, so a client
needs only numpy + the stdlib — no JAX, no checkpoint, no TPU.

`RemotePolicy` is a drop-in for CEMPolicy's `get_action` host API, so
`VisualMPCController`/`EpisodeRunner` can plan remotely by passing
`policy_cls=RemotePolicy`-style factories.
"""

from __future__ import annotations

import socket
import threading
import time
from typing import Optional

import numpy as np

from robot_aware_control_tpu.config import Config
from robot_aware_control_tpu.control.real_robot import _recv_msg, _send_msg
from robot_aware_control_tpu.utils.state import DemoGoalState, State


# --------------------------------------------------------------------------
# Multi-array framing on top of the bridge protocol: ONE message whose
# payload is the concatenation of float32-flattened arrays in sorted key
# order; the header carries {"arrays": {name: shape}} for reassembly.
# --------------------------------------------------------------------------

def _send_arrays(sock, header: dict, arrays: dict):
    arrays = {k: np.ascontiguousarray(v, np.float32)
              for k, v in arrays.items() if v is not None}
    header = dict(header, arrays={k: list(v.shape) for k, v in arrays.items()})
    blob = b"".join(arrays[k].tobytes() for k in sorted(arrays))
    _send_msg(sock, dict(header, shape=[len(blob) // 4]),
              np.frombuffer(blob, np.float32) if blob else None)


def _recv_arrays(sock):
    header, payload = _recv_msg(sock)
    arrays = {}
    off = 0
    for k in sorted(header.get("arrays", {})):
        shape = header["arrays"][k]
        n = int(np.prod(shape)) if shape else 1
        arrays[k] = payload[off:off + n].reshape(shape)
        off += n
    return header, arrays


class PlanServer:
    """TPU-host side: holds one warm policy and serves plan requests.

    Commands: "ping" (liveness), "info" (plan config), "plan"
    (start/goal arrays -> action plan), "close" (end this client
    session), "shutdown" (stop the server). One client at a time —
    planning is a single device anyway; queued clients block in accept.
    """

    def __init__(self, cfg: Config, params, bn, policy_cls=None,
                 host: str = "127.0.0.1", port: int = 0, **policy_kw):
        from robot_aware_control_tpu.planning.cem import CEMPolicy

        self.cfg = cfg
        self.policy = (policy_cls or CEMPolicy)(cfg, params, bn, **policy_kw)
        self._srv = socket.create_server((host, port))
        self.address = self._srv.getsockname()
        self._shutdown = False
        self._requests = 0

    # --- request handling -------------------------------------------------
    def _handle_plan(self, header: dict, arrays: dict) -> tuple:
        start = State(
            img=arrays["start_img"],
            state=arrays["start_state"],
            qpos=arrays.get("start_qpos"),
        )
        masks = arrays.get("goal_masks")
        states = arrays.get("goal_states")
        goal = DemoGoalState(
            imgs=list(arrays["goal_imgs"]),
            masks=None if masks is None else list(masks),
            states=None if states is None else list(states),
        )
        t0 = time.perf_counter()
        plan = self.policy.get_action(
            start, goal,
            ep_num=int(header.get("ep_num", 0)),
            step=int(header.get("step", 0)),
            opt_traj=arrays.get("opt_traj"),
        )
        return np.asarray(plan, np.float32), time.perf_counter() - t0

    def serve_once(self):
        """Serve one client connection to completion. Returns False once a
        client has requested server shutdown."""
        conn, _ = self._srv.accept()
        try:
            while True:
                header, arrays = _recv_arrays(conn)
                cmd = header.get("cmd")
                if cmd == "close":
                    _send_msg(conn, {"ok": True})
                    return not self._shutdown
                if cmd == "shutdown":
                    self._shutdown = True
                    _send_msg(conn, {"ok": True})
                    return False
                try:
                    if cmd == "ping":
                        _send_msg(conn, {"ok": True, "requests": self._requests})
                    elif cmd == "info":
                        p = self.policy
                        _send_msg(conn, {
                            "ok": True,
                            "model": self.cfg.model,
                            "horizon": p.horizon,
                            "opt_iter": p.opt_iter,
                            "action_candidates": p.num_candidates,
                            "action_dim": p.action_dim,
                            "plan_quantize": self.cfg.plan_quantize,
                            "requests": self._requests,
                        })
                    elif cmd == "plan":
                        plan, dt = self._handle_plan(header, arrays)
                        self._requests += 1
                        _send_arrays(conn, {"ok": True,
                                            "plan_s": round(dt, 4)},
                                     {"plan": plan})
                    else:
                        _send_msg(conn, {"ok": False,
                                         "error": f"unknown cmd {cmd}"})
                except Exception as e:  # keep serving after a bad request
                    _send_msg(conn, {"ok": False, "error": str(e)})
        except (ConnectionError, OSError):
            return not self._shutdown  # client vanished; next accept
        finally:
            conn.close()

    def serve_forever(self):
        try:
            while self.serve_once():
                pass
        except OSError:
            pass  # listening socket closed from another thread

    def start(self) -> threading.Thread:
        """serve_forever on a daemon thread (tests / embedding)."""
        t = threading.Thread(target=self.serve_forever, daemon=True)
        t.start()
        return t

    def close(self):
        self._srv.close()


class PlanClient:
    """Robot-host side: numpy + stdlib only."""

    def __init__(self, host: str, port: int, timeout: float = 120.0):
        self._sock = socket.create_connection((host, port), timeout=timeout)
        self.last_plan_s: Optional[float] = None

    def _call(self, cmd: str, header: dict = None, arrays: dict = None):
        _send_arrays(self._sock, dict(header or {}, cmd=cmd), arrays or {})
        resp, out = _recv_arrays(self._sock)
        if not resp.get("ok"):
            raise RuntimeError(f"plan server error for {cmd}: "
                               f"{resp.get('error')}")
        return resp, out

    def ping(self) -> dict:
        return self._call("ping")[0]

    def info(self) -> dict:
        return self._call("info")[0]

    def plan(self, start: State, goal: DemoGoalState, ep_num: int = 0,
             step: int = 0, opt_traj=None) -> np.ndarray:
        arrays = {
            "start_img": np.asarray(start.img, np.float32),
            "start_state": np.asarray(start.state, np.float32),
            "goal_imgs": np.stack(
                [np.asarray(g, np.float32) for g in goal.imgs]),
        }
        if start.qpos is not None:
            arrays["start_qpos"] = np.asarray(start.qpos, np.float32)
        if goal.masks is not None:
            arrays["goal_masks"] = np.stack(
                [np.asarray(m, np.float32) for m in goal.masks])
        if goal.states is not None:
            arrays["goal_states"] = np.stack(
                [np.asarray(s, np.float32) for s in goal.states])
        if opt_traj is not None:
            arrays["opt_traj"] = np.asarray(opt_traj, np.float32)
        resp, out = self._call("plan", {"ep_num": ep_num, "step": step},
                               arrays)
        self.last_plan_s = resp.get("plan_s")
        return out["plan"]

    def close(self, shutdown_server: bool = False):
        try:
            self._call("shutdown" if shutdown_server else "close")
        finally:
            self._sock.close()


class RemotePolicy:
    """get_action-compatible facade over PlanClient, so EpisodeRunner /
    VisualMPCController can plan against a remote server unchanged
    (the in-process analog is CEMPolicy, planning/cem.py:146)."""

    def __init__(self, host: str, port: int, timeout: float = 120.0):
        self._client = PlanClient(host, port, timeout=timeout)

    def get_action(self, start: State, goal: DemoGoalState, ep_num=0,
                   step=0, opt_traj=None, rng=None):
        if rng is not None:
            raise ValueError("RemotePolicy: rng is server-side (seeded from "
                             "cfg.seed + ep_num/step, planning/cem.py:171)")
        return self._client.plan(start, goal, ep_num=ep_num, step=step,
                                 opt_traj=opt_traj)

    def close(self, shutdown_server: bool = False):
        self._client.close(shutdown_server=shutdown_server)


def main(argv=None):
    """`rac-plan-server --dynamics_model_ckpt ... --plan_server_port N`:
    load the checkpoint, compile once, serve until shutdown."""
    import jax

    from robot_aware_control_tpu.config import argparser
    from robot_aware_control_tpu.models.registry import get_model
    from robot_aware_control_tpu.planning.cem import (
        CEMPolicy, PickCEMPolicy, PushCEMPolicy)
    from robot_aware_control_tpu.training import checkpoint as _ckpt

    cfg, _ = argparser(argv)
    params, bn = get_model(cfg).init(jax.random.PRNGKey(cfg.seed), cfg)
    if cfg.dynamics_model_ckpt:
        trees, _ = _ckpt.load_checkpoint(
            cfg.dynamics_model_ckpt, {"params": params, "bn": bn})
        params, bn = trees["params"], trees["bn"]
    policy_cls = {"LocobotPick": PickCEMPolicy,
                  "LocobotPush": PushCEMPolicy,
                  "LocobotTable": PushCEMPolicy}.get(cfg.env, CEMPolicy)
    server = PlanServer(cfg, params, bn, policy_cls=policy_cls,
                        host=cfg.plan_server_host, port=cfg.plan_server_port)
    print(f"plan server: {cfg.model} policy={policy_cls.__name__} "
          f"listening on {server.address[0]}:{server.address[1]}",
          flush=True)
    server.serve_forever()
    server.close()


if __name__ == "__main__":
    main()
