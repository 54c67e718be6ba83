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
                 host: str = "127.0.0.1", port: int = 0,
                 batch_plans: bool = True, **policy_kw):
        from robot_aware_control_tpu.planning.cem import CEMPolicy

        self.cfg = cfg
        # Served-plan consistency: with micro-batching on, the single-path
        # and batched programs must trace the SAME cells, or a request's
        # plan would depend on what else happened to be queued (the fused
        # Pallas ConvLSTM cell doesn't admit the batched program's extra
        # vmap axis — planning/cem.py:get_action_batched). A batching
        # server therefore plans with the XLA cells on BOTH paths;
        # --fused_lstm serving is single-client-only (batch_plans=False).
        plan_cfg = cfg
        self.consistent_cells = bool(batch_plans) and cfg.fused_lstm
        if self.consistent_cells:
            plan_cfg = cfg.replace(fused_lstm=False)
        self.policy = (policy_cls or CEMPolicy)(plan_cfg, params, bn,
                                                **policy_kw)
        self._srv = socket.create_server((host, port))
        self.address = self._srv.getsockname()
        self._shutdown = False
        self._requests = 0
        # one device program; concurrent client threads serialize planning
        self._plan_lock = threading.Lock()
        # leader-follower micro-batching: requests that queue up behind an
        # in-flight plan are planned TOGETHER in one vmapped device program
        # (CEMPolicy.get_action_batched) by whichever handler thread grabs
        # the plan lock next
        self._batch_plans = (batch_plans
                             and hasattr(self.policy, "get_action_batched"))
        self._q_lock = threading.Lock()
        self._q: list = []

    # --- request handling -------------------------------------------------
    @staticmethod
    def _decode_request(header: dict, arrays: dict):
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
        return (start, goal, int(header.get("ep_num", 0)),
                int(header.get("step", 0)), arrays.get("opt_traj"))

    def _handle_plan(self, header: dict, arrays: dict) -> tuple:
        """Plan one request. With batching enabled, the handler thread that
        wins the plan lock drains every queued request and plans them in
        one vmapped program; the others wake up to a filled slot."""
        if not self._batch_plans:
            with self._plan_lock:
                start, goal, ep, st, opt = self._decode_request(header, arrays)
                t0 = time.perf_counter()
                plan = self.policy.get_action(start, goal, ep_num=ep,
                                              step=st, opt_traj=opt)
                self._requests += 1
                return (np.asarray(plan, np.float32),
                        time.perf_counter() - t0, 1)

        slot = {"done": threading.Event()}
        with self._q_lock:
            self._q.append((header, arrays, slot))
        with self._plan_lock:
            if not slot["done"].is_set():
                with self._q_lock:
                    batch, self._q = self._q, []
                self._plan_batch(batch)
        slot["done"].wait()
        if "error" in slot:
            raise RuntimeError(slot["error"])
        return slot["plan"], slot["dt"], slot["batch"]

    def _plan_batch(self, batch: list):
        """Execute a drained request batch, grouped by goal structure
        (get_action_batched requires consistent masks/states presence)."""
        groups: dict = {}
        for header, arrays, slot in batch:
            key = ("goal_masks" in arrays, "goal_states" in arrays)
            groups.setdefault(key, []).append((header, arrays, slot))
        for reqs in groups.values():
            t0 = time.perf_counter()
            try:
                dec = [self._decode_request(h, a) for h, a, _ in reqs]
                plans = self.policy.get_action_batched(
                    [d[0] for d in dec], [d[1] for d in dec],
                    ep_nums=[d[2] for d in dec], steps=[d[3] for d in dec],
                    opt_trajs=[d[4] for d in dec],
                )
                dt = time.perf_counter() - t0
                for (_, _, slot), plan in zip(reqs, plans):
                    slot["plan"] = np.asarray(plan, np.float32)
                    slot["dt"] = dt
                    slot["batch"] = len(reqs)
                self._requests += len(reqs)
            except Exception as e:
                for _, _, slot in reqs:
                    slot["error"] = str(e)
            finally:
                for _, _, slot in reqs:
                    slot["done"].set()

    def _handle_conn(self, conn):
        """One client session: request/response until close/shutdown/EOF."""
        try:
            while True:
                header, arrays = _recv_arrays(conn)
                cmd = header.get("cmd")
                if cmd == "close":
                    _send_msg(conn, {"ok": True})
                    return
                if cmd == "shutdown":
                    self._shutdown = True
                    _send_msg(conn, {"ok": True})
                    # unblock the accept loop: close() alone does NOT wake
                    # a thread blocked in accept() on Linux — shutdown the
                    # listening socket first
                    try:
                        self._srv.shutdown(socket.SHUT_RDWR)
                    except OSError:
                        pass
                    self._srv.close()
                    return
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
                            "fused_lstm": self.policy.cfg.fused_lstm,
                            "batch_plans": self._batch_plans,
                            "requests": self._requests,
                        })
                    elif cmd == "plan":
                        plan, dt, nbatch = self._handle_plan(header, arrays)
                        _send_arrays(conn, {"ok": True,
                                            "plan_s": round(dt, 4),
                                            "batched": nbatch},
                                     {"plan": plan})
                    else:
                        _send_msg(conn, {"ok": False,
                                         "error": f"unknown cmd {cmd}"})
                except Exception as e:  # keep serving after a bad request
                    _send_msg(conn, {"ok": False, "error": str(e)})
        except (ConnectionError, OSError):
            pass  # client vanished
        finally:
            conn.close()

    def serve_once(self):
        """Serve one client connection to completion. Returns False once a
        client has requested server shutdown."""
        conn, _ = self._srv.accept()
        self._handle_conn(conn)
        return not self._shutdown

    def serve_forever(self, concurrent: bool = True):
        """Accept loop. With `concurrent`, each client gets a handler
        thread (multiple robots share the planner; plans serialize on the
        single device program via _plan_lock)."""
        try:
            while not self._shutdown:
                conn, _ = self._srv.accept()
                if concurrent:
                    threading.Thread(target=self._handle_conn, args=(conn,),
                                     daemon=True).start()
                else:
                    self._handle_conn(conn)
        except OSError:
            pass  # listening socket closed (shutdown or close())

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
        self.last_batched: Optional[int] = None  # co-planned request count

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
        self.last_batched = resp.get("batched")
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


def build_server(cfg: "Config") -> "PlanServer":
    """Build the listening PlanServer a config describes: checkpoint load,
    env-keyed policy class, --plan_server_host/--plan_server_port bind.
    Split from main() so the wiring is testable without serve_forever()."""
    import jax

    from robot_aware_control_tpu.models.registry import get_model
    from robot_aware_control_tpu.planning.cem import (
        CEMPolicy, PickCEMPolicy, PushCEMPolicy)
    from robot_aware_control_tpu.training import checkpoint as _ckpt

    params, bn = get_model(cfg).init(jax.random.PRNGKey(cfg.seed), cfg)
    if cfg.dynamics_model_ckpt:
        trees, _ = _ckpt.load_checkpoint(
            cfg.dynamics_model_ckpt, {"params": params, "bn": bn})
        params, bn = trees["params"], trees["bn"]
    policy_cls = {"LocobotPick": PickCEMPolicy,
                  "LocobotPush": PushCEMPolicy,
                  "LocobotTable": PushCEMPolicy}.get(cfg.env, CEMPolicy)
    return PlanServer(cfg, params, bn, policy_cls=policy_cls,
                      host=cfg.plan_server_host, port=cfg.plan_server_port)


def main(argv=None):
    """`rac-plan-server --dynamics_model_ckpt ... --plan_server_port N`:
    load the checkpoint, compile once, serve until shutdown."""
    from robot_aware_control_tpu.config import argparser

    cfg, _ = argparser(argv)
    server = build_server(cfg)
    policy_cls = type(server.policy)
    print(f"plan server: {cfg.model} policy={policy_cls.__name__} "
          f"listening on {server.address[0]}:{server.address[1]}",
          flush=True)
    # pay the jit compile before the first robot connects, so request
    # latency is the warm plan time from request #1
    t0 = time.perf_counter()
    h, w = cfg.image_height, cfg.image_width
    from robot_aware_control_tpu.data.norm import LOCOBOT_LOW

    # states normalize against the (5-d) locobot-frame bounds — the
    # reference keeps eef states in that frame for every robot
    # (trajectory_sampler.py:94-98) — so warm with that dimensionality
    state_dim = min(cfg.robot_dim, len(LOCOBOT_LOW))
    server.policy.get_action(
        State(img=np.zeros((h, w, 3), np.float32),
              state=np.zeros(state_dim, np.float32),
              qpos=np.zeros(cfg.robot_joint_dim, np.float32)),
        DemoGoalState(imgs=[np.zeros((h, w, 3), np.float32)],
                      masks=[np.zeros((h, w), np.float32)]),
        ep_num=0, step=0)
    print(f"plan server: warm (compile {time.perf_counter() - t0:.1f}s)",
          flush=True)
    server.serve_forever()
    server.close()


if __name__ == "__main__":
    main()
