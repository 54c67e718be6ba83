"""Measure per-robot arm geometry from the reference MJCF assets.

The TPU framework renders robot masks with analytic capsules attached to a
serial kinematic chain (robot_aware_control_tpu/robot/kinematic_chain.py)
instead of MuJoCo segmentation renders (reference:
src/env/robotics/masks/base_mask_env.py:24-82). The chain kinematics and
capsule geometry are *measurements* of the reference MJCF models
(src/env/robotics/assets/{sawyer,widowx,baxter,franka,kuka,fetch,wx250s}),
exactly like the shipped camera extrinsics are measurements of the lab rigs:

- joint kinematics: world anchor position + world axis of every driven
  joint at qpos=0 (product-of-exponentials screw data — evaluating the
  chain recursively with these zero-pose quantities reproduces MuJoCo FK
  for any qpos),
- silhouette geometry: one capsule fitted per robot geom (the same geom
  set the reference's per-robot `_is_robot_geom` filters select, e.g.
  sawyer_mask_env.py:135-148), expressed in the frame of the deepest
  driven-joint ancestor so it rides the chain; geoms above no driven
  joint (pedestals, torsos, baxter's other arm at its zero pose) become
  static world capsules.

Writes robot_aware_control_tpu/robot/_chain_data.py. Requires mujoco and
the reference checkout; the baked output is committed so the framework
itself never needs either.

Usage: python benchmarks/extract_chain_geometry.py [--out PATH]
"""

from __future__ import annotations

import argparse
import os
import re

import numpy as np

REFERENCE_ROOT = os.environ.get("REFERENCE_ROOT", "/root/reference")
ASSETS = os.path.join(REFERENCE_ROOT, "src/env/robotics/assets")

IGNORE = {"base_link_vis", "base_link_col", "head_vis"}


def _any(*subs):
    return lambda n: not (n in IGNORE) and any(s in n for s in subs)


# (xml path, driven joints, geom-name filter replicating _is_robot_geom,
#  native mask render size (W, H) from each reference mask env __init__)
SPECS = {
    "sawyer": (
        "sawyer/robot.xml",
        [f"right_j{i}" for i in range(7)],
        lambda n: n not in {"base_vis", "base_col", "head_vis"}
        and any(s in n for s in ("vis", "col", "gripper", "wsg", "right")),
        (85, 64),
    ),
    "widowx": (
        "widowx/robot.xml",
        [f"joint_{i}" for i in range(1, 6)] + ["gripper_revolute_joint"],
        _any("vis", "col", "gripper", "mesh"),
        (85, 64),
    ),
    "baxter": (
        "baxter/robot.xml",
        [f"left_{x}" for x in ("s0", "s1", "e0", "e1", "w0", "w1", "w2")],
        _any("vis", "col", "gripper"),
        (85, 64),
    ),
    "baxter_right": (
        "baxter/robot.xml",
        [f"right_{x}" for x in ("s0", "s1", "e0", "e1", "w0", "w1", "w2")],
        _any("vis", "col", "gripper"),
        (85, 64),
    ),
    "franka": (
        "franka/robot.xml",
        [f"joint{i}" for i in range(1, 8)],
        _any("vis", "col", "gripper", "finger"),
        (64, 48),
    ),
    "kuka": (
        "kuka/robot.xml",
        [f"joint_{i}" for i in range(1, 8)],
        _any("vis", "col", "gripper", "finger"),
        (160, 120),
    ),
    "fetch": (
        "fetch/robot_mask.xml",
        [
            "robot0:shoulder_pan_joint", "robot0:shoulder_lift_joint",
            "robot0:upperarm_roll_joint", "robot0:elbow_flex_joint",
            "robot0:forearm_roll_joint", "robot0:wrist_flex_joint",
            "robot0:wrist_roll_joint",
        ],
        _any("vis", "col", "gripper", "finger"),
        (320, 240),
    ),
    # wx250s_mask_env.py:15 sets self.thick = True -> every geom counts,
    # named or not
    "wx250s": (
        "wx250s/model.xml",
        ["waist", "shoulder", "elbow", "forearm_roll", "wrist_angle",
         "wrist_rotate"],
        None,
        (64, 48),
    ),
}


def load_model(xml_path):
    import mujoco

    path = os.path.join(ASSETS, xml_path)
    try:
        return mujoco.MjModel.from_xml_path(path)
    except Exception:
        # fetch's robot_mask.xml carries a mocap equality constraint that
        # mujoco 3 rejects; the mask pipeline never simulates, so drop the
        # <equality> block (and give it the main_cam the render call asks
        # for, which the shipped XML lacks).
        with open(path) as f:
            xml = f.read()
        xml = re.sub(r"<equality>.*?</equality>", "", xml, flags=re.S)
        if "main_cam" not in xml:
            xml = xml.replace(
                "<worldbody>",
                '<worldbody><camera fovy="43.3" name="main_cam" '
                'pos="1.2 0.3 0.8"/>',
                1,
            )
        return mujoco.MjModel.from_xml_string(
            xml, assets=_collect_assets(os.path.dirname(path))
        )


def _collect_assets(model_dir):
    # mirror the XML's compiler dirs (meshdir="../stls/fetch",
    # texturedir="../textures"), keyed by basename as mujoco expects
    out = {}
    for root in (os.path.join(ASSETS, "stls", "fetch"),
                 os.path.join(ASSETS, "textures")):
        if not os.path.isdir(root):
            continue
        for p in sorted(os.listdir(root)):
            full = os.path.join(root, p)
            if os.path.isfile(full):
                out[p] = open(full, "rb").read()
    return out


def fit_capsule(verts):
    """Fit one capsule to a world-frame vertex cloud: principal axis,
    extent along it, and an 85th-percentile perpendicular radius (the
    mask consumers tune radii afterwards against segmentation renders)."""
    c = verts.mean(0)
    V = verts - c
    if len(verts) < 4:
        r = float(np.linalg.norm(V, axis=1).max() if len(V) else 0.01)
        return c, c, max(r, 0.005)
    _, _, vt = np.linalg.svd(V, full_matrices=False)
    axis = vt[0]
    t = V @ axis
    perp = np.linalg.norm(V - t[:, None] * axis[None], axis=1)
    r = float(np.percentile(perp, 85.0))
    r = max(r, 0.005)
    lo, hi = float(t.min()), float(t.max())
    # pull endpoints in so the spherical caps stay inside the hull
    shrink = min(r, 0.25 * (hi - lo))
    a = c + axis * (lo + shrink)
    b = c + axis * (hi - shrink)
    return a, b, r


def fit_capsules(verts):
    """Fit 1-2 capsules to a mesh vertex cloud. Stubby clouds (axial
    extent < 3x radius — gripper bodies, boxy housings) are split along
    their second principal axis into two thinner side-by-side capsules,
    which tracks a box silhouette far better than one fat circle."""
    a, b, r = fit_capsule(verts)
    length = float(np.linalg.norm(b - a))
    if len(verts) < 100 or length >= 3.0 * r:
        return [(a, b, r)]
    c = verts.mean(0)
    _, _, vt = np.linalg.svd(verts - c, full_matrices=False)
    side = (verts - c) @ vt[1]
    left, right = verts[side < 0], verts[side >= 0]
    if len(left) < 8 or len(right) < 8:
        return [(a, b, r)]
    return [fit_capsule(left), fit_capsule(right)]


def geom_capsules(m, d, g):
    """World-frame capsule list [(a, b, r), ...] for geom id g at qpos=0."""
    import mujoco

    pos = d.geom_xpos[g]
    R = d.geom_xmat[g].reshape(3, 3)
    size = m.geom_size[g]
    gt = m.geom_type[g]
    T = mujoco.mjtGeom
    if gt == T.mjGEOM_SPHERE:
        return [(pos.copy(), pos.copy(), float(size[0]))]
    if gt in (T.mjGEOM_CAPSULE, T.mjGEOM_CYLINDER):
        h = size[1] * R[:, 2]
        return [(pos - h, pos + h, float(size[0]))]
    if gt == T.mjGEOM_BOX:
        k = int(np.argmax(size))
        h = size[k] * R[:, k]
        rest = [size[i] for i in range(3) if i != k]
        return [(pos - h, pos + h, float(np.hypot(*rest) * 0.75))]
    if gt == T.mjGEOM_MESH:
        mid = m.geom_dataid[g]
        adr, num = m.mesh_vertadr[mid], m.mesh_vertnum[mid]
        verts = m.mesh_vert[adr: adr + num].reshape(-1, 3)
        world = verts @ R.T + pos
        return fit_capsules(world)
    # planes/ellipsoids don't appear in these arms
    return [(pos.copy(), pos.copy(), float(size[0]))]


def extract(robot):
    import mujoco

    xml, joints, geom_ok, native = SPECS[robot]
    m = load_model(xml)
    d = mujoco.MjData(m)
    d.qpos[:] = 0.0
    mujoco.mj_forward(m, d)

    jids = []
    for j in joints:
        jid = mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_JOINT, j)
        assert jid >= 0, f"{robot}: joint {j} missing"
        jids.append(jid)
    anchors = np.array([d.xanchor[j] for j in jids])
    axes = np.array([d.xaxis[j] for j in jids])
    jnt_range = np.array([m.jnt_range[j] for j in jids])
    # unlimited joints read (0, 0) — give them a full revolute range
    unlimited = (jnt_range[:, 0] == 0) & (jnt_range[:, 1] == 0)
    jnt_range[unlimited] = (-np.pi, np.pi)

    # driven-joint depth per body: walk each geom's body chain upward and
    # take the deepest driven joint encountered (serial arms: one joint
    # per body), else -1 (static pedestal/torso/other-arm geometry)
    driven_of_body = {}
    for b in range(m.nbody):
        adr, num = m.body_jntadr[b], m.body_jntnum[b]
        for j in range(adr, adr + num):
            if j in jids:
                driven_of_body[b] = jids.index(j)

    caps = []
    names = []
    for g in range(m.ngeom):
        name = mujoco.mj_id2name(m, mujoco.mjtObj.mjOBJ_GEOM, g)
        if geom_ok is None:  # thick env: all geoms
            name = name or f"geom{g}"
        elif name is None or not geom_ok(name):
            continue
        b = m.geom_bodyid[g]
        attach = -1
        while b != 0:
            if b in driven_of_body:
                attach = driven_of_body[b]
                break
            b = m.body_parentid[b]
        for a, bb, r in geom_capsules(m, d, g):
            caps.append((attach, a, bb, r))
            names.append(name)

    # occluder capsules: every geom the mask filter EXCLUDES still hides
    # mask geoms behind it in the reference's segmentation render (the
    # z-buffer assigns those pixels to the occluding geom, so they drop
    # out of the isin(ok_ids) mask — base_mask_env.py:31-37). This is
    # what makes fetch's gripper-only mask (fetch_mask_env.py:120-131)
    # vanish when the arm/torso sits between gripper and camera. Fit the
    # same capsules for those geoms so the analytic renderer can depth-
    # test them.
    occ = []
    occ_names = []
    if geom_ok is not None:
        T = mujoco.mjtGeom
        for g in range(m.ngeom):
            if m.geom_type[g] == T.mjGEOM_PLANE:
                continue  # floors aren't part of the robot body
            name = mujoco.mj_id2name(m, mujoco.mjtObj.mjOBJ_GEOM, g)
            if name is not None and geom_ok(name):
                continue  # mask geom, not an occluder
            b = m.geom_bodyid[g]
            attach = -1
            while b != 0:
                if b in driven_of_body:
                    attach = driven_of_body[b]
                    break
                b = m.body_parentid[b]
            for a, bb, r in geom_capsules(m, d, g):
                occ.append((attach, a, bb, r))
                occ_names.append(name or f"geom{g}")

    # eef tip: the furthest capsule endpoint on the last driven link
    last = max(c[0] for c in caps)
    best, eef = -1.0, anchors[-1]
    for attach, a, bb, r in caps:
        if attach != last:
            continue
        for p in (a, bb):
            dist = np.linalg.norm(p - anchors[-1])
            if dist > best:
                best, eef = dist, p
    fovy = 43.3  # every reference main_cam (e.g. sawyer/robot.xml:34)
    return {
        "anchors": anchors,
        "axes": axes,
        "jnt_range": jnt_range,
        "eef": np.asarray(eef),
        "caps_attach": np.array([c[0] for c in caps], np.int32),
        "caps_a": np.array([c[1] for c in caps]),
        "caps_b": np.array([c[2] for c in caps]),
        "caps_r": np.array([c[3] for c in caps]),
        "geom_names": names,
        "occ_attach": np.array([c[0] for c in occ], np.int32),
        "occ_a": np.array([c[1] for c in occ]).reshape(-1, 3),
        "occ_b": np.array([c[2] for c in occ]).reshape(-1, 3),
        "occ_r": np.array([c[3] for c in occ]),
        "occ_names": occ_names,
        "native_size": native,
        "fovy": fovy,
    }


def fmt_arr(a, indent=8):
    a = np.asarray(a)
    if a.dtype.kind == "i":
        body = np.array2string(a, separator=", ", threshold=10**6)
    else:
        body = np.array2string(
            np.round(a.astype(np.float64), 6), separator=", ",
            threshold=10**6, floatmode="maxprec", precision=6,
        )
    pad = " " * indent
    return body.replace("\n", "\n" + pad)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--out",
        default=os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "robot_aware_control_tpu/robot/_chain_data.py",
        ),
    )
    args = ap.parse_args()

    blocks = []
    for robot in SPECS:
        data = extract(robot)
        print(
            f"{robot}: {len(data['axes'])} joints, "
            f"{len(data['caps_r'])} capsules "
            f"({int((data['caps_attach'] < 0).sum())} static), "
            f"{len(data['occ_r'])} occluders, "
            f"eef={np.round(data['eef'], 3).tolist()}"
        )
        entries = [f'    "{robot}": {{']
        for key in ("anchors", "axes", "jnt_range", "eef", "caps_attach",
                    "caps_a", "caps_b", "caps_r", "occ_attach", "occ_a",
                    "occ_b", "occ_r"):
            entries.append(f'        "{key}": np.array(')
            entries.append(f"        {fmt_arr(data[key])}")
            if key in ("caps_attach", "occ_attach"):
                entries.append("        , dtype=np.int32),")
            else:
                entries.append("        ),")
        entries.append(f'        "geom_names": {data["geom_names"]!r},')
        entries.append(f'        "occ_names": {data["occ_names"]!r},')
        entries.append(f'        "native_size": {data["native_size"]!r},')
        entries.append(f'        "fovy": {data["fovy"]!r},')
        entries.append("    },")
        blocks.append("\n".join(entries))

    header = '''\
"""Measured arm geometry (GENERATED — benchmarks/extract_chain_geometry.py).

Joint screw data (world anchors/axes at qpos=0), joint ranges, and fitted
silhouette capsules measured from the reference MJCF models
(reference: src/env/robotics/assets/*/robot.xml — physical robot
dimensions, i.e. behavioral-spec measurements like the shipped camera
extrinsics in data/calibration.py). Capsule radii are subsequently tuned
against MuJoCo segmentation renders by benchmarks/mask_fidelity.py.

Frames: everything is world-frame at the zero configuration; the chain
evaluates product-of-exponentials FK from these quantities, and capsules
attached to driven joint k transform rigidly with that joint's frame.
"""

import numpy as np

CHAIN_DATA = {
'''
    with open(args.out, "w") as f:
        f.write(header + "\n".join(blocks) + "\n}\n")
    print("wrote", args.out)


if __name__ == "__main__":
    main()
