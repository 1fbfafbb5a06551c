"""Generic URDF -> :class:`RobotModel` parser.

Produces the same serial-chain pytree as the embedded Indy7 parameters,
so any fixed-base serial revolute arm URDF can drive the framework
(replacing ``pin.buildModelsFromUrdf`` in /root/reference/src/utils.py:20-21).

Handling of fixed joints: a fixed joint's placement is folded into the next
revolute joint's tree placement; trailing fixed joints (tool frames like the
Indy7 ``tcp``) are folded into ``tcp_offset``.  Link inertias attached to
fixed links between revolute joints are merged into the preceding moving
link (the Indy7 URDF has none of these besides the immobile base).
"""
from __future__ import annotations

import xml.etree.ElementTree as ET

import numpy as np

from .robot import RobotModel, _make_model


def _floats(s, default):
    if s is None:
        return list(default)
    return [float(x) for x in s.replace(",", " ").split()]


def _origin(elem):
    if elem is None:
        return np.zeros(3), np.zeros(3)
    o = elem.find("origin")
    if o is None:
        return np.zeros(3), np.zeros(3)
    xyz = np.array(_floats(o.get("xyz"), [0, 0, 0]))
    rpy = np.array(_floats(o.get("rpy"), [0, 0, 0]))
    return xyz, rpy


def _rpy_mat(rpy):
    r, p, y = rpy
    cr, sr, cp, sp, cy, sy = (
        np.cos(r), np.sin(r), np.cos(p), np.sin(p), np.cos(y), np.sin(y))
    return np.array(
        [
            [cy * cp, cy * sp * sr - sy * cr, cy * sp * cr + sy * sr],
            [sy * cp, sy * sp * sr + cy * cr, sy * sp * cr - cy * sr],
            [-sp, cp * sr, cp * cr],
        ]
    )


def _link_inertial(link_elem):
    inertial = link_elem.find("inertial") if link_elem is not None else None
    if inertial is None:
        return 0.0, np.zeros(3), np.zeros((3, 3))
    mass = float(inertial.find("mass").get("value"))
    xyz, rpy = _origin(inertial)
    # Wrap in a fake parent so _origin sees the <origin> child directly.
    o = inertial.find("origin")
    if o is not None:
        xyz = np.array(_floats(o.get("xyz"), [0, 0, 0]))
        rpy = np.array(_floats(o.get("rpy"), [0, 0, 0]))
    else:
        xyz, rpy = np.zeros(3), np.zeros(3)
    ine = inertial.find("inertia")
    ixx = float(ine.get("ixx", 0)); ixy = float(ine.get("ixy", 0))
    ixz = float(ine.get("ixz", 0)); iyy = float(ine.get("iyy", 0))
    iyz = float(ine.get("iyz", 0)); izz = float(ine.get("izz", 0))
    I = np.array([[ixx, ixy, ixz], [ixy, iyy, iyz], [ixz, iyz, izz]])
    R = _rpy_mat(rpy)
    # Express COM and inertia in the link (= joint) frame.
    return mass, xyz, R @ I @ R.T  # COM offset xyz already in link frame


def parse_urdf(path_or_str, dtype=None):
    """Parse a URDF file (path or XML string) into a :class:`RobotModel`."""
    if "\n" in str(path_or_str) or "<robot" in str(path_or_str):
        root = ET.fromstring(path_or_str)
    else:
        root = ET.parse(path_or_str).getroot()

    links = {l.get("name"): l for l in root.findall("link")}
    joints = root.findall("joint")
    child_of = {}     # parent link -> joint element
    for j in joints:
        parent = j.find("parent").get("link")
        child_of.setdefault(parent, []).append(j)

    # Find the root link (a link that is never a child).
    children = {j.find("child").get("link") for j in joints}
    roots = [name for name in links if name not in children]
    if len(roots) != 1:
        raise ValueError(f"expected one root link, got {roots}")

    # Walk the chain, folding fixed joints.
    chain = []
    pending_R, pending_p = np.eye(3), np.zeros(3)
    link = roots[0]
    tcp_offset = np.zeros(3)
    while link in child_of:
        if len(child_of[link]) != 1:
            raise ValueError("only serial chains are supported")
        j = child_of[link][0]
        xyz, rpy = _origin(j)
        R_j = _rpy_mat(rpy)
        jtype = j.get("type")
        child = j.find("child").get("link")
        if jtype == "fixed":
            pending_p = pending_p + pending_R @ xyz
            pending_R = pending_R @ R_j
            link = child
            continue
        if jtype not in ("revolute", "continuous"):
            raise ValueError(f"unsupported joint type {jtype}")
        tree_p = pending_p + pending_R @ xyz
        tree_R = pending_R @ R_j
        pending_R, pending_p = np.eye(3), np.zeros(3)
        axis = np.array(_floats(j.find("axis").get("xyz")
                                if j.find("axis") is not None else None,
                                [1, 0, 0]))
        lim = j.find("limit")
        mass, com, I_com = _link_inertial(links.get(child))
        chain.append(
            dict(
                xyz=tree_p.tolist(), rpy=[0.0, 0.0, 0.0], axis=axis.tolist(),
                _R=tree_R,
                effort=float(lim.get("effort", np.inf)) if lim is not None else np.inf,
                lower=float(lim.get("lower", -np.inf)) if lim is not None else -np.inf,
                upper=float(lim.get("upper", np.inf)) if lim is not None else np.inf,
                velocity=float(lim.get("velocity", np.inf)) if lim is not None else np.inf,
                mass=mass, com=com.tolist(),
                inertia=[I_com[0, 0], I_com[0, 1], I_com[0, 2],
                         I_com[1, 1], I_com[1, 2], I_com[2, 2]],
            )
        )
        link = child
    # Trailing fixed transform becomes the tool offset (rotation dropped: the
    # reference's tcp joint is pure translation, indy7.urdf:240-245).
    tcp_offset = pending_p

    params = {"tcp_offset": tcp_offset.tolist(), "joints": chain}
    import jax.numpy as jnp

    model = _make_model(params, dtype=dtype or jnp.float32)
    # _make_model rebuilds R from rpy (identity here); patch in exact R.
    tree_R = np.stack([c["_R"] for c in chain])
    return RobotModel(
        **{
            **{f.name: getattr(model, f.name)
               for f in model.__dataclass_fields__.values()},
            "tree_R": jnp.asarray(tree_R, dtype=model.tree_R.dtype),
        }
    )
