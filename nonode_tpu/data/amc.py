"""CMU mocap ASF/AMC parsing + forward kinematics, pure NumPy.

Capability parity with EGNO/motion/amc_parser.py (which depends on
transforms3d, unavailable here): parse an ASF skeleton, parse AMC motion
frames (degrees), and run forward kinematics to per-frame joint coordinates.

ASF conventions (see the CMU ASF/AMC spec): each bone has a direction vector,
a length, a rotation 'axis' (static-XYZ euler angles, degrees) defining the
local frame C, and a dof list naming which of rx/ry/rz appear per AMC frame.
FK: M_joint = M_parent @ C @ R(motion) @ C^-1;
    x_joint = x_parent + length * M_joint @ direction.
"""

from __future__ import annotations

import numpy as np


def euler2mat(ai: float, aj: float, ak: float) -> np.ndarray:
    """Static-XYZ euler angles (radians) -> rotation matrix
    (transforms3d 'sxyz' convention: rotate about x by ai first, then y,
    then z, all in the static frame: M = Rz @ Ry @ Rx)."""
    si, ci = np.sin(ai), np.cos(ai)
    sj, cj = np.sin(aj), np.cos(aj)
    sk, ck = np.sin(ak), np.cos(ak)
    rx = np.array([[1, 0, 0], [0, ci, -si], [0, si, ci]])
    ry = np.array([[cj, 0, sj], [0, 1, 0], [-sj, 0, cj]])
    rz = np.array([[ck, -sk, 0], [sk, ck, 0], [0, 0, 1]])
    return rz @ ry @ rx


class Joint:
    def __init__(self, name, direction, length, axis, dof, limits):
        self.name = name
        self.direction = np.reshape(direction, [3, 1])
        self.length = length
        axis = np.deg2rad(axis)
        self.C = euler2mat(*axis)
        self.Cinv = np.linalg.inv(self.C)
        # which rotation channels this joint reads from the AMC frame
        self.dof = list(dof)
        self.limits = np.zeros([3, 2])
        for lm, nm in zip(limits, dof):
            idx = {"rx": 0, "ry": 1, "rz": 2}[nm]
            self.limits[idx] = lm
        self.parent = None
        self.children = []
        self.coordinate = None
        self.matrix = None
        self.name_to_idx = None

    def set_motion(self, motion):
        """Recursive FK for one AMC frame (dict name -> channel values)."""
        if self.name == "root":
            self.coordinate = np.reshape(np.array(motion["root"][:3]), [3, 1])
            rotation = np.deg2rad(motion["root"][3:])
            self.matrix = self.C @ euler2mat(*rotation) @ self.Cinv
        else:
            idx = 0
            rotation = np.zeros(3)
            for axis, lm in enumerate(self.limits):
                if not np.array_equal(lm, np.zeros(2)):
                    rotation[axis] = motion[self.name][idx]
                    idx += 1
            rotation = np.deg2rad(rotation)
            self.matrix = (self.parent.matrix @ self.C
                           @ euler2mat(*rotation) @ self.Cinv)
            self.coordinate = (self.parent.coordinate
                               + self.length * self.matrix @ self.direction)
        for child in self.children:
            child.set_motion(motion)

    def to_dict(self):
        ret = {self.name: self}
        for child in self.children:
            ret.update(child.to_dict())
        return ret

    def build_index(self):
        self.name_to_idx = {name: i for i, name in enumerate(self.to_dict())}

    def skeleton_edges(self):
        """[(child_idx, parent_idx)] over the joint index order."""
        assert self.name_to_idx is not None
        edges = []
        for joint in self.to_dict().values():
            if joint.parent is not None:
                edges.append([self.name_to_idx[joint.name],
                              self.name_to_idx[joint.parent.name]])
        return edges

    def coordinates(self):
        """[N, 3] joint positions for the current frame."""
        assert self.name_to_idx is not None
        x = np.zeros((len(self.name_to_idx), 3))
        for joint in self.to_dict().values():
            x[self.name_to_idx[joint.name]] = joint.coordinate.reshape(-1)
        return x


def _lines(path):
    with open(path) as f:
        return f.read().splitlines()


def parse_asf(path) -> dict[str, Joint]:
    """Parse an ASF skeleton file into a joint dict (root included)."""
    content = _lines(path)
    for idx, line in enumerate(content):
        if line.strip() == ":bonedata":
            content = content[idx + 1:]
            break

    joints = {"root": Joint("root", np.zeros(3), 0, np.zeros(3), [], [])}
    i = 0

    def tok():
        nonlocal i
        if i >= len(content):
            return None
        parts = content[i].strip().split()
        i += 1
        return parts

    line = tok()
    while line is not None and line and line[0] != ":hierarchy":
        assert line[0] == "begin", line
        fields = {}
        dof, limits = [], []
        line = tok()
        while line[0] != "end":
            if line[0] == "name":
                fields["name"] = line[1]
            elif line[0] == "direction":
                fields["direction"] = np.array([float(v) for v in line[1:]])
            elif line[0] == "length":
                fields["length"] = float(line[1])
            elif line[0] == "axis":
                fields["axis"] = np.array([float(v) for v in line[1:4]])
            elif line[0] == "dof":
                dof = line[1:]
                for k in range(len(dof)):
                    line = tok()
                    vals = line[1:] if line[0] == "limits" else line
                    limits.append((float(vals[0].lstrip("(")),
                                   float(vals[1].rstrip(")"))))
            line = tok()
        joints[fields["name"]] = Joint(fields["name"], fields["direction"],
                                       fields["length"], fields["axis"],
                                       dof, limits)
        line = tok()

    # hierarchy
    assert line[0] == ":hierarchy"
    line = tok()
    assert line[0] == "begin"
    while True:
        line = tok()
        if line[0] == "end":
            break
        parent = line[0]
        for child in line[1:]:
            joints[parent].children.append(joints[child])
            joints[child].parent = joints[parent]
    return joints


def parse_amc(path) -> list[dict]:
    """Parse an AMC motion file -> list of {joint: [channel values]}."""
    content = _lines(path)
    for idx, line in enumerate(content):
        if line.strip() == ":DEGREES":
            content = content[idx + 1:]
            break
    frames = []
    cur = None
    for line in content:
        parts = line.strip().split()
        if not parts:
            continue
        if parts[0].replace("-", "").isnumeric():
            if cur is not None:
                frames.append(cur)
            cur = {}
        else:
            cur[parts[0]] = [float(v) for v in parts[1:]]
    if cur:
        frames.append(cur)
    return frames


def trajectories_from_amc(asf_path, amc_paths) -> tuple[list, list]:
    """Preprocess ASF+AMC files into (edges, [X_trial [T, N, 3]]) — the
    motion.pkl format (EGNO/motion/preprocess.py:12-37)."""
    joints = parse_asf(asf_path)
    root = joints["root"]
    root.build_index()
    edges = root.skeleton_edges()
    all_x = []
    for amc in amc_paths:
        frames = parse_amc(amc)
        xs = []
        for frame in frames:
            root.set_motion(frame)
            xs.append(root.coordinates())
        all_x.append(np.asarray(xs))
    return edges, all_x
