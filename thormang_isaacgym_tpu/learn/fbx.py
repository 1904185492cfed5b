"""Minimal binary-FBX (Kaydara 7.x) animation importer — numpy only.

TPU-native replacement for the reference's Autodesk-SDK FBX backend
(`/root/reference/isaacgymenvs/tasks/amp/poselib/skeleton/backend/fbx/
fbx_backend.py:1-48`, `fbx_read_wrapper.py`), which this snapshot cannot
run (no FBX SDK).  It reads exactly the subset a mocap skeleton export
uses — the node-record tree, Properties70 blocks, Model (LimbNode)
hierarchy, AnimationCurveNode/AnimationCurve key data and the Connections
table — and assembles a `poselib.SkeletonMotion` (local joint rotations +
root translation at a uniform fps), the same contract as the reference's
`SkeletonMotion.from_fbx` (`skeleton3d.py`).

Binary layout (documented publicly by Blender's FBX work):
  header  "Kaydara FBX Binary  \\x00" u8 u16, u32 version
  node    u32 end_offset, u32 num_props, u32 prop_list_len, u8 name_len,
          name, props..., nested nodes..., 13-byte null sentinel
  (u64 variants from version >= 7500)
  props   'Y' i16 | 'C' u8 | 'I' i32 | 'F' f32 | 'D' f64 | 'L' i64
          | 'S'/'R' u32-len bytes
          | 'f','d','l','i','b' arrays: u32 len, u32 encoding,
            u32 comp_len, data (zlib when encoding == 1)

FBX local transform used here: T * Rpre * Reuler(order) * Rpost^-1 —
the pivot/offset terms are asserted absent (mocap exports don't use them).
Euler order eEulerXYZ composes R = Rz @ Ry @ Rx (X applied first).
Time is in KTime ticks: 46,186,158,000 per second.
"""
from __future__ import annotations

import struct
import zlib

import numpy as np

from thormang_isaacgym_tpu.learn.poselib import Skeleton, SkeletonMotion, _qmul, _qnorm

KTIME_PER_SEC = 46186158000

_ARRAY_TYPES = {
    b"f": (np.float32, 4), b"d": (np.float64, 8), b"l": (np.int64, 8),
    b"i": (np.int32, 4), b"b": (np.uint8, 1),
}
_SCALAR_TYPES = {b"Y": ("<h", 2), b"C": ("<B", 1), b"I": ("<i", 4),
                 b"F": ("<f", 4), b"D": ("<d", 8), b"L": ("<q", 8)}


class FbxNode:
    __slots__ = ("name", "props", "children")

    def __init__(self, name, props, children):
        self.name = name
        self.props = props
        self.children = children

    def all(self, name):
        return [c for c in self.children if c.name == name]

    def first(self, name):
        for c in self.children:
            if c.name == name:
                return c
        return None


def _parse_props(data, pos, count):
    props = []
    for _ in range(count):
        t = data[pos:pos + 1]
        pos += 1
        if t in _SCALAR_TYPES:
            fmt, sz = _SCALAR_TYPES[t]
            props.append(struct.unpack_from(fmt, data, pos)[0])
            pos += sz
        elif t in (b"S", b"R"):
            n = struct.unpack_from("<I", data, pos)[0]
            props.append(data[pos + 4:pos + 4 + n])
            pos += 4 + n
        elif t in _ARRAY_TYPES:
            dt, isz = _ARRAY_TYPES[t]
            n, enc, clen = struct.unpack_from("<III", data, pos)
            pos += 12
            raw = data[pos:pos + clen] if enc else data[pos:pos + n * isz]
            pos += clen if enc else n * isz
            if enc:
                raw = zlib.decompress(raw)
            props.append(np.frombuffer(raw, dtype=dt, count=n))
        else:
            raise ValueError(f"unknown FBX property type {t!r}")
    return props, pos


def _parse_node(data, pos, big):
    if big:
        end, nprops, _plen = struct.unpack_from("<QQQ", data, pos)
        nlen = data[pos + 24]
        pos += 25
    else:
        end, nprops, _plen = struct.unpack_from("<III", data, pos)
        nlen = data[pos + 12]
        pos += 13
    if end == 0:
        return None, pos
    name = data[pos:pos + nlen].decode("latin1")
    pos += nlen
    props, pos = _parse_props(data, pos, nprops)
    children = []
    while pos < end:
        child, pos = _parse_node(data, pos, big)
        if child is None:
            break
    # a node has a null-record terminator only if it has nested nodes
        children.append(child)
    return FbxNode(name, props, children), end


def parse_fbx(path: str) -> FbxNode:
    data = open(path, "rb").read()
    assert data[:21] == b"Kaydara FBX Binary  \x00", "not a binary FBX"
    version = struct.unpack_from("<I", data, 23)[0]
    big = version >= 7500
    pos = 27
    top = []
    while pos < len(data):
        node, pos = _parse_node(data, pos, big)
        if node is None:
            break
        top.append(node)
    return FbxNode("(root)", [], top)


# ---------------------------------------------------------------------------
# animation assembly
# ---------------------------------------------------------------------------


def _props70(node):
    """Properties70 -> {name: tuple-of-values}."""
    out = {}
    p70 = node.first("Properties70")
    if p70 is None:
        return out
    for p in p70.all("P"):
        out[p.props[0].decode("latin1")] = tuple(p.props[4:])
    return out


def _euler_to_quat_deg(e_deg, order=(0, 1, 2)):
    """(F,3) XYZ Euler degrees -> (F,4) wxyz, FBX composition (X first):
    q = qz * qy * qx for eEulerXYZ; `order` lists axis indices applied
    first-to-last."""
    e = np.deg2rad(np.asarray(e_deg, np.float64))
    axes = np.eye(3)
    q = None
    for ax in order:
        half = 0.5 * e[:, ax]
        qa = np.concatenate([np.cos(half)[:, None],
                             np.sin(half)[:, None] * axes[ax][None]], axis=1)
        q = qa if q is None else _qmul(qa, q)
    return q


def _sample_curve(times, values, grid):
    """Linear resample of one animation curve onto the KTime grid."""
    if len(times) == 1:
        return np.full(len(grid), values[0], np.float64)
    return np.interp(grid, times.astype(np.float64),
                     values.astype(np.float64))


def load_fbx_motion(path: str, fps: float | None = None,
                    root_name: str | None = None) -> SkeletonMotion:
    """Parse a binary FBX mocap file into a SkeletonMotion.

    Produces the same skeleton the reference's SDK importer yields for the
    CMU clips (`data/cmu_tpose.npy`: node names, parents, Lcl-Translation
    bone offsets) — verified by tests/test_fbx.py. fps defaults to the
    file's native key rate."""
    root = parse_fbx(path)
    objects = root.first("Objects")
    conns = root.first("Connections")
    assert objects is not None and conns is not None, "no Objects/Connections"

    models = {}       # id -> dict(name, lcl_t, pre_rot, post_rot, order)
    curve_nodes = {}  # id -> dict(channel defaults dX dY dZ)
    curves = {}       # id -> (times, values)
    for o in objects.children:
        if o.name == "Model":
            oid, full, mclass = o.props[0], o.props[1], o.props[2]
            name = full.decode("latin1").split("\x00")[0]
            p = _props70(o)
            get3 = lambda key: np.array(p.get(key, (0.0, 0.0, 0.0)),
                                        np.float64)
            for bad in ("RotationPivot", "ScalingPivot", "RotationOffset",
                        "ScalingOffset"):
                if bad in p and np.abs(np.array(p[bad])).max() > 1e-8:
                    raise NotImplementedError(f"FBX {bad} unsupported")
            order_code = int(p.get("RotationOrder", (0,))[0])
            orders = {0: (0, 1, 2), 1: (0, 2, 1), 2: (1, 0, 2),
                      3: (1, 2, 0), 4: (2, 0, 1), 5: (2, 1, 0)}
            models[oid] = dict(
                name=name, cls=mclass.decode("latin1"),
                lcl_t=get3("Lcl Translation"),
                lcl_r=get3("Lcl Rotation"),
                pre_rot=get3("PreRotation"),
                post_rot=get3("PostRotation"),
                order=orders[order_code],
                parent=None, channels={})
        elif o.name == "AnimationCurveNode":
            oid = o.props[0]
            p = _props70(o)
            curve_nodes[oid] = dict(
                defaults={k[-1]: v[0] for k, v in p.items()
                          if k.startswith("d|")},
                curves={}, target=None, prop=None)
        elif o.name == "AnimationCurve":
            oid = o.props[0]
            kt = o.first("KeyTime")
            kv = o.first("KeyValueFloat")
            if kt is not None and kv is not None:
                curves[oid] = (kt.props[0], kv.props[0])

    for c in conns.all("C"):
        kind = c.props[0].decode("latin1")
        src, dst = c.props[1], c.props[2]
        if kind == "OO" and src in models and dst in models:
            models[src]["parent"] = dst
        elif kind == "OP":
            prop = c.props[3].decode("latin1")
            if src in curve_nodes and dst in models:
                curve_nodes[src]["target"] = dst
                curve_nodes[src]["prop"] = prop
                models[dst]["channels"][prop] = src
            elif src in curves and dst in curve_nodes:
                curve_nodes[dst]["curves"][prop[-1]] = src

    # the skeleton: Model nodes reachable from the (single) parentless
    # limb root, in DFS order — matches the reference importer's ordering.
    # Scene-wrapper Nulls above the first LimbNode (e.g. the CMU takes'
    # "07_01" node, Lcl Rotation (-90, 0, 0)) are NOT skeleton joints;
    # their static rotation folds into the root joint below.
    kids = {}
    for oid, m in models.items():
        kids.setdefault(m["parent"], []).append(oid)
    roots = [oid for oid, m in models.items()
             if m["parent"] is None and (root_name is None
                                         or m["name"] == root_name)]
    assert roots, "no root model"
    top = roots[0]
    _wrapper_chain = []
    while models[top]["cls"] != "LimbNode":
        _wrapper_chain.append(top)
        limb_kids = [k for k in kids.get(top, ())
                     if models[k]["cls"] == "LimbNode"] or kids.get(top, ())
        assert limb_kids, "no LimbNode under scene root"
        top = limb_kids[0]
    order_ids = []

    def dfs(oid):
        order_ids.append(oid)
        for k in kids.get(oid, []):
            dfs(k)

    dfs(top)
    idx = {oid: i for i, oid in enumerate(order_ids)}
    J = len(order_ids)

    # the common sampling grid from all rotation/translation key times
    all_times = [curves[cid][0]
                 for cn in curve_nodes.values() if cn["target"] in idx
                 for cid in cn["curves"].values()]
    assert all_times, "no animation curves target the skeleton"
    t0 = min(float(t[0]) for t in all_times)
    t1 = max(float(t[-1]) for t in all_times)
    if fps is None:
        # native rate: median spacing of the densest curve
        dens = max(all_times, key=len)
        fps = float(np.round(
            KTIME_PER_SEC / np.median(np.diff(dens.astype(np.float64)))))
    F = max(2, int(round((t1 - t0) * fps / KTIME_PER_SEC)) + 1)
    grid = t0 + np.arange(F) * (KTIME_PER_SEC / fps)

    def channel(m, prop, defaults3):
        """(F,3) sampled channel values for 'Lcl Rotation'/'Lcl Translation'."""
        cn_id = m["channels"].get(prop)
        out = np.broadcast_to(defaults3, (F, 3)).copy()
        if cn_id is None:
            return out
        cn = curve_nodes[cn_id]
        for k, ax in (("X", 0), ("Y", 1), ("Z", 2)):
            if k in cn["curves"]:
                tt, vv = curves[cn["curves"][k]]
                out[:, ax] = _sample_curve(tt, vv, grid)
            elif k in cn["defaults"]:
                out[:, ax] = cn["defaults"][k]
        return out

    # Scene wrappers are EXCLUDED, not folded: the reference's SDK
    # importer reads per-node LOCAL transforms for the skeleton nodes
    # only, so the display-orientation wrapper (e.g. the CMU takes'
    # "-90 about x" Null) never enters the motion. The CMU mocap payload
    # itself is Z-up: Hips translation z ~= 16 units ~= 0.9 m hip height,
    # matching cmu_tpose.npy's (0, 0, 17.87) standing root.
    local_rot = np.zeros((F, J, 4))
    names, parents, local_t = [], [], []
    root_translation = None
    for oid in order_ids:
        m = models[oid]
        j = idx[oid]
        names.append(m["name"])
        parents.append(idx[m["parent"]] if m["parent"] in idx else -1)
        local_t.append(m["lcl_t"])
        e = channel(m, "Lcl Rotation", m["lcl_r"])
        q = _euler_to_quat_deg(e, m["order"])
        pre = _euler_to_quat_deg(m["pre_rot"][None])[0]
        post = _euler_to_quat_deg(m["post_rot"][None])[0]
        post_inv = post * np.array([1.0, -1, -1, -1])
        q = _qmul(_qmul(np.broadcast_to(pre, q.shape), q),
                  np.broadcast_to(post_inv, q.shape))
        if parents[-1] == -1:
            root_translation = channel(m, "Lcl Translation", m["lcl_t"])
        local_rot[:, j] = q

    skel = Skeleton(node_names=names,
                    parent_indices=np.asarray(parents, np.int64),
                    local_translation=np.asarray(local_t, np.float64))
    return SkeletonMotion(skel, _qnorm(local_rot), root_translation,
                          float(fps))
