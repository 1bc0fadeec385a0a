"""Volume grid loaders: Mitsuba ``.vol`` and raw numpy grids.

TPU-native analog of src/Node/loaders/load_volumes.cpp: the reference
parses Mitsuba volume grids and NanoVDB files into GPU buffers + a Medium
component (load_volumes.cpp:17-52+); here grids become dense density bricks
on a MediumComponent (render/medium.py resamples + computes majorants).
NanoVDB's tree format is GPU-pointer-oriented and has no TPU value — dense
bricks with majorants are the TPU-native representation.
"""

from __future__ import annotations

import struct
from pathlib import Path

import numpy as np

from stratum_tpu.scene.graph import MediumComponent, Node


def load_vol_grid(path):
    """Parse a Mitsuba ``.vol`` grid file. Returns (data [Z,Y,X,C] float32,
    box_lo [3], box_hi [3])."""
    raw = Path(path).read_bytes()
    if raw[:3] != b"VOL":
        raise ValueError(f"{path}: not a mitsuba volume file")
    version = raw[3]
    if version != 3:
        raise ValueError(f"{path}: unsupported .vol version {version}")
    encoding, xres, yres, zres, channels = struct.unpack_from("<iiiii", raw, 4)
    if encoding != 1:
        raise ValueError(f"{path}: only float32 encoding supported")
    box = struct.unpack_from("<6f", raw, 24)
    count = xres * yres * zres * channels
    data = np.frombuffer(raw, "<f4", count=count, offset=48)
    data = data.reshape(zres, yres, xres, channels).astype(np.float32)
    return data, np.asarray(box[:3], np.float32), np.asarray(box[3:], np.float32)


def write_vol_grid(path, data, box_lo, box_hi):
    """Writer (tests + interchange): [Z,Y,X] or [Z,Y,X,C] float32."""
    data = np.asarray(data, np.float32)
    if data.ndim == 3:
        data = data[..., None]
    z, y, x, c = data.shape
    hdr = b"VOL" + bytes([3]) + struct.pack(
        "<iiiii6f", 1, x, y, z, c, *np.asarray(box_lo, np.float32),
        *np.asarray(box_hi, np.float32)
    )
    Path(path).write_bytes(hdr + data.tobytes())


def load_volume(
    parent: Node, path, albedo=(0.9, 0.9, 0.9), g: float = 0.0,
    density_scale: float = 1.0,
) -> Node:
    """Load a volume file as a MediumComponent child node (dispatch by
    extension like the reference's Scene::load_vol/load_nvdb)."""
    path = Path(path)
    ext = path.suffix.lower()
    if ext == ".vol":
        data, lo, hi = load_vol_grid(path)
        density = data[..., 0] * density_scale
    elif ext == ".npy":
        density = np.load(path).astype(np.float32) * density_scale
        lo = np.zeros(3, np.float32)
        hi = np.ones(3, np.float32)
    else:
        raise ValueError(f"unsupported volume extension {ext!r}")
    node = parent.add_child(path.stem)
    node.make_component(
        MediumComponent(
            density=density,
            box_lo=lo,
            box_hi=hi,
            albedo=np.asarray(albedo, np.float32),
            g=g,
        )
    )
    return node
