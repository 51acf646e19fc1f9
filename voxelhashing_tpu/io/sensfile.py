""".sens RGB-D sequence container (read/write).

Clean-room reimplementation of the on-disk format consumed by the
reference's ``SensorDataReader`` (format defined in
/root/reference/DepthSensingCUDA/Source/sensorData/sensorData.h:161-830,
version 4):

    u32   version (== 4)
    u64   sensor-name length; bytes  sensor name
    4x4f  color intrinsic; 4x4f color extrinsic   (row-major f32)
    4x4f  depth intrinsic; 4x4f depth extrinsic
    i32   color compression (0 raw, 1 png, 2 jpeg)
    i32   depth compression (0 raw ushort, 1 zlib ushort, 2 occi)
    u32   colorWidth, colorHeight, depthWidth, depthHeight
    f32   depthShift (depth[m] = stored / depthShift)
    u64   numFrames, then per frame:
        4x4f  camera-to-world;  u64 tsColor; u64 tsDepth
        u64 colorBytes; u64 depthBytes; bytes color; bytes depth
    u64   numIMUFrames, then per IMU frame 5*vec3d + u64 timestamp

Depth zlib compression is plain ``zlib`` over little-endian u16; color
png/jpeg decode via PIL (as the reference uses stb).
"""

from __future__ import annotations

import dataclasses
import io as _io
import struct
import zlib
from typing import Iterator, List, Optional, Tuple

import numpy as np

SENS_VERSION = 4
COLOR_RAW, COLOR_PNG, COLOR_JPEG = 0, 1, 2
DEPTH_RAW, DEPTH_ZLIB, DEPTH_OCCI = 0, 1, 2


@dataclasses.dataclass
class SensCalibration:
    intrinsic: np.ndarray   # [4,4] f32
    extrinsic: np.ndarray   # [4,4] f32


@dataclasses.dataclass
class SensHeader:
    sensor_name: str
    calibration_color: SensCalibration
    calibration_depth: SensCalibration
    color_compression: int
    depth_compression: int
    color_width: int
    color_height: int
    depth_width: int
    depth_height: int
    depth_shift: float
    num_frames: int


def _read_mat4(f) -> np.ndarray:
    return np.frombuffer(f.read(64), "<f4").reshape(4, 4).copy()


class SensReader:
    """Streaming .sens reader (the SensorDataReader replacement,
    /root/reference/DepthSensingCUDA/Source/SensorDataReader.h:20-77)."""

    def __init__(self, path: str):
        self.path = path
        self._f = open(path, "rb")
        f = self._f
        (version,) = struct.unpack("<I", f.read(4))
        if version != SENS_VERSION:
            raise ValueError(f"unsupported .sens version {version}")
        (nlen,) = struct.unpack("<Q", f.read(8))
        name = f.read(nlen).decode("latin-1")
        cal_c = SensCalibration(_read_mat4(f), _read_mat4(f))
        cal_d = SensCalibration(_read_mat4(f), _read_mat4(f))
        cc, dc = struct.unpack("<ii", f.read(8))
        cw, ch, dw, dh = struct.unpack("<IIII", f.read(16))
        (shift,) = struct.unpack("<f", f.read(4))
        (nframes,) = struct.unpack("<Q", f.read(8))
        self.header = SensHeader(name, cal_c, cal_d, cc, dc,
                                 cw, ch, dw, dh, shift, int(nframes))
        self._frame_offsets: List[int] = []
        self._index_frames()

    def _index_frames(self):
        f = self._f
        for _ in range(self.header.num_frames):
            self._frame_offsets.append(f.tell())
            f.seek(64 + 8 + 8, 1)                    # pose + 2 timestamps
            csz, dsz = struct.unpack("<QQ", f.read(16))
            f.seek(csz + dsz, 1)

    def __len__(self):
        return self.header.num_frames

    def read_frame(self, i: int) -> Tuple[np.ndarray, Optional[np.ndarray],
                                          np.ndarray]:
        """Returns (depth [h,w] f32 metres with NaN invalid,
        color [h,w,3] f32 in [0,1] or None, camera_to_world [4,4] f32)."""
        h = self.header
        f = self._f
        f.seek(self._frame_offsets[i])
        pose = _read_mat4(f)
        f.read(16)                                   # timestamps
        csz, dsz = struct.unpack("<QQ", f.read(16))
        cbuf = f.read(csz)
        dbuf = f.read(dsz)

        if h.depth_compression == DEPTH_ZLIB:
            raw = zlib.decompress(dbuf)
        elif h.depth_compression == DEPTH_RAW:
            raw = dbuf
        else:
            raise NotImplementedError("OCCI depth compression")
        depth_u16 = np.frombuffer(raw, "<u2").reshape(
            h.depth_height, h.depth_width)
        depth = depth_u16.astype(np.float32) / h.depth_shift
        depth = np.where(depth_u16 == 0, np.nan, depth)

        color = None
        if csz > 0:
            if h.color_compression == COLOR_RAW:
                color = np.frombuffer(cbuf, np.uint8).reshape(
                    h.color_height, h.color_width, 3)
            else:                                    # PNG / JPEG
                from PIL import Image
                color = np.asarray(
                    Image.open(_io.BytesIO(cbuf)).convert("RGB"))
            color = color.astype(np.float32) / 255.0
        return depth, color, pose

    def frames(self) -> Iterator[Tuple[np.ndarray, Optional[np.ndarray],
                                       np.ndarray]]:
        for i in range(len(self)):
            yield self.read_frame(i)

    def ground_truth(self) -> List[np.ndarray]:
        """All camera-to-world poses (getRigidTransform analog)."""
        poses = []
        f = self._f
        for off in self._frame_offsets:
            f.seek(off)
            poses.append(_read_mat4(f))
        return poses

    def close(self):
        self._f.close()


def write_sens(path: str, depths: np.ndarray, colors: Optional[np.ndarray],
               poses: List[np.ndarray], intrinsic: np.ndarray,
               depth_shift: float = 1000.0, sensor_name: str = "synthetic",
               compress_depth: bool = True) -> None:
    """Write a version-4 .sens file (record mode analog, RGBDSensor.h:85-95).

    depths: [n,h,w] f32 metres (NaN invalid); colors: [n,h,w,3] f32 [0,1]
    or None; intrinsic: [4,4].
    """
    n, h, w = depths.shape
    with open(path, "wb") as f:
        f.write(struct.pack("<I", SENS_VERSION))
        name = sensor_name.encode()
        f.write(struct.pack("<Q", len(name)) + name)
        intr = np.asarray(intrinsic, "<f4").reshape(4, 4)
        eye = np.eye(4, dtype="<f4")
        for m in (intr, eye, intr, eye):             # color cal, depth cal
            f.write(m.tobytes())
        f.write(struct.pack("<ii", COLOR_RAW,
                            DEPTH_ZLIB if compress_depth else DEPTH_RAW))
        f.write(struct.pack("<IIII", w, h, w, h))
        f.write(struct.pack("<f", depth_shift))
        f.write(struct.pack("<Q", n))
        for i in range(n):
            d = depths[i]
            du16 = np.where(np.isfinite(d), np.clip(
                d * depth_shift, 0, 65535), 0).astype("<u2")
            dbuf = du16.tobytes()
            if compress_depth:
                dbuf = zlib.compress(dbuf)
            cbuf = b""
            if colors is not None:
                cbuf = np.clip(colors[i] * 255.0, 0,
                               255).astype(np.uint8).tobytes()
            f.write(np.asarray(poses[i], "<f4").reshape(4, 4).tobytes())
            f.write(struct.pack("<QQ", i * 33333, i * 33333))
            f.write(struct.pack("<QQ", len(cbuf), len(dbuf)))
            f.write(cbuf)
            f.write(dbuf)
        f.write(struct.pack("<Q", 0))                # no IMU frames
