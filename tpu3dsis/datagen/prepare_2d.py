"""2D frame prep: ScanNet `.sens` -> color / depth / pose files.

Python re-implementation of ``datagen/ScanReal/python/prepare_2d_data.py:34-108``
and its SensorData reader: export every ``frame_skip``-th frame's color
(jpeg, resized), depth (16-bit png, mm) and camera-to-world pose, at
320x240 by default, into the ``frames_square`` layout the color pipeline
reads (BASE_IMAGE_PATH/<scene>/{color,depth,pose}).

The .sens binary layout is the public ScanNet SensorData format:
  version i4, strlen Q + sensor name,
  4x 4x4 f4 matrices (calibration color/depth intrinsic+extrinsic),
  color/depth compression type i4 each,
  color W/H i4, depth W/H i4, depth shift f4, num_frames Q,
  then per frame: camera_to_world 16f, 2x u64 timestamps,
  color_size Q, depth_size Q, jpeg bytes, zlib-compressed u16 depth.
"""

from __future__ import annotations

import os
import struct
import zlib

import numpy as np


class SensFile:
    def __init__(self, path):
        self.path = path
        self.file = open(path, "rb")
        f = self.file
        (self.version,) = struct.unpack("<I", f.read(4))
        (strlen,) = struct.unpack("<Q", f.read(8))
        self.sensor_name = f.read(strlen).decode("ascii", "replace")
        self.intrinsic_color = np.frombuffer(f.read(64), np.float32).reshape(4, 4)
        self.extrinsic_color = np.frombuffer(f.read(64), np.float32).reshape(4, 4)
        self.intrinsic_depth = np.frombuffer(f.read(64), np.float32).reshape(4, 4)
        self.extrinsic_depth = np.frombuffer(f.read(64), np.float32).reshape(4, 4)
        (self.color_compression,) = struct.unpack("<i", f.read(4))
        (self.depth_compression,) = struct.unpack("<i", f.read(4))
        self.color_width, self.color_height = struct.unpack("<II", f.read(8))
        self.depth_width, self.depth_height = struct.unpack("<II", f.read(8))
        (self.depth_shift,) = struct.unpack("<f", f.read(4))
        (self.num_frames,) = struct.unpack("<Q", f.read(8))
        self._frame_offsets = None

    def _index_frames(self):
        if self._frame_offsets is not None:
            return
        self._frame_offsets = []
        f = self.file
        f.seek(4 + 8 + len(self.sensor_name) + 4 * 64 + 8 + 8 + 8 + 4 + 8)
        for _ in range(self.num_frames):
            off = f.tell()
            f.seek(16 * 4 + 8 + 8, os.SEEK_CUR)
            color_size, depth_size = struct.unpack("<QQ", f.read(16))
            f.seek(color_size + depth_size, os.SEEK_CUR)
            self._frame_offsets.append(off)

    def read_frame(self, idx):
        """-> (pose 4x4, color jpeg bytes, depth (H, W) uint16)."""
        self._index_frames()
        f = self.file
        f.seek(self._frame_offsets[idx])
        pose = np.frombuffer(f.read(64), np.float32).reshape(4, 4)
        f.seek(16, os.SEEK_CUR)  # timestamps
        color_size, depth_size = struct.unpack("<QQ", f.read(16))
        color = f.read(color_size)
        depth_bytes = zlib.decompress(f.read(depth_size))
        depth = np.frombuffer(depth_bytes, np.uint16).reshape(
            self.depth_height, self.depth_width
        )
        return pose, color, depth

    def close(self):
        self.file.close()


def export_frames(
    sens_path,
    out_dir,
    frame_skip=20,
    image_size=(320, 240),
):
    """prepare_2d_data.py:63-108 equivalent (frame_skip 20, 320x240)."""
    import io as _io

    from PIL import Image

    sens = SensFile(sens_path)
    for sub in ("color", "depth", "pose"):
        os.makedirs(os.path.join(out_dir, sub), exist_ok=True)
    w, h = image_size
    for i in range(0, sens.num_frames, frame_skip):
        pose, color_jpeg, depth = sens.read_frame(i)
        img = Image.open(_io.BytesIO(color_jpeg)).convert("RGB")
        img = img.resize((w, h), Image.BILINEAR)
        img.save(os.path.join(out_dir, "color", f"{i}.jpg"))
        d = Image.fromarray(depth)
        d = d.resize((w, h), Image.NEAREST)
        d.save(os.path.join(out_dir, "depth", f"{i}.png"))
        np.savetxt(os.path.join(out_dir, "pose", f"{i}.txt"), pose, fmt="%f")
    sens.close()
