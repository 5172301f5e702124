"""Blender (nerf_synthetic) dataset loader.

Required by config/lego.yml (``dataset.type: BlenderNeRFDataset``) and by the
reference's own __main__ harnesses — but absent from the reference repo
(SURVEY §3.6).  Implements the standard nerf_synthetic layout:

    <basedir>/transforms_{train,val,test}.json
    <basedir>/<file_path>.png   (RGBA)

with ``resolution_level`` integer downsampling (config/lego.yml names
``resolution_level: 2``) and the focal derived from camera_angle_x.

Returns the same sample-dict contract as SRNDataset so the harness is
dataset-agnostic.  object_id is always 0 (single scene).
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np
import imageio.v2 as imageio


class BlenderNeRFDataset:
    def __init__(self, path: str, stage: str = "train",
                 resolution_level: int = 1):
        self.base_path = Path(path)
        self.stage = stage
        self.resolution_level = max(1, int(resolution_level))
        meta_path = self.base_path / f"transforms_{stage}.json"
        assert meta_path.exists(), f"{meta_path} does not exist"
        with open(meta_path) as f:
            self.meta = json.load(f)
        self.frames = self.meta["frames"]
        self.camera_angle_x = float(self.meta["camera_angle_x"])
        self.num_objects = 1
        self.num_views = len(self.frames)

    def __len__(self):
        return len(self.frames)

    def __getitem__(self, index: int) -> dict:
        frame = self.frames[index]
        img_path = self.base_path / (frame["file_path"] + ".png")
        img = np.asarray(imageio.imread(img_path)).astype(np.float32) / 255.0

        r = self.resolution_level
        if r > 1:
            # box-filter downsample by integer factor
            h, w = img.shape[0] // r * r, img.shape[1] // r * r
            img = img[:h, :w].reshape(h // r, r, w // r, r, -1).mean(axis=(1, 3))

        height, width = img.shape[:2]
        focal = 0.5 * width / np.tan(0.5 * self.camera_angle_x)

        pose = np.asarray(frame["transform_matrix"], dtype=np.float32)
        if img.shape[-1] == 4:
            mask = img[..., 3:4].copy()
        else:
            mask = np.ones_like(img[..., :1])

        intrinsic = np.eye(4, dtype=np.float32)
        intrinsic[0, 0] = intrinsic[1, 1] = focal
        intrinsic[0, 2], intrinsic[1, 2] = width / 2.0, height / 2.0

        return {
            "object_id": np.int32(0),
            "intrinsic": intrinsic,
            "color": img.astype(np.float32),
            "mask": mask.astype(np.float32),
            "pose": pose,
        }
