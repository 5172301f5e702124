"""LLFF (forward-facing, e.g. fern) dataset loader.

Required by config/fern.yml (``dataset.type: llff``) but absent from the
reference repo (SURVEY §3.6).  Implements the standard LLFF layout:

    <basedir>/poses_bounds.npy   — [N, 17]: 3x5 pose (c2w | hwf) + 2 bounds
    <basedir>/images[_N]/*.{png,jpg}

Poses are converted from LLFF's [down right back] convention to the
[right up back] convention the rest of the pipeline uses, and recentered.
``downsample_factor`` selects the pre-downsampled images_N directory when it
exists, else integer-downsamples in memory.  Every ``llffhold``-th view is the
val split (the conventional LLFF holdout).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import imageio.v2 as imageio


def _recenter_poses(poses: np.ndarray) -> np.ndarray:
    """Rigidly transform so the average pose is the identity."""
    def viewmatrix(z, up, pos):
        vec2 = z / np.linalg.norm(z)
        vec1_avg = up
        vec0 = np.cross(vec1_avg, vec2)
        vec0 = vec0 / np.linalg.norm(vec0)
        vec1 = np.cross(vec2, vec0)
        return np.stack([vec0, vec1, vec2, pos], axis=1)

    center = poses[:, :3, 3].mean(0)
    vec2 = poses[:, :3, 2].sum(0)
    up = poses[:, :3, 1].sum(0)
    c2w = np.concatenate([viewmatrix(vec2, up, center),
                          np.array([[0, 0, 0, 1.0]])], axis=0)
    return np.linalg.inv(c2w) @ poses


class LLFFDataset:
    def __init__(self, path: str, stage: str = "train",
                 downsample_factor: int = 8, llffhold: int = 8):
        self.base_path = Path(path)
        self.stage = stage
        assert self.base_path.exists(), f"{self.base_path} does not exist"

        pb = np.load(self.base_path / "poses_bounds.npy")  # [N, 17]
        poses_hwf = pb[:, :15].reshape(-1, 3, 5)
        self.bounds = pb[:, 15:17]

        img_dir = self.base_path / f"images_{downsample_factor}"
        self._mem_downsample = 1
        if not img_dir.exists():
            img_dir = self.base_path / "images"
            self._mem_downsample = max(1, int(downsample_factor))
        exts = {".png", ".jpg", ".jpeg", ".JPG", ".PNG"}
        files = sorted(p for p in img_dir.iterdir() if p.suffix in exts)
        assert len(files) == pb.shape[0], (
            f"{len(files)} images vs {pb.shape[0]} poses")

        # LLFF pose columns are [down right back]; convert to [right up back]
        # (standard minus-y flip used by every LLFF consumer).
        poses = np.concatenate(
            [poses_hwf[:, :, 1:2], -poses_hwf[:, :, 0:1], poses_hwf[:, :, 2:4]],
            axis=-1)
        bottom = np.tile(np.array([[[0, 0, 0, 1.0]]]), (poses.shape[0], 1, 1))
        poses = np.concatenate([poses, bottom], axis=1)
        poses = _recenter_poses(poses)

        self.hwf = poses_hwf[:, :, 4]  # [N, 3]: H, W, focal at original res

        hold = max(1, int(llffhold))
        idx = np.arange(pb.shape[0])
        val_idx = idx[::hold]
        train_idx = np.array([i for i in idx if i % hold != 0])
        sel = val_idx if stage in ("val", "test") else train_idx

        self.files = [files[i] for i in sel]
        self.poses = poses[sel].astype(np.float32)
        self.sel_hwf = self.hwf[sel]
        self.num_objects = 1
        self.num_views = len(self.files)

    def __len__(self):
        return len(self.files)

    def __getitem__(self, index: int) -> dict:
        img = np.asarray(imageio.imread(self.files[index])).astype(np.float32)
        img = img / 255.0
        r = self._mem_downsample
        if r > 1:
            h, w = img.shape[0] // r * r, img.shape[1] // r * r
            img = img[:h, :w].reshape(h // r, r, w // r, r, -1).mean(axis=(1, 3))

        height, width = img.shape[:2]
        h0, w0, f0 = self.sel_hwf[index]
        focal = float(f0) * width / float(w0)

        intrinsic = np.eye(4, dtype=np.float32)
        intrinsic[0, 0] = intrinsic[1, 1] = focal
        intrinsic[0, 2], intrinsic[1, 2] = width / 2.0, height / 2.0

        return {
            "object_id": np.int32(0),
            "intrinsic": intrinsic,
            "color": img.astype(np.float32),
            "mask": np.ones_like(img[..., :1], dtype=np.float32),
            "pose": self.poses[index],
        }
