"""SRN (Scene Representation Networks) dataset loader.

Host-side numpy pipeline replacing the reference torch Dataset
(view_synthesis/datasets/dataset.py:10-94).  All reference quirks are kept
because they shape the learned distribution:

  * object enumeration by sorted glob of */intrinsics.txt (dataset.py:40-41)
  * chairs train split prefers the chairs_2.0_train subdir (dataset.py:34-38)
  * mask = all channels != 255 (dataset.py:72)
  * center crop of height//8 / width//8 margins per side (dataset.py:76-78)
  * pose @ diag(1,-1,-1,1) OpenGL->OpenCV flip (dataset.py:80-81)
  * 4x4 intrinsic with crop-adjusted cx, cy (dataset.py:83-85)
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import imageio.v2 as imageio


class SRNDataset:
    def __init__(self, path: str, stage: str = "train",
                 use_native: bool = True):
        self.base_path = Path(path)
        self.dataset_name = self.base_path.stem.split("_")[-1]
        self.base_path = self.base_path / f"{self.dataset_name}_{stage}"
        self.stage = stage
        assert self.base_path.exists(), f"{self.base_path} does not exist"

        if "chair" in self.dataset_name and stage == "train":
            alt = self.base_path / "chairs_2.0_train"
            if alt.exists():
                self.base_path = alt

        self.intrinsic_files = sorted(self.base_path.glob("*/intrinsics.txt"))
        self.num_objects = len(self.intrinsic_files)

        self.rgb_files = []
        self.pose_files = []
        for index, intrinsic_path in enumerate(self.intrinsic_files):
            rgb_dir = intrinsic_path.parent / "rgb"
            pose_dir = intrinsic_path.parent / "pose"
            self.rgb_files.extend(sorted((index, p) for p in rgb_dir.iterdir()))
            self.pose_files.extend(sorted((index, p) for p in pose_dir.iterdir()))
        assert len(self.rgb_files) == len(self.pose_files)
        self.num_views = (len(self.rgb_files) // self.num_objects
                          if self.num_objects else 0)
        self.use_native = use_native

    def _read_intrinsics(self, object_index: int):
        with open(self.intrinsic_files[object_index]) as f:
            lines = f.readlines()
            focal, cx, cy, _ = map(float, lines[0].split())
            height, width = map(int, lines[-1].split())
        return focal, cx, cy, height, width

    def intrinsics_homogeneous(self, rtol: float = 1e-5) -> bool:
        """True when every object's intrinsics.txt agrees with the first.

        Real SRN objects each carry their OWN intrinsics.txt (reference
        dataset.py:66-69), but the experiment harness — like the reference
        (train.py:51-52) — probes ONE sample and builds a single
        pixel-direction grid for the whole dataset.  Heterogeneous focal
        lengths would silently mis-render every non-probed object, so the
        harness calls this and fails loudly instead (harness.py).  Cached
        after the first call (one small text file per object).
        """
        cached = getattr(self, "_intrinsics_homogeneous", None)
        if cached is not None:
            return cached
        vals = [self._read_intrinsics(i) for i in range(self.num_objects)]
        hom = all(np.allclose(v, vals[0], rtol=rtol) for v in vals[1:])
        self._intrinsics_homogeneous = hom
        return hom

    def _meta_for(self, index: int):
        """(object_id, intrinsic, pose) — everything except pixels."""
        object_index, _ = self.rgb_files[index]
        _, pose_filename = self.pose_files[index]
        focal, cx, cy, height, width = self._read_intrinsics(object_index)
        ch, cw = height // 8, width // 8
        pose = np.loadtxt(pose_filename).reshape(4, 4)
        pose = pose @ np.diag([1.0, -1.0, -1.0, 1.0])
        intrinsic = np.eye(4)
        intrinsic[0, 0] = intrinsic[1, 1] = focal
        intrinsic[0, 2], intrinsic[1, 2] = cx - cw, cy - ch
        return (np.int32(object_index), intrinsic.astype(np.float32),
                pose.astype(np.float32), height, width)

    def load_views(self, indices, num_threads: int = 8) -> dict:
        """Batched load via the native (C++/libpng) pipeline when available,
        falling back to the per-item Python path."""
        from codenerf_tpu.data import native
        metas = [self._meta_for(int(i)) for i in indices]
        if self.use_native and native.available() and metas:
            height, width = metas[0][3], metas[0][4]
            probe = native.probe(self.rgb_files[int(indices[0])][1])
            if probe is not None and probe[:2] == (height, width):
                channels = probe[2]
                paths = [self.rgb_files[int(i)][1] for i in indices]
                colors, masks = native.load_batch(paths, height, width,
                                                 channels, num_threads)
                return {
                    "object_id": np.stack([m[0] for m in metas]),
                    "intrinsic": np.stack([m[1] for m in metas]),
                    "color": colors,
                    "mask": masks,
                    "pose": np.stack([m[2] for m in metas]),
                }
        samples = [self[int(i)] for i in indices]
        return {k: np.stack([s[k] for s in samples]) for k in samples[0]}

    def __len__(self):
        return len(self.rgb_files)

    def __getitem__(self, index: int) -> dict:
        object_index, rgb_filename = self.rgb_files[index]
        _, pose_filename = self.pose_files[index]
        intrinsic_filename = self.intrinsic_files[object_index]

        with open(intrinsic_filename) as f:
            lines = f.readlines()
            focal, cx, cy, _ = map(float, lines[0].split())
            height, width = map(int, lines[-1].split())

        rgb = np.asarray(imageio.imread(rgb_filename))
        mask = (rgb != 255).all(axis=-1)[..., None].astype(np.float32)
        rgb = rgb.astype(np.float32) / 255.0

        ch, cw = height // 8, width // 8
        rgb = rgb[cw:width - cw, ch:height - ch, ...]
        mask = mask[cw:width - cw, ch:height - ch, ...]

        pose = np.loadtxt(pose_filename).reshape(4, 4)
        pose = pose @ np.diag([1.0, -1.0, -1.0, 1.0])

        intrinsic = np.eye(4)
        intrinsic[0, 0] = intrinsic[1, 1] = focal
        intrinsic[0, 2], intrinsic[1, 2] = cx - cw, cy - ch

        return {
            "object_id": np.int32(object_index),
            "intrinsic": intrinsic.astype(np.float32),
            "color": rgb.astype(np.float32),
            "mask": mask,
            "pose": pose.astype(np.float32),
        }
