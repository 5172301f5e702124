"""Dataset loaders against tiny synthetic on-disk datasets."""

import json

import numpy as np
import pytest
import imageio.v2 as imageio

from codenerf_tpu.data import (
    SRNDataset, BlenderNeRFDataset, LLFFDataset, BatchIterator, build_dataset,
)


@pytest.fixture
def srn_root(tmp_path):
    """Two-object SRN-style tree: <root>/cars_train/<obj>/{intrinsics.txt,rgb,pose}."""
    root = tmp_path / "srn_cars"
    base = root / "cars_train"
    rng = np.random.default_rng(0)
    H = W = 16
    for obj in ["obj_a", "obj_b"]:
        d = base / obj
        (d / "rgb").mkdir(parents=True)
        (d / "pose").mkdir()
        (d / "intrinsics.txt").write_text(
            f"20.0 {W/2} {H/2} 0.\n0. 0. 0.\n1.\n{H} {W}\n")
        for v in range(3):
            img = rng.integers(0, 255, size=(H, W, 3), dtype=np.uint8)
            img[:4, :4] = 255  # pure-white corner -> mask 0 there
            imageio.imwrite(d / "rgb" / f"{v:06d}.png", img)
            pose = np.eye(4)
            pose[:3, 3] = rng.normal(size=3)
            np.savetxt(d / "pose" / f"{v:06d}.txt", pose.reshape(1, 16))
    return root


class TestSRNDataset:
    def test_scan_and_sample(self, srn_root):
        ds = SRNDataset(str(srn_root), "train")
        assert ds.num_objects == 2
        assert ds.num_views == 3
        assert len(ds) == 6
        s = ds[0]
        # 16x16 image, crop 2 px per side -> 12x12
        assert s["color"].shape == (12, 12, 3)
        assert s["mask"].shape == (12, 12, 1)
        assert s["intrinsic"].shape == (4, 4)
        # crop-adjusted principal point: 8 - 2 = 6
        assert s["intrinsic"][0, 2] == pytest.approx(6.0)
        assert s["intrinsic"][0, 0] == pytest.approx(20.0)
        # white corner (partially cropped) must be masked out
        assert s["mask"][0, 0, 0] == 0.0
        # OpenGL->OpenCV: pose columns 1,2 negated vs identity
        assert s["pose"][1, 1] == pytest.approx(-1.0)
        assert s["pose"][2, 2] == pytest.approx(-1.0)
        assert s["object_id"] == 0
        assert ds[5]["object_id"] == 1

    def test_registry(self, srn_root):
        from codenerf_tpu.config.schema import DatasetConfig
        ds = build_dataset(DatasetConfig(type="SRNDataset",
                                         basedir=str(srn_root)), "train")
        assert len(ds) == 6


@pytest.fixture
def blender_root(tmp_path):
    root = tmp_path / "lego"
    root.mkdir()
    rng = np.random.default_rng(1)
    frames = []
    for stage in ["train", "val"]:
        for v in range(2):
            name = f"./{stage}/r_{v}"
            (root / stage).mkdir(exist_ok=True)
            img = rng.integers(0, 255, size=(16, 16, 4), dtype=np.uint8)
            imageio.imwrite(root / stage / f"r_{v}.png", img)
            pose = np.eye(4)
            pose[:3, 3] = rng.normal(size=3)
            frames.append({"file_path": name,
                           "transform_matrix": pose.tolist()})
        meta = {"camera_angle_x": 0.69, "frames": frames[-2:]}
        (root / f"transforms_{stage}.json").write_text(json.dumps(meta))
    return root


class TestBlenderDataset:
    def test_load(self, blender_root):
        ds = BlenderNeRFDataset(str(blender_root), "train")
        assert len(ds) == 2
        s = ds[0]
        assert s["color"].shape == (16, 16, 4)
        focal = 0.5 * 16 / np.tan(0.5 * 0.69)
        assert s["intrinsic"][0, 0] == pytest.approx(focal, rel=1e-5)
        assert s["mask"].shape == (16, 16, 1)

    def test_downsample(self, blender_root):
        ds = BlenderNeRFDataset(str(blender_root), "train", resolution_level=2)
        s = ds[0]
        assert s["color"].shape == (8, 8, 4)
        assert s["intrinsic"][0, 0] == pytest.approx(
            0.5 * 8 / np.tan(0.5 * 0.69), rel=1e-5)


@pytest.fixture
def llff_root(tmp_path):
    root = tmp_path / "fern"
    (root / "images").mkdir(parents=True)
    rng = np.random.default_rng(2)
    N, H, W = 6, 16, 24
    pb = np.zeros((N, 17))
    for i in range(N):
        img = rng.integers(0, 255, size=(H, W, 3), dtype=np.uint8)
        imageio.imwrite(root / "images" / f"img_{i:03d}.png", img)
        pose = np.eye(4)[:3]
        pose[:3, 3] = rng.normal(size=3) * 0.1
        hwf = np.array([H, W, 30.0]).reshape(3, 1)
        pb[i, :15] = np.concatenate([pose, hwf], axis=1).ravel()
        pb[i, 15:] = [1.0, 10.0]
    np.save(root / "poses_bounds.npy", pb)
    return root


class TestLLFFDataset:
    def test_split_and_load(self, llff_root):
        tr = LLFFDataset(str(llff_root), "train", downsample_factor=1,
                         llffhold=3)
        va = LLFFDataset(str(llff_root), "val", downsample_factor=1,
                         llffhold=3)
        assert len(tr) == 4 and len(va) == 2
        s = tr[0]
        assert s["color"].shape == (16, 24, 3)
        assert s["pose"].shape == (4, 4)
        assert np.isfinite(s["pose"]).all()

    def test_memory_downsample(self, llff_root):
        tr = LLFFDataset(str(llff_root), "train", downsample_factor=2,
                         llffhold=3)
        s = tr[0]
        assert s["color"].shape == (8, 12, 3)
        # focal rescaled by width ratio
        assert s["intrinsic"][0, 0] == pytest.approx(15.0, rel=1e-5)


class TestBatchIterator:
    def test_batching_and_seeding(self, srn_root):
        ds = SRNDataset(str(srn_root), "train")
        it1 = BatchIterator(ds, batch_size=4, seed=7)
        it2 = BatchIterator(ds, batch_size=4, seed=7)
        it3 = BatchIterator(ds, batch_size=4, seed=8)
        b1, b2, b3 = next(it1), next(it2), next(it3)
        assert b1["color"].shape == (4, 12, 12, 3)
        assert b1["pose"].shape == (4, 4, 4)
        np.testing.assert_array_equal(b1["object_id"], b2["object_id"])
        # different seed -> (almost surely) different draw sequence
        same = all(np.array_equal(next(it1)["color"], next(it3)["color"])
                   for _ in range(3))
        assert not same

    def test_fixed_batch_deterministic(self, srn_root):
        ds = SRNDataset(str(srn_root), "train")
        it = BatchIterator(ds, batch_size=2, seed=0)
        f1 = it.fixed_batch(start=5)
        f2 = it.fixed_batch(start=5)
        np.testing.assert_array_equal(f1["color"], f2["color"])


class TestNativeLoader:
    def test_native_matches_python_path(self, srn_root):
        from codenerf_tpu.data import native
        if not native.available():
            import pytest as _pytest
            _pytest.skip("native loader not built")
        ds_py = SRNDataset(str(srn_root), "train", use_native=False)
        ds_nat = SRNDataset(str(srn_root), "train", use_native=True)
        idx = [0, 2, 5]
        b_py = ds_py.load_views(idx)
        b_nat = ds_nat.load_views(idx)
        for k in ["color", "mask", "pose", "intrinsic", "object_id"]:
            np.testing.assert_allclose(b_nat[k], b_py[k], atol=1e-6,
                                       err_msg=k)

    def test_probe(self, srn_root):
        from codenerf_tpu.data import native
        if not native.available():
            import pytest as _pytest
            _pytest.skip("native loader not built")
        ds = SRNDataset(str(srn_root), "train")
        h, w, c = native.probe(ds.rgb_files[0][1])
        assert (h, w, c) == (16, 16, 3)


class TestPrefetchIterator:
    def test_prefetch_yields_same_stream(self, srn_root):
        from codenerf_tpu.data import PrefetchIterator
        ds = SRNDataset(str(srn_root), "train")
        plain = BatchIterator(ds, batch_size=2, seed=3)
        pref = PrefetchIterator(BatchIterator(ds, batch_size=2, seed=3))
        for _ in range(5):
            a, b = next(plain), next(pref)
            np.testing.assert_array_equal(a["object_id"], b["object_id"])
            np.testing.assert_array_equal(a["color"], b["color"])

    def test_prefetch_to_device(self, srn_root):
        """to_device=True uploads the batch on the prefetch thread (the
        transfer overlaps the previous step on a tunneled TPU)."""
        import jax
        from codenerf_tpu.data import PrefetchIterator
        ds = SRNDataset(str(srn_root), "train")
        plain = BatchIterator(ds, batch_size=2, seed=3)
        pref = PrefetchIterator(BatchIterator(ds, batch_size=2, seed=3),
                                to_device=True)
        a, b = next(plain), next(pref)
        assert isinstance(b["color"], jax.Array)
        assert isinstance(b["pose"], jax.Array)
        np.testing.assert_array_equal(a["color"], np.asarray(b["color"]))
        np.testing.assert_array_equal(a["object_id"],
                                      np.asarray(b["object_id"]))

    def test_prefetch_propagates_errors(self):
        from codenerf_tpu.data import PrefetchIterator

        def boom():
            yield {"x": 1}
            raise RuntimeError("decode failed")

        it = PrefetchIterator(boom())
        assert next(it) == {"x": 1}
        with pytest.raises(RuntimeError, match="decode failed"):
            next(it)


class TestSRNQuirks:
    def test_chairs_train_prefers_v2_subdir(self, tmp_path):
        """Reference dataset.py:34-38: chairs train split switches to the
        chairs_2.0_train subdirectory when present."""
        root = tmp_path / "srn_chairs"
        alt = root / "chairs_train" / "chairs_2.0_train" / "obj0"
        (alt / "rgb").mkdir(parents=True)
        (alt / "pose").mkdir()
        (alt / "intrinsics.txt").write_text("20. 8. 8. 0.\n0. 0. 0.\n1.\n16 16\n")
        img = np.zeros((16, 16, 3), dtype=np.uint8)
        imageio.imwrite(alt / "rgb" / "000000.png", img)
        np.savetxt(alt / "pose" / "000000.txt", np.eye(4).reshape(1, 16))
        ds = SRNDataset(str(root), "train")
        assert "chairs_2.0_train" in str(ds.base_path)
        assert ds.num_objects == 1

    def test_rgba_images_native_and_python_agree(self, tmp_path):
        root = tmp_path / "srn_cars"
        d = root / "cars_train" / "obj0"
        (d / "rgb").mkdir(parents=True)
        (d / "pose").mkdir()
        (d / "intrinsics.txt").write_text("20. 8. 8. 0.\n0. 0. 0.\n1.\n16 16\n")
        rng = np.random.default_rng(9)
        img = rng.integers(0, 255, size=(16, 16, 4), dtype=np.uint8)
        img[:3, :3] = 255
        imageio.imwrite(d / "rgb" / "000000.png", img)
        np.savetxt(d / "pose" / "000000.txt", np.eye(4).reshape(1, 16))

        py = SRNDataset(str(root), "train", use_native=False).load_views([0])
        assert py["color"].shape == (1, 12, 12, 4)
        from codenerf_tpu.data import native
        if native.available():
            nat = SRNDataset(str(root), "train").load_views([0])
            np.testing.assert_allclose(nat["color"], py["color"], atol=1e-6)
            np.testing.assert_allclose(nat["mask"], py["mask"], atol=1e-6)


def test_heterogeneous_intrinsics_contract(tmp_path):
    """Per-object focal variation (real SRN objects each carry their own
    intrinsics.txt, reference dataset.py:66-69) must be DETECTED by the
    dataset and REJECTED loudly by the harness, whose single probed
    direction grid (reference train.py:51-52 shares the assumption) would
    silently mis-render every non-probed object (VERDICT round-3 item 7)."""
    import subprocess, sys
    from pathlib import Path
    root = Path(__file__).resolve().parents[1]
    for jitter, expect_hom in [(0.0, True), (0.15, False)]:
        # keep "cars" as the basedir's last underscore token (the loader
        # derives the on-disk <name>_<stage> dir from it)
        out = tmp_path / f"fj{int(jitter * 100)}_cars"
        subprocess.run(
            [sys.executable, "tools/make_synth_data.py", "--out", str(out),
             "--name", "cars", "--objects", "2", "--val-objects", "2",
             "--views", "2", "--val-views", "2", "--size", "16",
             "--focal-jitter", str(jitter)],
            check=True, cwd=root, capture_output=True)
        ds = SRNDataset(str(out), "train")
        assert ds.intrinsics_homogeneous() is expect_hom

        from codenerf_tpu.config import load_config
        from codenerf_tpu.harness import Harness
        cfg = load_config(root / "configs" / "synth-smoke.yml", overrides=[
            f"dataset.basedir={out}", f"experiment.logdir={tmp_path}/logs",
            "experiment.id=fj", "runtime.compute_dtype=float32"])
        if expect_hom:
            Harness.from_config(cfg, make_devices_mesh=False)
        else:
            with pytest.raises(ValueError, match="heterogeneous"):
                Harness.from_config(cfg, make_devices_mesh=False)
    # the side rng keeps the rendered OBJECTS identical across jitter
    # settings only at jitter 0 for pixels (focal changes the image), but
    # pose files must agree exactly (object/camera draws undisturbed)
    p0 = np.loadtxt(tmp_path / "fj0_cars" / "cars_train" / "obj000"
                    / "pose" / "000000.txt")
    p15 = np.loadtxt(tmp_path / "fj15_cars" / "cars_train" / "obj000"
                     / "pose" / "000000.txt")
    np.testing.assert_allclose(p0, p15, atol=0)


def test_synth_writer_category_radius(tmp_path):
    """Generator cameras orbit at each config family's depth-window center
    (cars near/far 0.8-1.8 -> rho 1.3; chairs 1.25-2.75 -> rho 2.0)."""
    import subprocess, sys
    from pathlib import Path
    root = Path(__file__).resolve().parents[1]
    for name, rho in [("cars", 1.3), ("chairs", 2.0)]:
        out = tmp_path / f"synth_{name}"
        subprocess.run(
            [sys.executable, "tools/make_synth_data.py", "--out", str(out),
             "--name", name, "--objects", "1", "--views", "2",
             "--val-views", "1", "--size", "16"],
            check=True, cwd=root, capture_output=True)
        pose = np.loadtxt(out / f"{name}_train" / "obj000" / "pose"
                          / "000000.txt").reshape(4, 4)
        np.testing.assert_allclose(np.linalg.norm(pose[:3, 3]), rho,
                                   atol=1e-6)


class TestGeneratorSharding:
    """make_synth_data.py --only-stage/--obj-start/--obj-end (round 5):
    sharded generation must reproduce the sequential stream byte-for-byte
    — the paper-scale (2458-object) lineage is generated by parallel
    shards and its reproducibility rests on this invariant."""

    def _gen(self, out, extra):
        import subprocess, sys
        from pathlib import Path
        subprocess.run(
            [sys.executable, "tools/make_synth_data.py", "--out", str(out),
             "--name", "cars", "--objects", "4", "--val-objects", "2",
             "--views", "3", "--val-views", "2", "--size", "24",
             "--seed", "7"] + extra,
            check=True, cwd=Path(__file__).resolve().parents[1],
            capture_output=True)

    def test_shards_reproduce_sequential_run(self, tmp_path):
        full = tmp_path / "full"
        sh = tmp_path / "sharded"
        self._gen(full, [])
        self._gen(sh, ["--only-stage", "train", "--obj-start", "0",
                       "--obj-end", "2"])
        self._gen(sh, ["--only-stage", "train", "--obj-start", "2"])
        self._gen(sh, ["--only-stage", "val"])

        def tree_bytes(root):
            return {p.relative_to(root): p.read_bytes()
                    for p in sorted(root.rglob("*")) if p.is_file()}

        a, b = tree_bytes(full), tree_bytes(sh)
        assert set(a) == set(b)
        for rel in a:
            assert a[rel] == b[rel], f"shard output differs at {rel}"
