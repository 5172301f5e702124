"""Subprocess smoke tests for the CLI entry points (argparse wiring,
platform override, override plumbing)."""

import subprocess
import sys
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parents[1]


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("clisynth") / "srn_cars"
    subprocess.run(
        [sys.executable, "tools/make_synth_data.py", "--out", str(root),
         "--objects", "2", "--views", "3", "--val-views", "2",
         "--size", "16"],
        check=True, cwd=ROOT, capture_output=True)
    return root


def test_train_cli_end_to_end(synth_root, tmp_path):
    res = subprocess.run(
        [sys.executable, "train.py", "-c", "configs/synth-smoke.yml",
         "--platform", "cpu", "--max-steps", "3",
         f"dataset.basedir={synth_root}",
         f"experiment.logdir={tmp_path}",
         "experiment.id=cli", "experiment.print_every=1",
         "experiment.save_every=100000",
         "nerf.ray_sampler.num_random_rays=16",
         "nerf.point_sampler.num_coarse=4", "nerf.point_sampler.num_fine=4",
         "models.nerf_coarse.hidden_size=8", "models.nerf_fine.hidden_size=8",
         "models.embedding.shape_code_size=8",
         "models.embedding.texture_code_size=8",
         "nerf.embedder.num_encoding_fn_xyz=2",
         "nerf.embedder.num_encoding_fn_dir=2",
         "runtime.compute_dtype=float32"],
        cwd=ROOT, capture_output=True, text=True, timeout=300)
    assert res.returncode == 0, res.stderr[-2000:]
    assert "[TRAIN ]" in res.stdout
    assert (tmp_path / "cli" / "config.yml").exists()
    assert (tmp_path / "cli" / "metrics.jsonl").exists()


def test_train_cli_lego_vanilla_nerf(tmp_path):
    """BASELINE.json config #1: the reference's (stale — SURVEY §3.6)
    lego.yml drives a working Blender + FlexibleNeRF train end-to-end."""
    data = tmp_path / "lego"
    subprocess.run(
        [sys.executable, "tools/make_synth_data.py", "--out", str(data),
         "--format", "blender", "--views", "3", "--val-views", "2",
         "--size", "16"],
        check=True, cwd=ROOT, capture_output=True)
    res = subprocess.run(
        [sys.executable, "train.py", "-c",
         "/root/reference/config/lego.yml",
         "--platform", "cpu", "--max-steps", "3",
         f"dataset.basedir={data}",
         f"experiment.logdir={tmp_path}/logs",
         "experiment.id=lego", "experiment.print_every=1",
         "experiment.save_every=100000",
         "nerf.ray_sampler.num_random_rays=16",
         "nerf.point_sampler.num_coarse=4", "nerf.point_sampler.num_fine=4",
         "models.nerf_coarse.hidden_size=8", "models.nerf_fine.hidden_size=8",
         "nerf.embedder.num_encoding_fn_xyz=2",
         "nerf.embedder.num_encoding_fn_dir=2",
         "runtime.compute_dtype=float32"],
        cwd=ROOT, capture_output=True, text=True, timeout=300)
    assert res.returncode == 0, res.stderr[-2000:]
    assert "[TRAIN ]" in res.stdout


def test_train_cli_fern_llff(tmp_path):
    """BASELINE.json config #2: the reference's oldest-schema fern.yml
    (llff dataset, coarse+fine FlexibleNeRF) trains end-to-end."""
    data = tmp_path / "fern"
    subprocess.run(
        [sys.executable, "tools/make_synth_data.py", "--out", str(data),
         "--format", "llff", "--views", "6", "--size", "16"],
        check=True, cwd=ROOT, capture_output=True)
    res = subprocess.run(
        [sys.executable, "train.py", "-c",
         "/root/reference/config/fern.yml",
         "--platform", "cpu", "--max-steps", "3",
         f"dataset.basedir={data}",
         "dataset.downsample_factor=1",
         f"experiment.logdir={tmp_path}/logs",
         "experiment.id=fern", "experiment.print_every=1",
         "experiment.save_every=100000",
         "nerf.ray_sampler.num_random_rays=16",
         "nerf.point_sampler.num_coarse=4", "nerf.point_sampler.num_fine=4",
         "models.nerf_coarse.hidden_size=8", "models.nerf_fine.hidden_size=8",
         "nerf.embedder.num_encoding_fn_xyz=2",
         "nerf.embedder.num_encoding_fn_dir=2",
         "runtime.compute_dtype=float32"],
        cwd=ROOT, capture_output=True, text=True, timeout=300)
    assert res.returncode == 0, res.stderr[-2000:]
    assert "[TRAIN ]" in res.stdout


def test_train_cli_srn_vanilla_nerf(synth_root, tmp_path):
    """BASELINE.json config #3: srn-cars.yml — SRN dataset + vanilla
    FlexibleNeRF (another reference-stale combination made to work)."""
    res = subprocess.run(
        [sys.executable, "train.py", "-c",
         "/root/reference/config/srn-cars.yml",
         "--platform", "cpu", "--max-steps", "3",
         f"dataset.basedir={synth_root}",
         f"experiment.logdir={tmp_path}/logs",
         "experiment.id=srnvan", "experiment.print_every=1",
         "experiment.save_every=100000",
         "nerf.ray_sampler.num_random_rays=16",
         "nerf.point_sampler.num_coarse=4", "nerf.point_sampler.num_fine=4",
         "models.nerf_coarse.hidden_size=8", "models.nerf_fine.hidden_size=8",
         "nerf.embedder.num_encoding_fn_xyz=2",
         "nerf.embedder.num_encoding_fn_dir=2",
         "runtime.compute_dtype=float32"],
        cwd=ROOT, capture_output=True, text=True, timeout=300)
    assert res.returncode == 0, res.stderr[-2000:]
    assert "[TRAIN ]" in res.stdout


def test_eval_cli_tto_round_trip(synth_root, tmp_path):
    """BASELINE.json config #5's shape: train -> checkpoint -> eval.py TTO
    (code + pose optimization) -> full-image render PSNR."""
    shrink = [
        "nerf.ray_sampler.num_random_rays=16",
        "nerf.point_sampler.num_coarse=4", "nerf.point_sampler.num_fine=4",
        "models.nerf_coarse.hidden_size=8", "models.nerf_fine.hidden_size=8",
        "models.embedding.shape_code_size=8",
        "models.embedding.texture_code_size=8",
        "nerf.embedder.num_encoding_fn_xyz=2",
        "nerf.embedder.num_encoding_fn_dir=2",
        "runtime.compute_dtype=float32",
    ]
    res = subprocess.run(
        [sys.executable, "train.py", "-c", "configs/synth-smoke.yml",
         "--platform", "cpu", "--max-steps", "2",
         f"dataset.basedir={synth_root}",
         f"experiment.logdir={tmp_path}/logs", "experiment.id=rt",
         "experiment.print_every=1", "experiment.save_every=2"] + shrink,
        cwd=ROOT, capture_output=True, text=True, timeout=300)
    assert res.returncode == 0, res.stderr[-2000:]
    ckpt = tmp_path / "logs" / "rt" / "checkpoints"
    assert ckpt.exists()
    res = subprocess.run(
        [sys.executable, "eval.py", "-c", "configs/synth-smoke.yml",
         "--platform", "cpu", "--load-checkpoint", str(ckpt), "--rounds", "1",
         f"dataset.basedir={synth_root}",
         f"experiment.logdir={tmp_path}/logs", "experiment.id=rt",
         "experiment.val_iterations=3",
         "optimizer.pose_flip_steps=2"] + shrink,
        cwd=ROOT, capture_output=True, text=True, timeout=300)
    assert res.returncode == 0, res.stderr[-2000:]
    assert "[VALOPT]" in res.stdout
    # the azimuth-flip rescue also runs on the unbatched eval path
    assert "azimuth-flip rescue (2 steps)" in res.stdout
    assert "[VAL   ]" in res.stdout


def test_eval_cli_batched_tto(synth_root, tmp_path):
    """--batch-objects: K objects' TTO problems in one jitted step stream,
    with per-object multi-start pose probing."""
    shrink = [
        "nerf.ray_sampler.num_random_rays=16",
        "nerf.point_sampler.num_coarse=4", "nerf.point_sampler.num_fine=4",
        "models.nerf_coarse.hidden_size=8", "models.nerf_fine.hidden_size=8",
        "models.embedding.shape_code_size=8",
        "models.embedding.texture_code_size=8",
        "nerf.embedder.num_encoding_fn_xyz=2",
        "nerf.embedder.num_encoding_fn_dir=2",
        "runtime.compute_dtype=float32",
    ]
    res = subprocess.run(
        [sys.executable, "train.py", "-c", "configs/synth-smoke.yml",
         "--platform", "cpu", "--max-steps", "2",
         f"dataset.basedir={synth_root}",
         f"experiment.logdir={tmp_path}/logs", "experiment.id=bt",
         "experiment.print_every=1", "experiment.save_every=2"] + shrink,
        cwd=ROOT, capture_output=True, text=True, timeout=300)
    assert res.returncode == 0, res.stderr[-2000:]
    res = subprocess.run(
        [sys.executable, "eval.py", "-c", "configs/synth-smoke.yml",
         "--platform", "cpu",
         "--load-checkpoint", str(tmp_path / "logs" / "bt" / "checkpoints"),
         "--batch-objects", "3",
         f"dataset.basedir={synth_root}",
         f"experiment.logdir={tmp_path}/logs", "experiment.id=bt",
         "experiment.val_iterations=3", "optimizer.pose_restarts=2",
         "optimizer.pose_restart_steps=2",
         "optimizer.pose_flip_steps=2"] + shrink,
        cwd=ROOT, capture_output=True, text=True, timeout=300)
    assert res.returncode == 0, res.stderr[-2000:]
    assert "batched pose multi-start" in res.stdout
    assert "azimuth-flip rescue (2 steps)" in res.stdout
    assert "batched TTO: 3 objects" in res.stdout
    assert "PSNR mean" in res.stdout
    # category protocol: every distinct val object, groups of 3 (2 objects
    # here -> one padded group), per-object table + means.  --tto-views 2
    # exercises the multi-view TTO path (shared codes, per-view cameras)
    # and every row carries the GT-pose symmetry-equivalence column.
    res = subprocess.run(
        [sys.executable, "eval.py", "-c", "configs/synth-smoke.yml",
         "--platform", "cpu",
         "--load-checkpoint", str(tmp_path / "logs" / "bt" / "checkpoints"),
         "--all-objects", "--batch-objects", "3", "--tto-views", "2",
         f"dataset.basedir={synth_root}",
         f"experiment.logdir={tmp_path}/logs", "experiment.id=bt",
         "experiment.val_iterations=3"] + shrink,
        cwd=ROOT, capture_output=True, text=True, timeout=300)
    assert res.returncode == 0, res.stderr[-2000:]
    assert "category evaluation over 2 objects" in res.stdout
    assert "2 views/object" in res.stdout
    assert "dPSNR(GT pose)" in res.stdout
    assert "mean   |" in res.stdout


def test_train_cli_rejects_bad_override(synth_root, tmp_path):
    res = subprocess.run(
        [sys.executable, "train.py", "-c", "configs/synth-smoke.yml",
         "--platform", "cpu", "--max-steps", "1", "bogus.key=1"],
        cwd=ROOT, capture_output=True, text=True, timeout=120)
    assert res.returncode != 0
    assert "unknown config key" in (res.stderr + res.stdout)


def test_eval_cli_requires_checkpoint(tmp_path):
    res = subprocess.run(
        [sys.executable, "eval.py", "-c", "configs/synth-smoke.yml",
         "--platform", "cpu"],
        cwd=ROOT, capture_output=True, text=True, timeout=120)
    assert res.returncode != 0  # --load-checkpoint is required


def test_multihost_distributed_training():
    """Two real jax.distributed processes over one 8-device mesh."""
    res = subprocess.run(
        [sys.executable, "tools/multihost_smoke.py", "--port", "53711"],
        cwd=ROOT, capture_output=True, text=True, timeout=280)
    assert res.returncode == 0, res.stdout[-2000:] + res.stderr[-500:]
    assert "multihost_smoke: PASS" in res.stdout


def test_tpu_selftest_cpu_smoke():
    """tools/tpu_selftest.py harness stays runnable (interpret mode on CPU;
    the compiled-kernel assertion it exists for needs the real chip)."""
    res = subprocess.run(
        [sys.executable, "tools/tpu_selftest.py", "--platform", "cpu",
         "--families", "layer_bwd,int8", "--rays", "32", "--samples", "8",
         "--hidden", "32"],
        cwd=ROOT, capture_output=True, text=True, timeout=280)
    assert res.returncode == 0, res.stdout[-2000:] + res.stderr[-500:]
    assert "SELFTEST PASS" in res.stdout
