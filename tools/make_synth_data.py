#!/usr/bin/env python
"""Generate a tiny synthetic SRN-format dataset for smoke runs and CI.

Renders simple colored-sphere "objects" analytically (ray-sphere
intersection shading) from spherical camera poses, written in the exact
SRN directory layout the loader expects:

    <out>/<name>_<stage>/<obj>/{intrinsics.txt, rgb/*.png, pose/*.txt}

Usage: python tools/make_synth_data.py --out /tmp/synth_cars --objects 3 \
           --views 10 --size 32
"""

import argparse
from pathlib import Path

import numpy as np
import imageio.v2 as imageio


def spherical_pose(theta, phi, rho):
    """Same parametrization as codenerf_tpu.core.geometry.pose_spherical."""
    st, ct, sp, cp = np.sin(theta), np.cos(theta), np.sin(phi), np.cos(phi)
    c2w = np.eye(4)
    c2w[0, 0], c2w[1, 0] = -sp, cp
    c2w[0, 1], c2w[1, 1], c2w[2, 1] = -st * cp, -st * sp, ct
    c2w[0, 2], c2w[1, 2], c2w[2, 2] = ct * cp, ct * sp, st
    c2w[0, 3], c2w[1, 3], c2w[2, 3] = rho * ct * cp, rho * ct * sp, rho * st
    return c2w


def render_sphere(H, W, focal, pose, color, radius=0.35):
    """Analytic ray-traced lambertian sphere at the origin, white background."""
    ii, jj = np.meshgrid(np.arange(W, dtype=np.float64),
                         np.arange(H, dtype=np.float64), indexing="xy")
    dirs = np.stack([(ii - W / 2) / focal, -(jj - H / 2) / focal,
                     -np.ones_like(ii)], axis=-1)
    rd = dirs @ pose[:3, :3].T
    rd = rd / np.linalg.norm(rd, axis=-1, keepdims=True)
    ro = pose[:3, 3]

    b = 2 * np.sum(rd * ro, axis=-1)
    c = np.dot(ro, ro) - radius ** 2
    disc = b ** 2 - 4 * c
    hit = disc > 0
    t = np.where(hit, (-b - np.sqrt(np.maximum(disc, 0.0))) / 2, np.inf)
    p = ro + rd * t[..., None]
    n = p / radius
    light = np.array([0.5, 0.5, 0.7]) / np.linalg.norm([0.5, 0.5, 0.7])
    lam = np.clip(np.sum(n * light, axis=-1), 0.1, 1.0)
    img = np.ones((H, W, 3))
    img[hit] = color * lam[hit][..., None]
    return (img * 255).clip(0, 254.9).astype(np.uint8)


def write_blender(root: Path, rng, H, W, views, val_views):
    """nerf_synthetic-style tree: transforms_{train,val}.json + RGBA PNGs.

    Cameras use the same spherical parametrization; focal derives from a
    fixed camera_angle_x as the loader expects."""
    import json
    color = rng.uniform(0.2, 1.0, size=3)
    camera_angle_x = 2.0 * np.arctan(0.5 * W / (0.9 * W))
    for stage, n in [("train", views), ("val", val_views)]:
        (root / stage).mkdir(parents=True, exist_ok=True)
        frames = []
        for v in range(n):
            theta = rng.uniform(1.0, 2.1)
            phi = rng.uniform(-0.5, 0.5)
            pose = spherical_pose(theta, phi, 1.3)
            img = render_sphere(H, W, 0.5 * W / np.tan(0.5 * camera_angle_x),
                                pose, color)
            rgba = np.concatenate(
                [img, np.full_like(img[..., :1], 255)], axis=-1)
            imageio.imwrite(root / stage / f"r_{v}.png", rgba)
            frames.append({"file_path": f"./{stage}/r_{v}",
                           "transform_matrix": pose.tolist()})
        meta = {"camera_angle_x": float(camera_angle_x), "frames": frames}
        (root / f"transforms_{stage}.json").write_text(json.dumps(meta))
    print(f"Wrote synthetic Blender dataset to {root}")


def write_llff(root: Path, rng, H, W, views):
    """LLFF layout: images/ + poses_bounds.npy.

    Stored pose columns are [down, right, back] (the loader flips them back
    to [right, up, back]); the rendered sphere sits at the world origin and
    the loader's recentering applies one rigid transform to every camera, so
    the multi-view scene stays consistent."""
    (root / "images").mkdir(parents=True, exist_ok=True)
    color = rng.uniform(0.2, 1.0, size=3)
    focal = 0.9 * W
    pb = np.zeros((views, 17))
    for v in range(views):
        theta = rng.uniform(1.3, 1.9)
        phi = rng.uniform(-0.3, 0.3)
        pose = spherical_pose(theta, phi, 1.3)
        img = render_sphere(H, W, focal, pose, color)
        imageio.imwrite(root / "images" / f"img_{v:03d}.png", img)
        right, up, back, t = (pose[:3, 0], pose[:3, 1], pose[:3, 2],
                              pose[:3, 3])
        stored = np.stack([-up, right, back, t], axis=1)       # [3, 4]
        hwf = np.array([H, W, focal]).reshape(3, 1)
        pb[v, :15] = np.concatenate([stored, hwf], axis=1).ravel()
        pb[v, 15:] = [0.5, 2.5]
    np.save(root / "poses_bounds.npy", pb)
    print(f"Wrote synthetic LLFF dataset to {root}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--name", default="cars")
    ap.add_argument("--format", choices=["srn", "blender", "llff"],
                    default="srn")
    ap.add_argument("--objects", type=int, default=3)
    ap.add_argument("--views", type=int, default=10)
    ap.add_argument("--val-views", type=int, default=4)
    ap.add_argument("--size", type=int, default=32)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    H = W = args.size
    focal = 0.9 * args.size
    root = Path(args.out)

    if args.format == "blender":
        write_blender(root, rng, H, W, args.views, args.val_views)
        return
    if args.format == "llff":
        write_llff(root, rng, H, W, args.views)
        return

    for stage, n_views in [("train", args.views), ("val", args.val_views)]:
        for o in range(args.objects):
            d = root / f"{args.name}_{stage}" / f"obj{o:03d}"
            (d / "rgb").mkdir(parents=True, exist_ok=True)
            (d / "pose").mkdir(parents=True, exist_ok=True)
            (d / "intrinsics.txt").write_text(
                f"{focal} {W/2} {H/2} 0.\n0. 0. 0.\n1.\n{H} {W}\n")
            color = rng.uniform(0.2, 1.0, size=3)
            for v in range(n_views):
                theta = rng.uniform(1.0, 2.1)
                phi = rng.uniform(-0.5, 0.5)
                rho = 1.3
                pose_gl = spherical_pose(theta, phi, rho)
                img = render_sphere(H, W, focal, pose_gl, color)
                imageio.imwrite(d / "rgb" / f"{v:06d}.png", img)
                # loader applies diag(1,-1,-1,1) on read; store the
                # pre-flip (OpenGL) pose so it round-trips
                pose_store = pose_gl @ np.diag([1.0, -1.0, -1.0, 1.0])
                np.savetxt(d / "pose" / f"{v:06d}.txt",
                           pose_store.reshape(1, 16))
    print(f"Wrote synthetic SRN dataset to {root}")


if __name__ == "__main__":
    main()
