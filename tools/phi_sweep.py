#!/usr/bin/env python
"""Azimuth-sweep symmetry proof for TTO pose residuals (VERDICT round-4
item 6).

The chairs category eval leaves some objects at ~2 rad pose error with
GOOD renders and dPSNR(GT pose) within the view-overfit band — explained
as rotational symmetry of the procedural chairs, but for two objects the
proof was by calibration only.  This tool measures the claim directly:

  1. run the standard single-view TTO protocol (full campaign settings:
     multi-start probing + flip rescue via harness.validate_batched) for
     the selected val objects and capture the recovered codes/poses;
  2. sweep the camera azimuth phi over the full circle at the RECOVERED
     elevation/radius, rendering the reconstruction against the target
     view at every grid point;
  3. report the photometric loss profile: its local minima, the loss at
     the recovered basin vs at the ground-truth azimuth, and the minima
     spacing.

A (near-)tie between the GT-azimuth basin and the recovered basin, with
minima spaced at the symmetry angle, PROVES the residual pose error is an
object symmetry (TTO converged to an equivalent camera); a GT basin
substantially deeper than the recovered one would prove mislocalization.

Reference anchor: eval.py:161-162 (the SE3-log pose metric whose ~2 rad
chairs readings this closes out).

Usage (real TPU, ~10 min warm):
  python tools/phi_sweep.py -c configs/srn-chairs-code.yml \
      --load-checkpoint /root/logs/flagship-v3-chairs/checkpoints \
      --objects 2 5 --sweep 144 \
      dataset.basedir=/root/data/synthv3_chairs \
      experiment.logdir=/root/logs \
      optimizer.pose_restarts=8 optimizer.pose_flip_steps=300
"""

import argparse
import json
import math
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-c", "--config", required=True)
    ap.add_argument("--load-checkpoint", required=True)
    ap.add_argument("--objects", type=int, nargs="+", required=True,
                    help="val-object indices (the category-eval table's "
                         "object column)")
    ap.add_argument("--sweep", type=int, default=144,
                    help="number of azimuth grid points over [0, 2pi)")
    ap.add_argument("--num-objects", type=int, default=None)
    ap.add_argument("--platform", type=str, default=None)
    ap.add_argument("overrides", nargs="*")
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    from codenerf_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax.numpy as jnp
    import numpy as np
    from codenerf_tpu.config import load_config
    from codenerf_tpu.core.geometry import pose_spherical
    from codenerf_tpu.core.metrics import mse2psnr
    from codenerf_tpu.eval.render import make_image_renderer
    from codenerf_tpu.harness import (Harness, _distinct_val_objects,
                                      validate_batched)
    from codenerf_tpu.train.state import init_train_state
    from codenerf_tpu.train import checkpoint
    from codenerf_tpu.utils.logging import MetricLogger

    cfg = load_config(args.config, overrides=args.overrides)
    harness = Harness.from_config(cfg)
    logger = MetricLogger(harness.logdir)
    state, _ = init_train_state(jax.random.PRNGKey(cfg.experiment.randomseed),
                                cfg, harness.settings,
                                args.num_objects
                                or harness.train_dataset.num_objects)
    state = checkpoint.restore_checkpoint(args.load_checkpoint, state)
    print(f"Restored checkpoint at step {int(state.step)}")

    # the category-eval table indexes objects by _distinct_val_objects order
    distinct = _distinct_val_objects(harness)
    samples = [distinct[i] for i in args.objects]

    out = validate_batched(harness, state.params, logger, len(samples),
                           samples=samples, return_recovered=True)
    rec = out["recovered"]

    render = make_image_renderer(harness.settings, harness.height,
                                 harness.width,
                                 chunksize=cfg.nerf.validation.chunksize,
                                 mesh=harness.mesh)
    model_params = {"coarse": state.params["coarse"],
                    "fine": state.params["fine"]}

    phis = np.linspace(-math.pi, math.pi, args.sweep, endpoint=False)
    for oi, obj in enumerate(args.objects):
        theta_r = float(rec["theta"][oi])
        phi_r = float(rec["phi"][oi])
        rho_r = float(rec["rho"][oi])
        t = rec["poses_gt"][oi][:3, 3]
        rho_gt = float(np.linalg.norm(t))
        theta_gt = float(math.asin(np.clip(t[2] / rho_gt, -1.0, 1.0)))
        phi_gt = float(math.atan2(t[1], t[0]))
        target = rec["targets"][oi].reshape(-1, rec["targets"][oi].shape[-1])
        z_s = jnp.asarray(rec["z_s"][oi:oi + 1])
        z_t = jnp.asarray(rec["z_t"][oi:oi + 1])

        def loss_at(phi):
            pose = pose_spherical(jnp.asarray(theta_r), jnp.asarray(phi),
                                  jnp.asarray(rho_r))
            rgb = render(model_params, harness.directions, pose, z_s, z_t)
            return float(jnp.mean((rgb - target[..., :3]) ** 2))

        losses = np.array([loss_at(p) for p in phis])
        # circular local minima of the profile
        lo = np.roll(losses, 1)
        hi = np.roll(losses, -1)
        minima = np.where((losses < lo) & (losses <= hi))[0]
        # loss at the recovered and GT azimuths (nearest grid + exact)
        loss_rec = loss_at(phi_r)
        loss_gt = loss_at(phi_gt)
        tie = loss_rec / max(loss_gt, 1e-12)
        spacing = (np.sort(np.diff(np.sort(phis[minima])))
                   if len(minima) > 1 else np.array([]))
        print(f"\n[PHI-SWEEP] object {obj}: recovered (theta={theta_r:.3f}, "
              f"phi={phi_r:.3f}, rho={rho_r:.3f}); GT (theta={theta_gt:.3f}, "
              f"phi={phi_gt:.3f}, rho={rho_gt:.3f})")
        print(f"  azimuth separation |phi_rec - phi_gt| = "
              f"{abs((phi_r - phi_gt + math.pi) % (2 * math.pi) - math.pi):.3f} rad")
        print(f"  grid: {args.sweep} points; local minima at phi = "
              f"{np.array2string(phis[minima], precision=3)}")
        if len(spacing):
            print(f"  minima spacing: "
                  f"{np.array2string(spacing, precision=3)} rad")
        print(f"  loss at recovered phi: {loss_rec:.6f} "
              f"(psnr {float(mse2psnr(jnp.asarray(loss_rec))):.2f})")
        print(f"  loss at GT phi:        {loss_gt:.6f} "
              f"(psnr {float(mse2psnr(jnp.asarray(loss_gt))):.2f})")
        if tie < 1.15:
            verdict = ("NOT MISLOCALIZATION (recovered basin ties or "
                       "dominates the GT basin — no deeper basin at the "
                       "GT azimuth was missed)")
        elif tie > 1.5:
            verdict = ("MISLOCALIZATION (GT basin is substantially "
                       "deeper — TTO missed it)")
        else:
            verdict = "ambiguous"
        print(f"  basin ratio rec/GT: {tie:.3f} ({verdict})")
        print("  profile: " + json.dumps(
            {"phi": [round(float(p), 4) for p in phis],
             "loss": [round(float(l), 6) for l in losses]}))
    logger.close()


if __name__ == "__main__":
    main()
