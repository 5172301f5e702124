#!/usr/bin/env python
"""Render novel views from a trained checkpoint.

Produces turntable PNG sequences like the reference's teaser assets
(reference assets/teaser.png): for a chosen object id, sweep the spherical
camera (theta) and render the full image with the fine model.

    python tools/render_views.py -c config.yml --load-checkpoint DIR \
        --object-id 0 --num-views 8 --out /tmp/views [--platform cpu]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-c", "--config", required=True)
    ap.add_argument("--load-checkpoint", required=True)
    ap.add_argument("--object-id", type=int, default=0)
    ap.add_argument("--num-views", type=int, default=8)
    ap.add_argument("--theta-range", type=float, nargs=2, default=[1.0, 2.1])
    ap.add_argument("--phi", type=float, default=0.0)
    ap.add_argument("--turntable", action="store_true",
                    help="sweep AZIMUTH (phi) over 2*pi at fixed elevation "
                         "theta = mean of --theta-range (theta is elevation "
                         "in the reference pose_spherical, eval.py:22-38; "
                         "the default theta sweep arcs over the pole)")
    ap.add_argument("--rho", type=float, default=1.30)
    ap.add_argument("--out", required=True)
    ap.add_argument("--int8", action="store_true",
                    help="serve through the int8 quantized path "
                         "(models/quantized.py), calibrated on rays from "
                         "the first view")
    ap.add_argument("--platform", default=None)
    ap.add_argument("overrides", nargs="*")
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    import numpy as np
    import imageio.v2 as imageio

    from codenerf_tpu.config import load_config
    from codenerf_tpu.core.geometry import pose_spherical
    from codenerf_tpu.eval.render import make_image_renderer
    from codenerf_tpu.harness import Harness
    from codenerf_tpu.train.state import init_train_state
    from codenerf_tpu.train import checkpoint

    cfg = load_config(args.config, overrides=args.overrides)
    harness = Harness.from_config(cfg)
    state, _ = init_train_state(jax.random.PRNGKey(0), cfg, harness.settings,
                                harness.train_dataset.num_objects)
    state = checkpoint.restore_checkpoint(args.load_checkpoint, state)
    print(f"Restored step {int(state.step)}")

    render = make_image_renderer(harness.settings, harness.height,
                                 harness.width,
                                 chunksize=cfg.nerf.validation.chunksize,
                                 mesh=harness.mesh)
    params = {"coarse": state.params["coarse"], "fine": state.params["fine"]}
    if harness.has_codes:
        tables = state.params["codes"]
        z_s = tables["shape"][args.object_id][None]
        z_t = tables["texture"][args.object_id][None]
    else:
        z_s = z_t = None

    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    if args.turntable:
        theta_fix = 0.5 * (args.theta_range[0] + args.theta_range[1])
        angles = [(theta_fix, p)
                  for p in np.linspace(0.0, 2.0 * np.pi, args.num_views,
                                       endpoint=False)]
    else:
        angles = [(t, args.phi)
                  for t in np.linspace(args.theta_range[0],
                                       args.theta_range[1], args.num_views)]
    if args.int8:
        from codenerf_tpu.harness import int8_render_params
        pose0 = pose_spherical(angles[0][0], angles[0][1], args.rho)
        params = int8_render_params(harness, params, pose0, z_s, z_t)
        print("serving through the int8 quantized path")
    for i, (theta, phi) in enumerate(angles):
        pose = pose_spherical(float(theta), float(phi), args.rho)
        rgb = render(params, harness.directions, pose, z_s, z_t)
        img = np.clip(np.asarray(rgb).reshape(harness.height, harness.width,
                                              3), 0, 1)
        path = out_dir / f"view_{i:03d}.png"
        imageio.imwrite(path, (img * 255).astype(np.uint8))
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
