#!/usr/bin/env python
"""Diagnose coarse-vs-fine quality from a checkpoint on a TRAIN view.

Renders one known training view (ground-truth pose + that object's learned
codes — no TTO) and reports coarse/fine PSNR plus raw-output statistics.
Built to chase the chairs anomaly where train fine loss plateaued ~25x
above coarse loss (metrics.jsonl, flagship-v2-chairs round 2).

    python tools/diag_fine.py -c configs/srn-chairs-code.yml \
        --load-checkpoint /root/logs/flagship-v2-chairs/checkpoints \
        dataset.basedir=/root/data/synthv2_chairs --platform cpu
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-c", "--config", required=True)
    ap.add_argument("--load-checkpoint", required=True)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--view", type=int, default=0,
                    help="train dataset index to render")
    ap.add_argument("--out", default="", help="optional PNG dump prefix")
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
    from codenerf_tpu.harness import Harness
    from codenerf_tpu.train.state import init_train_state
    from codenerf_tpu.train import checkpoint
    from codenerf_tpu.core.geometry import ray_bundle
    from codenerf_tpu.pipeline import render_rays
    from codenerf_tpu.models.codes import lookup_codes

    cfg = load_config(args.config, overrides=args.overrides)
    harness = Harness.from_config(cfg, make_devices_mesh=False)
    state, _ = init_train_state(jax.random.PRNGKey(0), cfg, harness.settings,
                                harness.train_dataset.num_objects)
    state = checkpoint.restore_checkpoint(args.load_checkpoint, state)
    print(f"Restored step {int(state.step)}")

    sample = harness.train_dataset[args.view]
    target = np.asarray(sample["color"])          # [H, W, 3]
    pose = jnp.asarray(sample["pose"])
    obj = int(sample["object_id"])
    H, W = target.shape[:2]
    ro, rd = ray_bundle(harness.directions, pose[None])
    ro = ro.reshape(-1, 3)
    rd = rd.reshape(-1, 3)
    z_s, z_t = lookup_codes(state.params["codes"],
                            jnp.full((ro.shape[0],), obj, jnp.int32))

    settings = harness.settings
    CH = 4096
    outs_c, outs_f, raws = [], [], []
    for i in range(0, ro.shape[0], CH):
        sl = slice(i, i + CH)
        out_c, out_f = render_rays(
            {"coarse": state.params["coarse"],
             "fine": state.params["fine"]}, settings, ro[sl], rd[sl],
            None if z_s is None else z_s[sl],
            None if z_t is None else z_t[sl], None, False)
        outs_c.append(np.asarray(out_c.rgb, np.float32))
        outs_f.append(np.asarray(out_f.rgb, np.float32))
        raws.append((np.asarray(out_f.acc, np.float32),
                     np.asarray(out_f.depth, np.float32),
                     np.asarray(out_c.acc, np.float32)))
    rgb_c = np.concatenate(outs_c).reshape(H, W, 3)
    rgb_f = np.concatenate(outs_f).reshape(H, W, 3)
    acc_f = np.concatenate([r[0] for r in raws])
    dep_f = np.concatenate([r[1] for r in raws])
    acc_c = np.concatenate([r[2] for r in raws])

    def psnr(a, b):
        mse = float(np.mean((a - b) ** 2))
        return -10.0 * np.log10(mse)

    print(f"view {args.view} object {obj}  H={H} W={W}")
    print(f"coarse PSNR {psnr(rgb_c, target):7.3f}   "
          f"fine PSNR {psnr(rgb_f, target):7.3f}")
    print(f"acc  coarse mean {acc_c.mean():.4f}  fine mean {acc_f.mean():.4f}")
    print(f"fine depth min/mean/max {dep_f.min():.3f} {dep_f.mean():.3f} "
          f"{dep_f.max():.3f}")
    print(f"fine rgb min/mean/max {rgb_f.min():.3f} {rgb_f.mean():.3f} "
          f"{rgb_f.max():.3f}  target mean {target.mean():.3f}")

    if args.out:
        from PIL import Image
        for tag, im in [("coarse", rgb_c), ("fine", rgb_f),
                        ("target", target)]:
            Image.fromarray((np.clip(im, 0, 1) * 255).astype(np.uint8)).save(
                f"{args.out}_{tag}.png")
        print(f"wrote {args.out}_{{coarse,fine,target}}.png")


if __name__ == "__main__":
    main()
