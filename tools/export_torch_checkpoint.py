#!/usr/bin/env python
"""Convert one of our Orbax checkpoints into a reference .ckpt file.

The output matches the dict the reference's train.py saves
(train.py:130-136) so its load_checkpoint (util.py:175-213) and eval can
consume models trained here:

    python tools/export_torch_checkpoint.py -c config/srn-cars-code.yml \
        --ckpt logs/<id>/checkpoints --out /path/to/checkpoint50000.ckpt
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("-c", "--config", required=True,
                        help="YAML config the checkpoint was trained with.")
    parser.add_argument("--ckpt", required=True,
                        help="Orbax checkpoint directory.")
    parser.add_argument("--out", required=True,
                        help="Output .ckpt path (torch.save format).")
    parser.add_argument("--platform", type=str, default="cpu",
                        help="jax platform for the conversion (default cpu).")
    parser.add_argument("overrides", nargs="*",
                        help="Dotted config overrides.")
    args = parser.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from codenerf_tpu.config import load_config
    from codenerf_tpu.pipeline import RenderSettings
    from codenerf_tpu.train.torch_import import export_torch_checkpoint

    cfg = load_config(args.config, overrides=args.overrides)
    settings = RenderSettings.from_config(cfg)
    step = export_torch_checkpoint(args.ckpt, cfg, settings, args.out)
    print(f"Exported {args.ckpt} (iter {step}) -> {args.out}")


if __name__ == "__main__":
    main()
