#!/usr/bin/env python
"""Convert a reference torch checkpoint (.ckpt) into an Orbax checkpoint.

Lets a user of the reference implementation bring an already-trained model
into this framework (reference checkpoint format: train.py:129-138):

    python tools/import_torch_checkpoint.py -c config/srn-cars-code.yml \
        --ckpt logs/car/checkpoint50000.ckpt --out /path/to/orbax_ckpt

then train/eval with ``--load-checkpoint /path/to/orbax_ckpt``.
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
                        help="Reference .ckpt file (torch.save format).")
    parser.add_argument("--out", required=True,
                        help="Output Orbax checkpoint directory.")
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
    from codenerf_tpu.train.torch_import import import_torch_checkpoint

    cfg = load_config(args.config, overrides=args.overrides)
    settings = RenderSettings.from_config(cfg)
    step = import_torch_checkpoint(args.ckpt, cfg, settings, args.out)
    print(f"Imported {args.ckpt} (iter {step}) -> {args.out}")


if __name__ == "__main__":
    main()
