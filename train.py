#!/usr/bin/env python
"""Train a (Code)NeRF model.

TPU-native counterpart of the reference train CLI (reference train.py:182-203):

    python train.py -c config/srn-cars-code.yml [--load-checkpoint DIR]
                    [overrides like optimizer.lr=3e-4 ...]

Differences from the reference by design: no --gpus/--distributed flags — the
run uses every visible device through one jax mesh (multi-host via
jax.distributed when launched per-host); checkpoints are Orbax directories.
"""

import argparse
import dataclasses


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("-c", "--config", type=str, required=True,
                        help="Path to (.yml) config file.")
    parser.add_argument("--load-checkpoint", type=str, default="",
                        help="Orbax checkpoint directory to resume from.")
    parser.add_argument("--max-steps", type=int, default=None,
                        help="Cap the number of training steps (smoke runs).")
    parser.add_argument("--multihost", action="store_true",
                        help="Call jax.distributed.initialize() (pod slices).")
    parser.add_argument("--platform", type=str, default=None,
                        help="Force a jax platform (e.g. cpu for smoke runs).")
    # reference-CLI compatibility (reference train.py:193-196): the mesh is
    # automatic here, so these only bound the device count / no-op
    parser.add_argument("-g", "--gpus", type=int, default=0,
                        help="Compat: cap the number of devices used "
                             "(reference -g flag; 0 = all).")
    parser.add_argument("--distributed", action="store_true",
                        help="Compat no-op: data parallelism over all "
                             "devices is automatic.")
    parser.add_argument("overrides", nargs="*",
                        help="Dotted config overrides, e.g. optimizer.lr=3e-4")
    args = parser.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    from codenerf_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    if args.multihost:
        jax.distributed.initialize()

    from codenerf_tpu.config import load_config
    from codenerf_tpu.train.loop import run_training

    cfg = load_config(args.config, overrides=args.overrides)
    if args.load_checkpoint:
        cfg = dataclasses.replace(
            cfg, runtime=dataclasses.replace(
                cfg.runtime, load_checkpoint=args.load_checkpoint))
    if args.gpus:
        cfg = dataclasses.replace(
            cfg, runtime=dataclasses.replace(cfg.runtime,
                                             num_devices=args.gpus))

    run_training(cfg, max_steps=args.max_steps)


if __name__ == "__main__":
    main()
