#!/usr/bin/env python
"""Evaluate a trained CodeNeRF model via test-time optimization.

TPU-native counterpart of the reference eval CLI (reference eval.py:245-266):
optimizes shape/texture codes AND spherical camera pose for validation
objects, then renders the full image and reports PSNR + pose error.

    python eval.py -c config/srn-cars-code.yml --load-checkpoint LOGDIR/checkpoints
"""

import argparse
import dataclasses


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("-c", "--config", type=str, required=True,
                        help="Path to (.yml) config file.")
    parser.add_argument("--load-checkpoint", type=str, required=True,
                        help="Orbax checkpoint directory (required, as in "
                             "the reference eval.py:250-255).")
    parser.add_argument("--rounds", type=int, default=None,
                        help="Number of validation rounds (default: "
                             "iterations // val_batch_size as the reference).")
    parser.add_argument("--batch-objects", type=int, default=0,
                        help="Solve this many unseen objects' TTO problems "
                             "in ONE jitted step stream (beyond-reference "
                             "batched TTO; 0 = reference per-object loop).")
    parser.add_argument("--all-objects", action="store_true",
                        help="Category evaluation protocol: run TTO + "
                             "render for EVERY distinct val object, in "
                             "--batch-objects-sized groups, and print a "
                             "per-object table + category means.")
    parser.add_argument("--tto-views", type=int, default=1,
                        help="Multi-view TTO (beyond-reference): optimize "
                             "each object's codes against this many held-out "
                             "views jointly (one spherical camera per view) "
                             "— disambiguates near-symmetric objects that "
                             "single-view photometric TTO cannot.")
    parser.add_argument("--num-objects", type=int, default=None,
                        help="Size of the checkpoint's embedding tables when "
                             "it differs from the eval dataset's train-object "
                             "count (e.g. evaluating a 400-object-table "
                             "checkpoint against another lineage's val "
                             "split; TTO init only uses the table MEAN, so "
                             "val objects need not be table rows).")
    parser.add_argument("--multihost", action="store_true")
    parser.add_argument("--platform", type=str, default=None,
                        help="Force a jax platform (e.g. cpu for smoke runs).")
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    from codenerf_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    if args.multihost:
        jax.distributed.initialize()
    from codenerf_tpu.config import load_config
    from codenerf_tpu.harness import (Harness, validate, validate_batched,
                                      validate_category)
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
    if harness.mesh is not None:
        # restored arrays come back committed to one device; the TTO step
        # and image renderer are jitted over the mesh, so replicate (same
        # as train/loop.py's resume path)
        from codenerf_tpu.parallel.mesh import replicated_sharding
        state = jax.device_put(state, replicated_sharding(harness.mesh))
    print(f"Restored checkpoint at step {int(state.step)}")

    if args.all_objects:
        validate_category(harness, state.params, logger,
                          args.batch_objects or 4,
                          tto_views=args.tto_views)
    elif args.batch_objects:
        validate_batched(harness, state.params, logger, args.batch_objects,
                         tto_views=args.tto_views)
    else:
        rounds = args.rounds
        if rounds is None:
            rounds = max(1, cfg.experiment.iterations
                         // max(1, cfg.dataset.val_batch_size))
        for iteration in range(rounds):
            validate(harness, state.params, logger, iteration)
    logger.close()


if __name__ == "__main__":
    main()
