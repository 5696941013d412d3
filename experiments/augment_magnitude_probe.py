#!/usr/bin/env python
"""Augment magnitude probe: does the augment TRAINING PATH converge when
the ops don't destroy the toy task's visual SNR? (round 5)

The production-config e2e (PERF.md round-5 section) showed reference-
strength RandAugment (magnitude 5) pushes the 64-word synthetic task into
a blind-language-model basin: train CE plateaus at the label-statistics
floor (~1.17) and the model predicts one word for every image. Diagnostics
acquitted the pipeline (op-recipe parity, identity transparency, a
clean-trained model reads m=5-augmented images at only 36.5%), leaving one
question open: is the augment data path TRAINABLE at all, end to end?

This runs the identical full workflow with the RandAugment magnitude
monkeypatched down (default 2) so the visual signal survives — same ops,
same sampling, same LUT Poisson sampler, same u8 transport, same in-jit
normalize, same command path (cli.train -> cli.test -> cli.read). If the
collapse were a data-path defect (label misalignment, value-range error,
normalize mismatch), it would persist at ANY magnitude; if it is the
documented SNR basin, m=2 converges.

Run: python experiments/augment_magnitude_probe.py [--magnitude 2]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--magnitude', type=float, default=2.0)
    ap.add_argument('--root', default='/tmp/e2e_augmag')
    ap.add_argument('--steps', type=int, default=1500)
    args = ap.parse_args()

    from parseq_tpu.data import augment

    orig = augment.rand_augment_transform

    def patched(magnitude=5, num_layers=3):
        return orig(magnitude=args.magnitude, num_layers=num_layers)

    augment.rand_augment_transform = patched
    # get_transform imports rand_augment_transform from the module at call
    # time, so the patch reaches every loader built after this point.

    from experiments import e2e_full_workflow

    sys.argv = ['e2e_full_workflow', '--root', args.root,
                '--steps', str(args.steps), '--augment']
    print(f'=== full workflow with RandAugment magnitude {args.magnitude} ===',
          flush=True)
    e2e_full_workflow.main()


if __name__ == '__main__':
    main()
