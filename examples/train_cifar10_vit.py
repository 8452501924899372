"""CIFAR-10 ViT (beyond-reference model family #3).

Same data/Trainer as the ResNet-8 stretch workload, transformer
architecture: 4x4 patches -> 64 tokens, pre-LN blocks, mean-pool head.

Run: python examples/train_cifar10_vit.py [--epochs 20]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

from taper_tpu import models, ops, optim
from taper_tpu.data.cifar10 import CIFAR10Dataset
from taper_tpu.train import Trainer
from taper_tpu.utils.cache import enable_compilation_cache


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--backend", default="xla", choices=["xla", "pallas"])
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--batch-size", type=int, default=256)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--dim", type=int, default=96)
    ap.add_argument("--depth", type=int, default=4)
    ap.add_argument("--heads", type=int, default=4)
    ap.add_argument("--augment", action="store_true",
                    help="train-time random crop (pad 4, reflect) + "
                         "horizontal flip, applied on-device inside "
                         "the scanned epoch (data/augment.py).  Meant "
                         "for REAL images; on this zero-egress "
                         "environment's synthetic gratings it HURTS "
                         "(74.2%% vs 81.5%% at 10 epochs, measured) "
                         "because the synthetic classes are "
                         "position/phase-coded — not translation-"
                         "invariant like photographs")
    args = ap.parse_args()
    enable_compilation_cache()
    ops.set_backend(args.backend)

    print("loading CIFAR-10…")
    train_ds = CIFAR10Dataset(train=True)
    test_ds = CIFAR10Dataset(train=False)
    print(f"  train={len(train_ds)} test={len(test_ds)} "
          f"source={train_ds.source}")

    model = models.vit_cifar(dim=args.dim, depth=args.depth,
                             num_heads=args.heads)
    augment = None
    if args.augment:
        from taper_tpu.data.augment import random_crop_flip
        augment = random_crop_flip
    trainer = Trainer(
        model, optim.AdamW(args.lr, weight_decay=0.05),
        scheduler=optim.CosineAnnealingLR(args.lr, t_max=args.epochs,
                                          min_lr=args.lr * 0.05),
        augment=augment)
    print(f"params: {model.param_count(trainer.params):,}")

    t0 = time.perf_counter()
    m = trainer.fit_device(train_ds.images, train_ds.labels,
                           test_ds.images, test_ds.labels, args.epochs,
                           batch_size=args.batch_size,
                           early_stop_acc=2.0)
    dt = time.perf_counter() - t0
    print(f"best val acc  : {max(m.val_acc):.2%}")
    print(f"final val acc : {m.val_acc[-1]:.2%}")
    print(f"total time    : {dt:.2f}s "
          f"({sum(m.epoch_times[1:]) / max(len(m.epoch_times) - 1, 1):.2f}"
          f"s/epoch steady)")


if __name__ == "__main__":
    main()
