"""CIFAR-10 ResNet-8 with AdamW + cosine schedule (the BASELINE.json
stretch workload: "CIFAR-10 ResNet-8 with AvgPool + AdamW cosine schedule").
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
    ap.add_argument("--lr", type=float, default=3e-3)
    args = ap.parse_args()
    enable_compilation_cache()
    ops.set_backend(args.backend)

    print("loading CIFAR-10…")
    train_ds = CIFAR10Dataset(train=True)
    test_ds = CIFAR10Dataset(train=False)
    print(f"  train={len(train_ds)} test={len(test_ds)} "
          f"source={train_ds.source}")

    model = models.resnet8()
    sched = optim.CosineAnnealingLR(args.lr, t_max=args.epochs,
                                    min_lr=args.lr * 0.01)
    trainer = Trainer(model, optim.AdamW(args.lr, weight_decay=5e-4),
                      scheduler=sched)
    print(f"params: {model.param_count(trainer.params):,}")

    t0 = time.perf_counter()
    trainer.fit_device(train_ds.images, train_ds.labels,
                       test_ds.images, test_ds.labels, args.epochs,
                       batch_size=args.batch_size, early_stop_acc=0.93)
    total = time.perf_counter() - t0
    trainer.metrics.plot_summary()
    n_epochs = len(trainer.metrics.epoch_times)
    print(f"{total / n_epochs:.2f}s/epoch avg (backend={args.backend})")
    trainer.save_checkpoint("checkpoints/cifar10_resnet8.npz")


if __name__ == "__main__":
    main()
