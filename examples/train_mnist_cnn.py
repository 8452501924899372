"""MNIST CNN training (reference ``examples/train_mnist_cnn.rs``).

The reference CNN — Conv2dReLU 1→32→32 + pool, 32→64→64 + pool, 64→128,
global avg pool, FC 128-128-64-10 — with the reference's hyper-parameters
(``train_mnist_cnn.rs:133-137, 262``): batch 256, Adam wd=1e-4, lr×0.8
every 5 epochs, up to 50 epochs, early stop at val acc > 99.5%.

Deliberate deviation: default lr is 3e-3, not the reference's 0.01.  The
reference's conv weight/input gradients are severed so only biases + the
FC head actually train (SURVEY.md §2.2 ⚠) — 0.01 was effectively an
FC-only learning rate.  This model's conv filters receive true gradients;
at 0.01 training diverges on the non-saturating v2 dataset, at 3e-3 it
exceeds the reference's ~96% accuracy within a few epochs.

Run: ``python examples/train_mnist_cnn.py [--backend pallas]``
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

from taper_tpu import data, models, ops, optim
from taper_tpu.train import Trainer
from taper_tpu.utils.cache import enable_compilation_cache


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--backend", default="xla", choices=["xla", "pallas"])
    ap.add_argument("--epochs", type=int, default=50)
    ap.add_argument("--batch-size", type=int, default=256)
    ap.add_argument("--lr", type=float, default=3e-3)
    ap.add_argument("--data-dir", default="data/mnist")
    ap.add_argument("--fused", action="store_true",
                    help="fuse ALL epochs into one XLA dispatch "
                         "(Trainer.fit_device_fused; the bench path — "
                         "avoids per-batch host round trips, which "
                         "dominate on remote-tunneled TPUs)")
    args = ap.parse_args()

    enable_compilation_cache()

    ops.set_backend(args.backend)

    print("loading MNIST…")
    train_ds = data.MNISTDataset(train=True, data_dir=args.data_dir)
    test_ds = data.MNISTDataset(train=False, data_dir=args.data_dir)
    print(f"  train={len(train_ds)} test={len(test_ds)} "
          f"source={train_ds.source}")

    model = models.mnist_cnn()
    sched = optim.StepLR(args.lr, step_size=5, gamma=0.8)
    trainer = Trainer(model, optim.Adam(args.lr, weight_decay=1e-4),
                      scheduler=sched)
    print(f"params: {model.param_count(trainer.params):,}")

    t0 = time.perf_counter()
    fit = (trainer.fit_device_fused if args.fused
           else trainer.fit_device)
    fit(train_ds.images, train_ds.labels,
        test_ds.images, test_ds.labels, args.epochs,
        batch_size=args.batch_size, early_stop_acc=0.995)
    total = time.perf_counter() - t0
    trainer.metrics.plot_summary()
    n_epochs = len(trainer.metrics.epoch_times)
    n_seen = n_epochs * (len(train_ds) // args.batch_size) * args.batch_size
    print(f"throughput: {n_seen / total:,.0f} samples/s "
          f"({total / n_epochs:.2f}s/epoch, backend={args.backend})")
    trainer.save_checkpoint("checkpoints/mnist_cnn.npz")
    print("checkpoint saved to checkpoints/mnist_cnn.npz")


if __name__ == "__main__":
    main()
