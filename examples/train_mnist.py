"""MNIST MLP training (reference ``examples/train_mnist.rs``).

784-128-64-10 ReLU MLP, batch 256, Adam lr=1e-3 wd=1e-4, 10 epochs,
early stop at val acc > 98% — the exact reference configuration
(``train_mnist.rs:28-61``), compiled to one fused XLA program per step.

Run: ``python examples/train_mnist.py [--backend pallas]``
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
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--batch-size", type=int, default=256)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--data-dir", default="data/mnist")
    ap.add_argument("--fused", action="store_true",
                    help="run ALL epochs in one XLA dispatch "
                         "(Trainer.fit_device_fused)")
    ap.add_argument("--profile", default="",
                    help="capture a jax.profiler device trace of one "
                         "epoch into this directory (TensorBoard-loadable)")
    args = ap.parse_args()

    enable_compilation_cache()

    ops.set_backend(args.backend)

    print("loading MNIST…")
    train_ds = data.MNISTDataset(train=True, data_dir=args.data_dir)
    test_ds = data.MNISTDataset(train=False, data_dir=args.data_dir)
    print(f"  train={len(train_ds)} test={len(test_ds)} "
          f"source={train_ds.source}")

    model = models.mnist_mlp()
    trainer = Trainer(model, optim.Adam(args.lr, weight_decay=1e-4))
    print(f"params: {model.param_count(trainer.params):,}")

    fit = (trainer.fit_device_fused if args.fused else trainer.fit_device)
    t0 = time.perf_counter()
    fit(train_ds.images, train_ds.labels,
        test_ds.images, test_ds.labels, args.epochs,
        batch_size=args.batch_size, early_stop_acc=0.98)
    total = time.perf_counter() - t0

    if args.profile:
        from taper_tpu.utils.profiling import trace
        with trace(args.profile):
            trainer.fit_device(train_ds.images, train_ds.labels,
                               test_ds.images, test_ds.labels, 1,
                               batch_size=args.batch_size,
                               early_stop_acc=2.0, verbose=False)
        print(f"device trace written to {args.profile}")
    trainer.metrics.plot_summary()
    n_seen = (len(trainer.metrics.epoch_times)
              * (len(train_ds) // args.batch_size) * args.batch_size)
    print(f"throughput: {n_seen / total:,.0f} samples/s "
          f"(backend={args.backend})")
    trainer.save_checkpoint("checkpoints/mnist_mlp.npz")
    print("checkpoint saved to checkpoints/mnist_mlp.npz")


if __name__ == "__main__":
    main()
