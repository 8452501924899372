"""Probe: MNIST-CNN epoch time / MFU / accuracy vs batch size.

VERDICT r3 item 4: cnn_mfu (0.204 at the reference's batch 256) is
bounded by MXU starvation on the tiny early layers (C = 1→32 at 28×28),
not by kernel choice — XLA's conv emitter already wins every stride-1
shape (ops/pallas/conv.py dispatch note).  The remaining lever is
arithmetic intensity via batch.  This probe trains the full 5-epoch
bench config at each batch (lr scaled linearly from the 3e-3/256
baseline) and reports epoch seconds, final/best accuracy and MFU, so
the batch choice in bench.py is a measured, accuracy-checked decision.

Run: python benchmarks/probe_cnn_batch.py [batches...]
"""

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from taper_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from taper_tpu import data, models, ops, optim     # noqa: E402
from taper_tpu.train import Trainer                # noqa: E402
from taper_tpu.utils.profiling import flops_per_step  # noqa: E402


def run(train_ds, test_ds, batch: int, epochs: int = 5):
    ops.set_backend("pallas")
    lr = 3e-3 * batch / 256
    model = models.mnist_cnn()
    trainer = Trainer(model, optim.Adam(lr, weight_decay=1e-4),
                      scheduler=optim.StepLR(lr, 5, 0.8))
    fit = lambda: trainer.fit_device_fused(
        train_ds.images, train_ds.labels, test_ds.images,
        test_ds.labels, epochs, batch_size=batch, early_stop_acc=2.0,
        verbose=False)
    fit()
    trainer.reset_parameters(seed=0)
    m = fit()
    epoch_s = sum(m.epoch_times[-epochs:]) / epochs

    bx = jnp.asarray(train_ds.images[:batch])
    by = jnp.asarray(train_ds.labels[:batch])
    cost = flops_per_step(
        lambda p, s, x, y, r: trainer._train_step(p, s, x, y, r),
        trainer.params, trainer.opt_state, bx, by,
        jax.random.PRNGKey(0))
    steps = len(train_ds.labels) // batch
    mfu = cost["flops"] * steps / epoch_s / 197e12
    print(f"batch {batch:5d}: epoch {epoch_s*1e3:7.1f} ms  "
          f"mfu {mfu:.3f}  best acc {max(m.val_acc):.4f}  "
          f"final {m.val_acc[-1]:.4f}", flush=True)


def main():
    batches = [int(a) for a in sys.argv[1:]] or [256, 512, 1024, 2048]
    train_ds = data.MNISTDataset(train=True)
    test_ds = data.MNISTDataset(train=False)
    # upload once (same as bench.py): the host tunnel is slow enough
    # that re-uploading 188 MB per fit() call dominates epoch times
    train_ds.images = jnp.asarray(train_ds.images)
    train_ds.labels = jnp.asarray(train_ds.labels)
    test_ds.images = jnp.asarray(test_ds.images)
    test_ds.labels = jnp.asarray(test_ds.labels)
    for b in batches:
        run(train_ds, test_ds, b)


if __name__ == "__main__":
    main()
