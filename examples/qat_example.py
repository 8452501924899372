"""Quantization-aware training (reference ``examples/qat_example.rs``):
a QATSequential CNN with named module ids, int8 symmetric fake-quant,
observer-driven calibration, QAT fine-tuning epochs, eval-mode switch and a
status dump.
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from taper_tpu import data, losses, nn, ops, optim
from taper_tpu.quantization.config import QuantizationConfig
from taper_tpu.quantization.observers import ObserverManager
from taper_tpu.quantization.qat import (
    QATConfig, QATConv2d, QATLinear, QATSequential, QATState,
)
from taper_tpu.utils.cache import enable_compilation_cache


class _Reshape(nn.Module):
    def apply(self, params, x, *, train=False, rng=None):
        return x.reshape(x.shape[0], 1, 28, 28)


def build_qat_cnn(qcfg: QuantizationConfig) -> QATSequential:
    """QAT CNN with named module_ids (qat_example.rs:55-152)."""
    return QATSequential(
        _Reshape(),
        QATConv2d(1, 16, 3, padding=1, config=qcfg, module_id="conv1",
                  activation="relu"),
        nn.MaxPool2d.new_2x2(),
        QATConv2d(16, 32, 3, padding=1, config=qcfg, module_id="conv2",
                  activation="relu"),
        nn.MaxPool2d.new_2x2(),
        nn.Flatten(),
        QATLinear(32 * 7 * 7, 64, config=qcfg, module_id="fc1",
                  activation="relu"),
        QATLinear(64, 10, config=qcfg, module_id="fc2"),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--backend", default="xla", choices=["xla", "pallas"])
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--per-channel", action="store_true",
                    help="per-output-channel weight fake-quant ranges")
    ap.add_argument("--data-dir", default="data/mnist")
    args = ap.parse_args()
    enable_compilation_cache()
    ops.set_backend(args.backend)

    qat_cfg = QATConfig.int8(lr=0.001, warmup_epochs=1, symmetric=True)
    if args.per_channel:
        qat_cfg = qat_cfg.with_per_channel()
    model = build_qat_cnn(qat_cfg.qconfig)
    params = model.init(jax.random.PRNGKey(0))

    train_ds = data.MNISTDataset(train=True, data_dir=args.data_dir)
    test_ds = data.MNISTDataset(train=False, data_dir=args.data_dir)
    loader = data.DataLoader(train_ds, 256, seed=0)

    # calibrate fake-quant ranges on one batch through observers
    observers = ObserverManager()
    cal_x, _ = next(iter(loader))
    params, _ = model.calibrate(params, jnp.asarray(cal_x), observers)
    print(f"calibrated ranges for: {observers.keys()}")

    qat_state = QATState(enabled=True, training=True)
    opt = optim.Adam(qat_cfg.lr)
    opt_state = opt.init(params)

    @jax.jit
    def train_step(params, opt_state, x, y):
        def loss_of(p):
            logits = model.apply(p, x, train=True, qat=qat_state)
            return losses.cross_entropy_loss(logits, y), logits

        (loss, logits), grads = jax.value_and_grad(
            loss_of, has_aux=True)(params)
        params, opt_state = opt.update(grads, opt_state, params)
        return params, opt_state, loss, losses.accuracy(logits, y)

    @jax.jit
    def eval_logits(params, x):
        # eval-mode switch: QAT still active (quantized inference preview)
        return model.apply(params, x, train=False, qat=qat_state)

    for epoch in range(args.epochs):
        eff_lr = qat_cfg.get_effective_lr(epoch)
        opt_state = opt.set_lr(opt_state, eff_lr)
        t0 = time.perf_counter()
        stats = []
        for bx, by in loader:
            params, opt_state, loss, acc = train_step(
                params, opt_state, jnp.asarray(bx), jnp.asarray(by))
            stats.append((loss, acc))
        ls = float(jnp.mean(jnp.stack([s[0] for s in stats])))
        ac = float(jnp.mean(jnp.stack([s[1] for s in stats])))
        warm = " (warmup 0.1×lr)" if qat_cfg.is_warmup(epoch) else ""
        print(f"QAT epoch {epoch+1}: loss {ls:.4f} acc {ac*100:.2f}% "
              f"lr={eff_lr:g}{warm} [{time.perf_counter()-t0:.1f}s]")

    # refresh frozen ranges from the trained network before eval
    params, _ = model.calibrate(params, jnp.asarray(cal_x), observers)

    # final quantized-mode vs float-mode eval
    n = len(test_ds) - len(test_ds) % 2000
    correct_q = correct_f = 0
    for s in range(0, n, 2000):
        x = jnp.asarray(test_ds.images[s:s + 2000])
        y = test_ds.labels[s:s + 2000]
        correct_q += int(np.sum(np.argmax(np.asarray(
            eval_logits(params, x)), -1) == y))
        correct_f += int(np.sum(np.argmax(np.asarray(model.apply(
            params, x, qat=QATState(enabled=False))), -1) == y))
    print(f"\nfinal accuracy — fake-quant int8: {correct_q/n*100:.2f}%  "
          f"float: {correct_f/n*100:.2f}%")
    print("QAT status:", qat_state.status(model))


if __name__ == "__main__":
    main()
