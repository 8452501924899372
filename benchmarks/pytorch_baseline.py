"""Same-host PyTorch CPU baselines for the two reference benchmarks.

The reference ships runnable torch comparison scripts
(`pytorch_mnist_benchmark.py:5-38` — 784-128-64-10 MLP, Adam 1e-3,
batch 256, 10 epochs; `pytorch_mnist_cnn_benchmark.py:35-105` — the
5-conv CNN, Adam lr 0.01 wd 1e-4, batch 256) but only its *published
M4-Pro* numbers were comparable until now.  This script reruns both
configs with CPU torch on THIS host so BENCH_r04+ carries an
apples-to-apples same-host number next to the published-M4 ratios.

Differences from the reference scripts, both forced by this host:
  * data: the repo's dataset (real IDX files if present, else the
    synthetic v2 render) instead of torchvision's downloader — zero
    egress here; both frameworks train on the *same arrays* so the
    timing comparison is exact even though pixels are synthetic.
  * threads: ``torch.set_num_threads(os.cpu_count())`` instead of the
    reference's hardcoded 12 — this host has what it has (1 vCPU under
    the TPU tunnel); the JSON records the thread count so the caveat
    travels with the number.
  * CNN epochs: timed over ``--cnn-epochs`` (default 2) instead of the
    reference's 50 — per-epoch time is the metric and CPU-torch epochs
    are minutes here.

Run: python benchmarks/pytorch_baseline.py [--mlp-epochs 10]
     [--cnn-epochs 2] [--json out.json]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def _datasets():
    from taper_tpu import data
    train = data.MNISTDataset(train=True)
    test = data.MNISTDataset(train=False)
    return train, test


def _loader(images, labels, batch, shuffle, seed=0):
    """Minimal epoch iterator over numpy arrays (drop_last=True for
    train, matching the reference scripts' DataLoader flags)."""
    import torch
    n = (len(labels) // batch) * batch
    order = np.random.default_rng(seed).permutation(len(labels))[:n] \
        if shuffle else np.arange(n)
    xs = torch.from_numpy(np.ascontiguousarray(images[order]))
    ys = torch.from_numpy(np.ascontiguousarray(
        labels[order]).astype(np.int64))
    for i in range(0, n, batch):
        yield xs[i:i + batch], ys[i:i + batch]


def bench_mlp(train_ds, test_ds, epochs=10, batch=256, lr=1e-3):
    """Reference pytorch_mnist_benchmark.py:29-38 MLP, total wall time
    for the 10-epoch train loop (the reference reports ~2.025 s on M4)."""
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    model = nn.Sequential(nn.Linear(784, 128), nn.ReLU(),
                          nn.Linear(128, 64), nn.ReLU(),
                          nn.Linear(64, 10))
    opt = torch.optim.Adam(model.parameters(), lr=lr)
    epoch_times = []
    for e in range(epochs):
        t0 = time.perf_counter()
        model.train()
        for xb, yb in _loader(train_ds.images, train_ds.labels, batch,
                              True, seed=e):
            opt.zero_grad(set_to_none=True)
            loss = F.cross_entropy(model(xb), yb)
            loss.backward()
            opt.step()
        epoch_times.append(time.perf_counter() - t0)
    # eval accuracy once at the end (sanity only; not timed)
    model.eval()
    correct = total = 0
    with torch.no_grad():
        for xb, yb in _loader(test_ds.images, test_ds.labels, batch,
                              False):
            correct += int((model(xb).argmax(1) == yb).sum())
            total += len(yb)
    return sum(epoch_times), correct / total


def bench_cnn(train_ds, test_ds, epochs=2, batch=256, lr=0.01):
    """Reference pytorch_mnist_cnn_benchmark.py:36-80 CNN (5 convs +
    global-avg-pool + 3 FCs), per-epoch train time (M4 report: ~13 s)."""
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    class CNN(nn.Module):
        def __init__(self):
            super().__init__()
            self.c1 = nn.Conv2d(1, 32, 3, padding=1)
            self.c2 = nn.Conv2d(32, 32, 3, padding=1)
            self.c3 = nn.Conv2d(32, 64, 3, padding=1)
            self.c4 = nn.Conv2d(64, 64, 3, padding=1)
            self.c5 = nn.Conv2d(64, 128, 3, padding=1)
            self.f1 = nn.Linear(128, 128)
            self.f2 = nn.Linear(128, 64)
            self.f3 = nn.Linear(64, 10)

        def forward(self, x):
            x = F.relu(self.c1(x))
            x = F.max_pool2d(F.relu(self.c2(x)), 2)
            x = F.relu(self.c3(x))
            x = F.max_pool2d(F.relu(self.c4(x)), 2)
            x = F.relu(self.c5(x))
            x = torch.flatten(F.adaptive_avg_pool2d(x, 1), 1)
            x = F.relu(self.f1(x))
            x = F.relu(self.f2(x))
            return self.f3(x)

    model = CNN()
    opt = torch.optim.Adam(model.parameters(), lr=lr, weight_decay=1e-4)
    imgs = train_ds.images.reshape(-1, 1, 28, 28)
    epoch_times = []
    for e in range(epochs):
        t0 = time.perf_counter()
        model.train()
        for xb, yb in _loader(imgs, train_ds.labels, batch, True,
                              seed=e):
            opt.zero_grad(set_to_none=True)
            loss = F.cross_entropy(model(xb), yb)
            loss.backward()
            opt.step()
        epoch_times.append(time.perf_counter() - t0)
    return min(epoch_times), epoch_times


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mlp-epochs", type=int, default=10)
    ap.add_argument("--cnn-epochs", type=int, default=2)
    ap.add_argument("--json", type=str, default=None)
    args = ap.parse_args()

    import torch
    torch.set_num_threads(os.cpu_count() or 1)
    train_ds, test_ds = _datasets()

    mlp_total, mlp_acc = bench_mlp(train_ds, test_ds,
                                   epochs=args.mlp_epochs)
    cnn_epoch, cnn_all = bench_cnn(train_ds, test_ds,
                                   epochs=args.cnn_epochs)
    out = {
        "pytorch_same_host_mlp_s": round(mlp_total, 3),
        "pytorch_same_host_mlp_acc": round(mlp_acc, 4),
        "pytorch_same_host_cnn_epoch_s": round(cnn_epoch, 3),
        "pytorch_same_host_cnn_epochs_s": [round(t, 3) for t in cnn_all],
        "pytorch_threads": torch.get_num_threads(),
        "pytorch_version": torch.__version__,
        "data_source": train_ds.source,
    }
    print(json.dumps(out))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f)


if __name__ == "__main__":
    main()
