"""On-device train-time augmentation (data/augment.py +
Trainer(augment=...))."""

import numpy as np
import jax
import jax.numpy as jnp

from taper_tpu import models, optim
from taper_tpu.data.augment import random_crop_flip
from taper_tpu.train import Trainer


def test_random_crop_flip_shapes_and_content():
    x = jnp.arange(2 * 3 * 8 * 8, dtype=jnp.float32).reshape(2, 3, 8, 8)
    out = random_crop_flip(x, jax.random.PRNGKey(0), pad=2)
    assert out.shape == x.shape
    # deterministic under the same key
    out2 = random_crop_flip(x, jax.random.PRNGKey(0), pad=2)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))
    # every output pixel exists in the padded source (reflect padding
    # introduces no new values)
    src = set(np.asarray(x).ravel().tolist())
    assert set(np.asarray(out).ravel().tolist()) <= src
    # pad=0, flip=False is the identity
    ident = random_crop_flip(x, jax.random.PRNGKey(1), pad=0, flip=False)
    np.testing.assert_array_equal(np.asarray(ident), np.asarray(x))


def test_random_crop_flip_flip_only():
    x = jnp.arange(4 * 1 * 2 * 3, dtype=jnp.float32).reshape(4, 1, 2, 3)
    out = np.asarray(random_crop_flip(x, jax.random.PRNGKey(3), pad=0))
    xn = np.asarray(x)
    for i in range(4):
        same = (out[i] == xn[i]).all()
        flipped = (out[i] == xn[i][..., ::-1]).all()
        assert same or flipped
    # with enough samples both outcomes occur
    outs = [np.asarray(random_crop_flip(x, jax.random.PRNGKey(k),
                                        pad=0)) for k in range(8)]
    kinds = {(o[0] == xn[0]).all() for o in outs}
    assert kinds == {True, False}


def test_trainer_augment_trains_and_eval_is_raw():
    """Augmented training stays finite/learns; eval accuracy is
    computed on raw images (augment runs train-side only)."""
    rng = np.random.default_rng(0)
    n = 256
    y = (np.arange(n) % 2).astype(np.int32)
    # class signal in channel mean — crop/flip invariant, so the task
    # stays learnable under augmentation
    x = rng.normal(0, 0.3, (n, 3, 8, 8)).astype(np.float32)
    x[y == 1] += 2.0

    from taper_tpu.nn import layers as nnl
    from taper_tpu.nn.module import Sequential
    model = Sequential([nnl.Flatten(), nnl.Linear(3 * 8 * 8, 2)])
    tr = Trainer(model, optim.Adam(3e-2),
                 augment=lambda b, k: random_crop_flip(b, k, pad=1))
    m = tr.fit_device(x, y, x, y, epochs=20, batch_size=64,
                      verbose=False, early_stop_acc=2.0)
    assert m.val_acc[-1] > 0.95, m.val_acc
