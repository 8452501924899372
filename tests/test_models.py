"""Model-zoo and CIFAR-10 pipeline tests."""

import jax
import jax.numpy as jnp
import numpy as np

from taper_tpu import models, optim
from taper_tpu.data.cifar10 import parse_cifar_batch, synthesize_cifar
from taper_tpu.losses import cross_entropy_loss
from taper_tpu.train import Trainer


def test_mnist_mlp_shapes_and_params():
    model = models.mnist_mlp()
    p = model.init(jax.random.PRNGKey(0))
    assert model.apply(p, jnp.ones((2, 784))).shape == (2, 10)
    assert model.param_count(p) == 784 * 128 + 128 + 128 * 64 + 64 + \
        64 * 10 + 10


def test_mnist_cnn_shapes():
    model = models.mnist_cnn()
    p = model.init(jax.random.PRNGKey(0))
    assert model.apply(p, jnp.ones((2, 784))).shape == (2, 10)


def test_xor_mlp_shapes():
    model = models.xor_mlp()
    p = model.init(jax.random.PRNGKey(0))
    out = model.apply(p, jnp.ones((4, 2)))
    assert out.shape == (4, 1)
    assert bool(jnp.all((out >= 0) & (out <= 1)))  # sigmoid output


def test_resnet8_shapes_and_grads():
    model = models.resnet8()
    p = model.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 32, 32))
    assert model.apply(p, x).shape == (2, 10)
    g = jax.grad(lambda pp: cross_entropy_loss(
        model.apply(pp, x), jnp.array([0, 1])))(p)
    total = sum(float(jnp.sum(jnp.abs(l)))
                for l in jax.tree_util.tree_leaves(g))
    assert total > 0


def test_parse_cifar_batch():
    rng = np.random.default_rng(0)
    n = 5
    rec = np.zeros((n, 3073), np.uint8)
    rec[:, 0] = np.arange(n)
    rec[:, 1:] = rng.integers(0, 256, (n, 3072))
    images, labels = parse_cifar_batch(rec.tobytes())
    assert images.shape == (n, 3, 32, 32)
    np.testing.assert_array_equal(labels, np.arange(n))
    np.testing.assert_allclose(
        images[0, 0, 0, 0], rec[0, 1] / 255.0, atol=1e-6)


def test_synthetic_cifar_learnable():
    labels = (np.arange(512) % 10).astype(np.int32)
    images = synthesize_cifar(labels, seed=0)
    assert images.shape == (512, 3, 32, 32)
    np.testing.assert_array_equal(images, synthesize_cifar(labels, seed=0))

    class DS:
        def __len__(self):
            return len(labels)

        def get_batch(self, idx):
            return images[idx], labels[idx]

    model = models.resnet8()
    tr = Trainer(model, optim.AdamW(3e-3, weight_decay=1e-4))
    m = tr.fit_device(images, labels, images[:256], labels[:256],
                      epochs=6, batch_size=128, early_stop_acc=0.9,
                      verbose=False)
    assert m.train_acc[-1] > 0.5  # textures are learnable within a few epochs
