"""XOR training (reference ``src/main.rs``): 2-4-1 sigmoid MLP, BCE loss,
SGD lr=0.1.  The reference runs 50k eager epochs; here the whole training
loop is one ``lax.scan``-compiled XLA program, so it finishes in
milliseconds on any backend.
"""

import functools
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from taper_tpu import losses, models, optim


def main():
    model = models.xor_mlp()
    params = model.init(jax.random.PRNGKey(42))
    x = jnp.array([[0.0, 0.0], [0.0, 1.0], [1.0, 0.0], [1.0, 1.0]])
    y = jnp.array([[0.0], [1.0], [1.0], [0.0]])

    opt = optim.SGD(lr=0.1)  # the reference's lr (main.rs:33)
    opt_state = opt.init(params)

    def step(carry, _):
        params, opt_state = carry
        loss, grads = jax.value_and_grad(
            lambda p: losses.bce_loss(model.apply(p, x), y))(params)
        params, opt_state = opt.update(grads, opt_state, params)
        return (params, opt_state), loss

    @functools.partial(jax.jit, static_argnums=(2,))
    def train(params, opt_state, epochs):
        (params, opt_state), losses_ = jax.lax.scan(
            step, (params, opt_state), None, length=epochs)
        return params, losses_

    params, curve = train(params, opt_state, 50_000)  # main.rs:20-50
    preds = model.apply(params, x)
    print(f"loss: {float(curve[0]):.4f} → {float(curve[-1]):.4f}")
    for xi, yi, pi in zip(x, y, preds):
        print(f"  {int(xi[0])} XOR {int(xi[1])} = {float(pi[0]):.3f} "
              f"(target {int(yi[0])})")
    correct = jnp.all((preds > 0.5) == (y > 0.5))
    print("XOR solved!" if bool(correct) else "XOR NOT solved")


if __name__ == "__main__":
    main()
