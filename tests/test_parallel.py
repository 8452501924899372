"""Multi-device tests on the virtual 8-CPU mesh: DP and TP train steps
must produce the same numbers as single-device execution."""

import jax
import jax.numpy as jnp
import numpy as np

from taper_tpu import nn, optim, parallel
from taper_tpu.data.loader import DataLoader
from taper_tpu.train import Trainer
from tests.test_train import FakeDataset


def _model():
    return nn.Sequential(nn.Linear(32, 16, activation="relu"),
                         nn.Linear(16, 8, activation="relu"),
                         nn.Linear(8, 4))


def test_mesh_construction():
    mesh = parallel.make_mesh(data=4, model=2)
    assert mesh.shape == {"data": 4, "model": 2}
    mesh2 = parallel.make_mesh(model=2)  # data inferred
    assert mesh2.shape["data"] == 4


def test_param_sharding_rules():
    mesh = parallel.make_mesh(data=4, model=2)
    params = {"w": jnp.ones((16, 8)), "b": jnp.ones((16,)),
              "odd": jnp.ones((3, 5))}
    shard = parallel.param_sharding(mesh, params, tensor_parallel=True)
    assert shard["w"].spec == jax.sharding.PartitionSpec("model", None)
    assert shard["b"].spec == jax.sharding.PartitionSpec("model")
    # non-divisible dims stay replicated
    assert shard["odd"].spec == jax.sharding.PartitionSpec()


def _run(mesh, tensor_parallel=False, seed=0):
    ds = FakeDataset(n=256)
    loader = DataLoader(ds, batch_size=64, seed=seed, shuffle=False)
    trainer = Trainer(_model(), optim.Adam(1e-2), seed=seed, mesh=mesh,
                      tensor_parallel=tensor_parallel)
    trainer.train_epoch(loader)
    return trainer.evaluate(ds.images, ds.labels)


def test_data_parallel_matches_single_device():
    single = _run(None)
    mesh = parallel.make_mesh(data=8, model=1)
    dp = _run(mesh)
    np.testing.assert_allclose(dp["loss"], single["loss"], atol=1e-4)
    np.testing.assert_allclose(dp["acc"], single["acc"], atol=1e-6)


def test_tensor_parallel_matches_single_device():
    single = _run(None)
    mesh = parallel.make_mesh(data=2, model=4)
    tp = _run(mesh, tensor_parallel=True)
    np.testing.assert_allclose(tp["loss"], single["loss"], atol=1e-4)
    np.testing.assert_allclose(tp["acc"], single["acc"], atol=1e-6)


def test_dp_batch_is_actually_sharded():
    mesh = parallel.make_mesh(data=8, model=1)
    x = jnp.ones((64, 32))
    xs = jax.device_put(x, parallel.batch_sharding(mesh))
    assert len(xs.sharding.device_set) == 8


def test_shard_map_dp_matches_single_device():
    """Explicit pmean-collective DP step == single-device step."""
    from taper_tpu.parallel import (
        make_dp_train_step, replicate_to_mesh, shard_batch_to_mesh,
    )
    from taper_tpu import losses as L

    model = _model()
    opt = optim.Adam(1e-2)
    params = model.init(jax.random.PRNGKey(0))
    state = opt.init(params)
    x = np.random.default_rng(0).normal(0, 1, (64, 32)).astype(np.float32)
    y = (np.arange(64) % 4).astype(np.int32)

    # single device reference
    def loss_of(p):
        logits = model.apply(p, jnp.asarray(x))
        return L.cross_entropy_loss(logits, jnp.asarray(y))
    loss_ref, grads = jax.value_and_grad(loss_of)(params)
    p_ref, _ = opt.update(grads, state, params)

    mesh = parallel.make_mesh(data=8, model=1)
    step = make_dp_train_step(model, opt, mesh)
    p_m = replicate_to_mesh(params, mesh)
    s_m = replicate_to_mesh(opt.init(params), mesh)
    bx, by = shard_batch_to_mesh(x, y, mesh)
    p_new, s_new, loss, acc = step(p_m, s_m, bx, by)

    np.testing.assert_allclose(float(loss), float(loss_ref), atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p_new),
                    jax.tree_util.tree_leaves(p_ref)):
        np.testing.assert_allclose(a, b, atol=1e-5)


def test_fit_device_on_mesh_matches_single_device():
    """Scanned-epoch training under GSPMD sharding == single-device."""
    ds = FakeDataset(n=256)
    results = []
    for mesh in (None, parallel.make_mesh(data=8, model=1)):
        trainer = Trainer(_model(), optim.Adam(1e-2), seed=0, mesh=mesh)
        m = trainer.fit_device(ds.images, ds.labels, ds.images[:128],
                               ds.labels[:128], epochs=2, batch_size=64,
                               early_stop_acc=2.0, verbose=False)
        results.append((m.train_loss[-1], m.val_acc[-1]))
    np.testing.assert_allclose(results[0][0], results[1][0], atol=1e-4)
    np.testing.assert_allclose(results[0][1], results[1][1], atol=1e-6)


def test_zero1_optimizer_state_sharding_and_equivalence():
    """ZeRO-1: m/v partitioned over the data axis; training trajectory
    identical to the replicated-state run."""
    from jax.sharding import PartitionSpec as P

    ds = FakeDataset(n=256)
    mesh = parallel.make_mesh(data=8, model=1)
    t_z = Trainer(_model(), optim.Adam(1e-2), seed=0, mesh=mesh, zero1=True)
    # moment slots actually live sharded over 'data'
    m_w = t_z.opt_state["m"][0]["w"]
    assert "data" in tuple(m_w.sharding.spec), m_w.sharding
    # lr/step scalars and params stay replicated
    assert tuple(t_z.params[0]["w"].sharding.spec) in ((), (None,))

    t_r = Trainer(_model(), optim.Adam(1e-2), seed=0, mesh=mesh)
    results = []
    for t in (t_z, t_r):
        m = t.fit_device(ds.images, ds.labels, ds.images[:128],
                         ds.labels[:128], epochs=2, batch_size=64,
                         early_stop_acc=2.0, verbose=False)
        from taper_tpu.train import Metrics
        results.append((m.train_loss[-1], m.val_acc[-1]))
        t.metrics = Metrics()
    np.testing.assert_allclose(results[0][0], results[1][0], atol=1e-4)
    np.testing.assert_allclose(results[0][1], results[1][1], atol=1e-6)
    # sharding preserved through the update steps (donated buffers)
    m_w2 = t_z.opt_state["m"][0]["w"]
    assert "data" in tuple(m_w2.sharding.spec), m_w2.sharding


def test_fit_device_fused_on_mesh_matches_single_device():
    """The single-dispatch all-epochs program under a (data x model) mesh
    produces the same training trajectory as one device."""
    ds = FakeDataset(n=256)
    results = []
    for mesh in (None, parallel.make_mesh(data=4, model=2)):
        trainer = Trainer(_model(), optim.Adam(1e-2), seed=0, mesh=mesh,
                          tensor_parallel=mesh is not None)
        m = trainer.fit_device_fused(ds.images, ds.labels, ds.images[:128],
                                     ds.labels[:128], epochs=3,
                                     batch_size=64, early_stop_acc=2.0,
                                     verbose=False)
        results.append((list(m.train_loss), list(m.val_acc)))
    np.testing.assert_allclose(results[0][0], results[1][0], atol=1e-4)
    np.testing.assert_allclose(results[0][1], results[1][1], atol=1e-4)


def test_fsdp_sharding_uses_largest_divisible_dim():
    import numpy as np
    from jax.sharding import PartitionSpec as P
    from taper_tpu import parallel
    mesh = parallel.make_mesh(data=8, model=1)
    # largest dim (50257) does not divide 8; dim 1 (512) does
    params = {"emb": jnp.zeros((50257, 512))}
    sh = parallel.fsdp_sharding(mesh, params)
    assert sh["emb"].spec == P(None, "data"), sh["emb"].spec


# ---------------------------------------------------------------------------
# Ring collective-matmul (parallel/overlap.py): outputs and gradients must
# equal the monolithic-collective oracle.
# ---------------------------------------------------------------------------

def test_allgather_matmul_matches_oracle_and_grads():
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = parallel.make_mesh(data=2, model=4)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(32, 16)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(16, 24)).astype(np.float32))
    xs = jax.device_put(x, NamedSharding(mesh, P("model", None)))

    got = jax.jit(lambda x, w: parallel.allgather_matmul(
        mesh, x, w, axis="model"))(xs, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(x @ w),
                               rtol=1e-5, atol=1e-5)

    # gradients: d/dx sum(f(x, w) * c) must match the oracle's
    c = jnp.asarray(rng.normal(size=(32, 24)).astype(np.float32))
    gx1, gw1 = jax.grad(
        lambda x, w: jnp.sum(parallel.allgather_matmul(
            mesh, x, w, axis="model") * c), argnums=(0, 1))(xs, w)
    gx2, gw2 = jax.grad(
        lambda x, w: jnp.sum((x @ w) * c), argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw1), np.asarray(gw2),
                               rtol=1e-5, atol=1e-5)


def test_matmul_reducescatter_matches_oracle_and_grads():
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = parallel.make_mesh(data=2, model=4)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(32, 64)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(64, 24)).astype(np.float32))
    xs = jax.device_put(x, NamedSharding(mesh, P(None, "model")))
    ws = jax.device_put(w, NamedSharding(mesh, P("model", None)))

    got = jax.jit(lambda x, w: parallel.matmul_reducescatter(
        mesh, x, w, axis="model"))(xs, ws)
    np.testing.assert_allclose(np.asarray(got), np.asarray(x @ w),
                               rtol=1e-4, atol=1e-4)
    # output really is row-sharded over the model axis
    spec = got.sharding.spec
    assert spec[0] == "model", spec

    c = jnp.asarray(rng.normal(size=(32, 24)).astype(np.float32))
    gx1, gw1 = jax.grad(
        lambda x, w: jnp.sum(parallel.matmul_reducescatter(
            mesh, x, w, axis="model") * c), argnums=(0, 1))(xs, ws)
    gx2, gw2 = jax.grad(
        lambda x, w: jnp.sum((x @ w) * c), argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw1), np.asarray(gw2),
                               rtol=1e-4, atol=1e-4)


def test_ring_collective_matmuls_compose_tp_linear():
    """Column-parallel entry + row-parallel exit = a 2-layer TP MLP whose
    activations between layers never materialize unsharded."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = parallel.make_mesh(data=1, model=8)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(64, 32)).astype(np.float32))
    w1 = jnp.asarray(rng.normal(size=(32, 48)).astype(np.float32))
    w2 = jnp.asarray(rng.normal(size=(48, 16)).astype(np.float32))

    xs = jax.device_put(x, NamedSharding(mesh, P("model", None)))

    def tp_mlp(x, w1, w2):
        h = parallel.allgather_matmul(mesh, x, w1, axis="model")
        h = jax.nn.relu(h)
        # reshard h's contraction over the ring for the exit matmul
        hs = jax.lax.with_sharding_constraint(
            h, NamedSharding(mesh, P(None, "model")))
        w2s = jax.lax.with_sharding_constraint(
            w2, NamedSharding(mesh, P("model", None)))
        return parallel.matmul_reducescatter(mesh, hs, w2s, axis="model")

    got = jax.jit(tp_mlp)(xs, w1, w2)
    want = jax.nn.relu(x @ w1) @ w2
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_allgather_matmul_column_sharded_w():
    """w column-sharded over the OTHER mesh axis stays sharded (no silent
    full replication) and the output columns inherit that sharding."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = parallel.make_mesh(data=2, model=4)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(32, 16)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(16, 24)).astype(np.float32))
    xs = jax.device_put(x, NamedSharding(mesh, P("model", None)))
    ws = jax.device_put(w, NamedSharding(mesh, P(None, "data")))

    got = jax.jit(lambda x, w: parallel.allgather_matmul(
        mesh, x, w, axis="model", w_col_axis="data"))(xs, ws)
    np.testing.assert_allclose(np.asarray(got), np.asarray(x @ w),
                               rtol=1e-5, atol=1e-5)
    assert got.sharding.spec[1] == "data", got.sharding.spec

    import pytest
    with pytest.raises(ValueError, match="differ"):
        parallel.allgather_matmul(mesh, xs, ws, axis="model",
                                  w_col_axis="model")
    with pytest.raises(ValueError, match="divisible"):
        parallel.matmul_reducescatter(
            mesh, jnp.zeros((30, 16)), jnp.zeros((16, 8)), axis="model")


def test_vocab_parallel_cross_entropy_matches_replicated():
    """Value AND grad of the vocab-sharded loss == the replicated CE."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from taper_tpu import losses as L
    mesh = parallel.make_mesh(data=2, model=4)
    rng = np.random.default_rng(11)
    n, v = 24, 32
    logits = jnp.asarray(rng.normal(size=(n, v)).astype(np.float32))
    targets = jnp.asarray(rng.integers(0, v, size=(n,)))

    ls = jax.device_put(logits, NamedSharding(mesh, P(None, "model")))
    loss_fn = jax.jit(lambda lg: parallel.vocab_parallel_cross_entropy(
        mesh, lg, targets))
    got, got_g = jax.value_and_grad(loss_fn)(ls)
    want, want_g = jax.value_and_grad(
        lambda lg: L.cross_entropy_loss(lg, targets))(logits)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(got_g), np.asarray(want_g),
                               rtol=1e-5, atol=1e-6)


def test_vocab_parallel_cross_entropy_masked():
    """`valid` mask averages over valid rows only — the padded-token
    idiom — and masked rows get zero gradient."""
    from taper_tpu import losses as L
    mesh = parallel.make_mesh(data=1, model=8)
    rng = np.random.default_rng(12)
    n, v = 16, 64
    logits = jnp.asarray(rng.normal(size=(n, v)).astype(np.float32))
    targets = jnp.asarray(rng.integers(0, v, size=(n,)))
    valid = jnp.asarray(rng.integers(0, 2, size=(n,)) > 0)

    got, g = jax.value_and_grad(
        lambda lg: parallel.vocab_parallel_cross_entropy(
            mesh, lg, targets, valid=valid))(logits)
    keep = np.asarray(valid)
    want = float(jnp.mean(jax.vmap(
        lambda lg, t: L.cross_entropy_loss(lg[None], t[None]))(
            logits, targets)[keep]))
    np.testing.assert_allclose(float(got), want, rtol=1e-6)
    assert np.all(np.asarray(g)[~keep] == 0.0)
