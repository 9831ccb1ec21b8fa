"""Model-layer tests: shapes, stride-8 geometry, BN mode semantics,
cross-replica BN on the simulated 8-device mesh."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dasac_tpu.nn.factory import build_model
from dasac_tpu.nn.layers import SyncBatchNorm


def _init_and_forward(arch, hw=(64, 64), n=1, num_classes=5):
    model = build_model(arch, num_classes)
    x = jnp.asarray(np.random.RandomState(0).rand(n, *hw, 3), jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, x, train=False, update_stats=False
    )
    (logits, logits_up), _ = model.apply(
        variables, x, train=False, update_stats=False, mutable=[]
    )
    return model, variables, x, logits, logits_up


@pytest.mark.parametrize("arch,s8", [
    ("deeplabv2_resnet101", 9),    # 64 -> 32 -> ceil-pool 17 -> stride2 9 (d=2,4 keep 9)
    ("deeplabv2_vgg16_bn", 8),     # 64 / 8
    ("fcn_vgg16_bn", 8),
])
def test_forward_shapes(arch, s8):
    _, _, x, logits, logits_up = _init_and_forward(arch)
    assert logits.shape == (1, s8, s8, 5)
    assert logits_up.shape == (1, 64, 64, 5)
    assert np.isfinite(np.asarray(logits_up)).all()


def test_resnet_stride8_feature_size_at_512():
    """At 512x512 the reference's ceil-mode stem gives 65x65 stride-8 logits
    (torch: conv1->256, ceil-pool->129, layer2->65)."""
    from dasac_tpu.nn.functional import max_pool_ceil

    x = jnp.zeros((1, 256, 256, 1))
    assert max_pool_ceil(x, 3, 2, 1).shape == (1, 129, 129, 1)


def test_bn_stats_update_and_freeze():
    bn = SyncBatchNorm(4)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 8, 8, 4), jnp.float32)
    variables = bn.init(jax.random.PRNGKey(0), x, use_running_average=False)
    assert np.allclose(variables["batch_stats"]["mean"], 0.0)

    # train-mode call mutates stats toward the batch statistics
    y, mutated = bn.apply(variables, x, use_running_average=False,
                          mutable=["batch_stats"])
    new_mean = np.asarray(mutated["batch_stats"]["mean"])
    batch_mean = np.asarray(x).mean(axis=(0, 1, 2))
    np.testing.assert_allclose(new_mean, 0.1 * batch_mean, rtol=1e-5)
    # normalized output has ~zero mean / unit var per channel
    ym = np.asarray(y).mean(axis=(0, 1, 2))
    np.testing.assert_allclose(ym, 0.0, atol=1e-5)

    # frozen call: stats untouched, normalizes with running stats
    y2, mutated2 = bn.apply(variables, x, use_running_average=True,
                            mutable=["batch_stats"])
    np.testing.assert_allclose(
        np.asarray(mutated2["batch_stats"]["mean"]), 0.0, atol=0)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(x), atol=2e-3)


def test_cross_replica_bn_matches_global_batch():
    """Sync BN over the 8-device mesh == plain BN over the concatenated batch
    (the reference's SyncBatchNorm guarantee, deeplabv2.py:183)."""
    from jax.sharding import Mesh, PartitionSpec as P
    from jax import shard_map

    ndev = len(jax.devices())
    assert ndev == 8, "conftest should have forced 8 CPU devices"

    x = jnp.asarray(np.random.RandomState(1).randn(16, 4, 4, 3), jnp.float32)
    bn_sync = SyncBatchNorm(3, axis_name="data")
    bn_plain = SyncBatchNorm(3)
    variables = bn_plain.init(jax.random.PRNGKey(0), x, use_running_average=False)

    mesh = Mesh(np.array(jax.devices()), ("data",))

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P("data")), out_specs=(P("data"), P()),
        check_vma=False,
    )
    def sharded_bn(vs, xs):
        y, mut = bn_sync.apply(vs, xs, use_running_average=False,
                               mutable=["batch_stats"])
        return y, mut["batch_stats"]

    y_sharded, stats_sharded = jax.jit(sharded_bn)(variables, x)
    y_ref, mut_ref = bn_plain.apply(variables, x, use_running_average=False,
                                    mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(y_sharded), np.asarray(y_ref),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(stats_sharded["mean"]),
                               np.asarray(mut_ref["batch_stats"]["mean"]),
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(stats_sharded["var"]),
                               np.asarray(mut_ref["batch_stats"]["var"]),
                               rtol=2e-3)


def test_new_param_scopes_exist():
    from dasac_tpu.nn.factory import new_param_scopes

    for arch in ("deeplabv2_resnet101", "deeplabv2_vgg16_bn", "fcn_vgg16_bn"):
        model = build_model(arch, 3)
        x = jnp.zeros((1, 32, 32, 3))
        variables = model.init({"params": jax.random.PRNGKey(0)}, x,
                               train=False, update_stats=False)
        params = variables["params"]
        for scope in new_param_scopes(arch):
            assert scope in params, (arch, scope, list(params))
