"""Generic subnet construction for auto-discovered groups.

Property: for a model OUTSIDE the family zoo (conv + BatchNorm + depthwise
+ residual + flatten->dense), zero some groups, physically compress via the
plan recorded by the discovery dataflow walk, rebuild the module at the new
widths, and the compressed forward equals the zeroed-full forward.

Covers the reference's model-generic `automated_pruning_compression`
(subnet_construction/pruning_compression.py:4-391) including the
flatten->linear index expansion (:335-346) and accessory/BN slicing, which
round 1 left NotImplemented for auto groups (VERDICT.md missing #1).
"""

import numpy as np
import pytest

import flax
import flax.linen as nn
import jax
import jax.numpy as jnp

from quantized_vit_tpu.graph import OTO


class FunkyNet(nn.Module):
    """Not in the zoo: conv->BN->relu, depthwise conv, residual, flatten."""

    w1: int = 8
    w2: int = 8
    d1: int = 12

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.w1, (3, 3), name="c1", use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not train, name="bn1")(x)
        x = nn.relu(x)
        # depthwise rides its producer's group (reference step 7)
        x = nn.Conv(self.w1, (3, 3), feature_group_count=self.w1,
                    name="dw")(x)
        x = nn.relu(x)
        skip = x
        x = nn.Conv(self.w1, (3, 3), name="c2")(x)
        x = nn.relu(x + skip)                      # residual merge
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = nn.Conv(self.w2, (3, 3), name="c3")(x)
        x = nn.relu(x)
        x = x.reshape((x.shape[0], -1))            # flatten -> dense
        x = nn.Dense(self.d1, name="fc1")(x)
        x = nn.relu(x)
        return nn.Dense(5, name="head")(x)


@pytest.fixture(scope="module")
def setup():
    m = FunkyNet()
    x = jnp.zeros((2, 8, 8, 3), jnp.float32)
    variables = m.init(jax.random.PRNGKey(0), x)
    params = flax.core.unfreeze(variables["params"])
    stats = flax.core.unfreeze(variables["batch_stats"])
    # make running stats non-trivial so BN slicing is actually exercised
    rng = np.random.default_rng(1)
    stats = jax.tree.map(
        lambda v: jnp.array(rng.standard_normal(v.shape).astype(np.float32))
        if v.shape else v, stats)
    stats["bn1"]["var"] = jnp.abs(stats["bn1"]["var"]) + 0.5
    return m, params, stats, x


def test_flatten_link_recorded(setup):
    m, params, stats, x = setup
    oto = OTO(m, params, batch_stats=stats, example_input=x)
    plan = oto._auto_plan
    fc1 = plan["fc1/kernel"]
    # fc1's in-dim follows c3's group through the flatten: the 4x4 spatial
    # grid (8x8 input, one 2x2 maxpool) folds into the feature axis
    assert fc1.in_group_id == "c3"
    assert fc1.in_spatial == 16
    assert fc1.in_channels == 8
    # conv chain links without expansion
    assert plan["c3/kernel"].in_group_id == "c1"
    assert plan["c3/kernel"].in_spatial == 1


def test_compressed_forward_matches_sparse_forward(setup):
    m, params, stats, x = setup
    oto = OTO(m, params, batch_stats=stats, example_input=x)

    by_kernel = {e.path: g for g in oto.node_groups for e in g.entries}
    # depthwise merged into c1's group, residual merged c2 too
    assert by_kernel["c1/kernel"] is by_kernel["dw/kernel"]
    assert by_kernel["c1/kernel"] is by_kernel["c2/kernel"]
    assert not by_kernel["head/kernel"].is_prunable

    sparse = oto.random_set_zero_groups(
        params, target_group_sparsity=0.4, num_group_divisible=1, seed=7)
    new_params, shapes, new_stats = oto.construct_subnet(sparse)

    w1 = shapes["c1"][-1]
    w2 = shapes["c3"][-1]
    d1 = shapes["fc1"][-1]
    assert w1 < 8 and w2 < 8 and d1 < 12  # something actually pruned
    # flatten expansion: fc1 in-dim = spatial positions * kept c3 channels
    assert shapes["fc1"][0] == (shapes["fc1"][0] // w2) * w2

    rebuilt = FunkyNet(w1=w1, w2=w2, d1=d1)
    xr = jnp.array(
        np.random.default_rng(5).standard_normal((3, 8, 8, 3)), jnp.float32)
    y_sparse = m.apply({"params": sparse, "batch_stats": stats}, xr)
    y_slim = rebuilt.apply(
        {"params": new_params, "batch_stats": new_stats}, xr)
    np.testing.assert_allclose(np.asarray(y_slim), np.asarray(y_sparse),
                               rtol=1e-5, atol=1e-5)
