"""Sharded training-step dry run on the 8-device virtual CPU mesh."""

import pytest
import sys

sys.path.insert(0, "/root/repo")


def test_dryrun_multichip_8():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


@pytest.mark.slow
def test_dryrun_multichip_4():
    import __graft_entry__ as ge

    ge.dryrun_multichip(4)


def test_lfq_entropy_pmean_matches_global():
    """Data-parallel BSQ diversity entropy: with axis_name, the codebook
    usage distribution is pmean'd across shards (bsq.py:427-431 all_reduce),
    so the diversity term matches the global-batch computation."""
    from functools import partial

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    from streamvoiceanon_tpu.ops.quantizers import lfq_soft_entropy_loss

    rng = np.random.default_rng(3)
    N, L = 64, 8
    # strongly shard-dependent statistics: each shard sees a different bias
    h = rng.standard_normal((N, L)).astype(np.float32)
    h += np.repeat(np.linspace(-2, 2, 8), N // 8)[:, None]
    h = jnp.asarray(h / np.linalg.norm(h, axis=-1, keepdims=True))

    mesh = Mesh(np.asarray(jax.devices()[:8]), ("data",))
    sharded = jax.device_put(h, NamedSharding(mesh, P("data")))

    @partial(shard_map, mesh=mesh, in_specs=P("data"), out_specs=P())
    def dist_loss(x):
        # rank-local loss with the usage distribution all-reduced, then the
        # DDP-style cross-rank mean
        return jax.lax.pmean(
            lfq_soft_entropy_loss(x, axis_name="data"), "data")[None]

    # global term2 + mean-of-local term1 (the DDP-equivalent semantics)
    global_t2 = lfq_soft_entropy_loss(h) - lfq_soft_entropy_loss(h, gamma=0.0)

    @partial(shard_map, mesh=mesh, in_specs=P("data"), out_specs=P())
    def local_t1(x):
        return jax.lax.pmean(lfq_soft_entropy_loss(x, gamma=0.0), "data")[None]

    expect = local_t1(sharded)[0] + global_t2
    got = dist_loss(sharded)[0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect), rtol=1e-5)

    # and WITHOUT axis_name the shard-local diversity term differs
    @partial(shard_map, mesh=mesh, in_specs=P("data"), out_specs=P())
    def local_loss(x):
        return jax.lax.pmean(lfq_soft_entropy_loss(x), "data")[None]

    assert abs(float(local_loss(sharded)[0]) - float(got)) > 1e-4
