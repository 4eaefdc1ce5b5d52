"""Device-mesh sharding unit tests (virtual 8-device CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from mistra_tpu.parallel import mesh as pmesh


def test_make_mesh_dp_tp():
    mesh = pmesh.make_mesh(n_devices=8, tp=2)
    assert dict(mesh.shape) == {"dp": 4, "tp": 2}


def test_host_mesh_and_sharding():
    mesh = pmesh.make_host_mesh(tp=2)
    assert dict(mesh.shape)["tp"] == 2
    x = jnp.ones((8, 6, 16, 4))
    y = jax.device_put(x, NamedSharding(
        mesh, pmesh.host_spec_for(".micro.ff", x, mesh)))
    # a computation over the sharded array partitions without gather
    s = jax.jit(lambda a: jnp.sum(a, axis=(1, 2, 3)))(y)
    np.testing.assert_allclose(np.asarray(s), 6 * 16 * 4)


def test_init_distributed_single_process_noop():
    assert pmesh.init_distributed() is False
    assert pmesh.init_distributed(num_processes=1) is False
