"""Multi-chip sharding of the proving hypercube (jax.sharding + shard_map).

The scaling axes of this domain (SURVEY.md §2.3/§5.7): the MLE hypercube
(the "sequence/context" analog — axis name "hc") and the batched-table axis
(memories/tables of one sumcheck — the "data-parallel" analog — axis "mem").
A sumcheck over a [T, N] stacked table shards N over "hc" and T over "mem".

Because the engine binds the LSB first and keeps active values at stride
2^k (gkr/sumcheck.py), folds at stride s touch only pairs (i, i+s) inside a
2s-aligned block: as long as s < the per-shard column count, every fold is
SHARD-LOCAL — no communication. Rounds proceed locally until the stride
reaches the shard width, then the (tiny) remaining table is all-gathered and
finished on one logical device — the "halve until local" schedule. Round
digests are returned per-shard and summed on the host (digests are additive
and the host finish is exact, so no uint32 psum overflow concerns).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.fe import Backend, get_backend


def make_mesh(devices=None, mem: int = 1):
    """1- or 2-D device mesh: ("mem", "hc")."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    assert n % mem == 0
    arr = np.array(devices).reshape(mem, n // mem)
    return Mesh(arr, ("mem", "hc"))


def shard_stacked(mesh: Mesh, stk):
    """Place a stacked [T, N] field pytree: T over "mem", N over "hc"."""
    sh = NamedSharding(mesh, P("mem", "hc"))
    return jax.tree.map(lambda a: jax.device_put(a, sh), stk)


@lru_cache(maxsize=None)
def _sharded_round_jit(be_name: str, mesh_key, t_local: int, n_local: int):
    """One local fold+digest sumcheck round under shard_map.

    Returns (folded local stack, per-shard digest with leading shard dims).
    Valid while the fold stride sc//2 and eval stride sc are < n_local."""
    be = get_backend(be_name)
    mesh = _MESHES[mesh_key]

    def local(stk, r, sc, l_act):
        # global column index of each local lane
        col0 = jax.lax.axis_index("hc") * n_local
        x = col0 + jnp.arange(n_local, dtype=jnp.int32)
        idx = (jnp.arange(n_local, dtype=jnp.int32) + sc // 2) & (n_local - 1)
        hi = jax.tree.map(lambda a: a[..., idx], stk)
        folded = be.add(stk, be.mul(r, be.sub(hi, stk)))
        idx2 = (jnp.arange(n_local, dtype=jnp.int32) + sc) & (n_local - 1)
        his = jax.tree.map(lambda a: a[..., idx2], folded)
        prod = be.mul(folded, his)
        mask = (((x & (2 * sc - 1)) == 0) & (x < l_act))[None, :]
        prod = be.select(mask, prod, be.ext.zeros((t_local, n_local)))
        dg = be.sum_digest(prod)
        dg = jax.tree.map(lambda a: a[None, None, ...], dg)
        return folded, dg

    fn = jax.jit(
        jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P("mem", "hc"), P(), P(), P()),
            out_specs=(P("mem", "hc"), P("mem", "hc")),
        )
    )
    return fn


_MESHES = {}


def sharded_fold_digest_round(be: Backend, mesh: Mesh, stk, r, sc, l_act):
    """Distributed analog of one engine round (fold with r at stride sc//2,
    then the degree-2 self-product eval digest at stride sc)."""
    key = (tuple(mesh.axis_names), mesh.devices.shape, id(mesh))
    _MESHES[key] = mesh
    t_total = jax.tree.leaves(stk)[0].shape[0]
    n_total = jax.tree.leaves(stk)[0].shape[1]
    t_local = t_total // mesh.shape["mem"]
    n_local = n_total // mesh.shape["hc"]
    fn = _sharded_round_jit(be.spec.name, key, t_local, n_local)
    return fn(stk, r, sc, l_act)


def gather_stacked(mesh: Mesh, stk):
    """All-gather a sharded stack back to fully-replicated (the tail switch
    once the stride reaches the shard width)."""
    sh = NamedSharding(mesh, P(None, None))
    return jax.tree.map(lambda a: jax.device_put(a, sh), stk)
