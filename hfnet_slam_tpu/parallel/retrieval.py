"""Sharded place-recognition retrieval over a device mesh.

The reference's KeyFrameDatabase scan is O(N_KF x 4096) on one CPU core
(/root/reference/src/KeyFrameDatabase.cc:85-96) — its scaling hot spot as
the map grows (SURVEY.md §5.7). Here the keyframe axis of the global-
descriptor table is sharded across devices; each chip scores its shard on
the MXU and the tiny (Q, K) score tile is gathered — queries broadcast,
database sharded, no re-layout of the big table ever happens.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_sharded_db(mesh: Mesh, gdesc, valid, axis: str = None):
    """Place the (K, D) descriptor table and (K,) validity on the mesh,
    keyframe axis sharded. K must be a multiple of the axis size (the
    MapStore's fixed capacity is chosen accordingly). `axis` defaults to
    the mesh's first axis, so the same mesh installed for BA works here."""
    axis = axis or mesh.axis_names[0]
    db = jax.device_put(jnp.asarray(gdesc), NamedSharding(mesh, P(axis, None)))
    vm = jax.device_put(jnp.asarray(valid), NamedSharding(mesh, P(axis)))
    return db, vm


@partial(jax.jit, static_argnames=())
def _scores(queries, db, db_mask):
    s = jnp.dot(queries, db.T, preferred_element_type=jnp.float32)
    d = jnp.sqrt(jnp.maximum(2.0 - 2.0 * s, 0.0))
    return jnp.where(db_mask[None, :], jnp.maximum(0.0, 1.0 - d), 0.0)


def sharded_scores(mesh: Mesh, queries, db, db_mask, axis: str = None):
    """(Q, D) queries vs sharded (K, D) db -> (Q, K) scores.

    With `db` sharded over `axis`, XLA partitions the matmul so each device
    contracts its keyframe shard; the output inherits the sharding and is
    gathered lazily on read. No explicit collectives needed — the sharding
    propagation does the work (scaling-book recipe: annotate and let XLA
    insert the collectives)."""
    axis = axis or mesh.axis_names[0]
    q = jax.device_put(jnp.asarray(queries), NamedSharding(mesh, P(None, None)))
    out_sharding = NamedSharding(mesh, P(None, axis))
    f = jax.jit(_scores, out_shardings=out_sharding)
    return f(q, db, db_mask)


def top_candidates(mesh: Mesh, queries, db, db_mask, n: int = 3, axis: str = None):
    """Top-n keyframe indices + scores per query, computed on-mesh."""
    sc = sharded_scores(mesh, queries, db, db_mask, axis or mesh.axis_names[0])
    vals, idx = jax.lax.top_k(sc, n)
    return idx, vals
