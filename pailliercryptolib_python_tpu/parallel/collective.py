"""Sharded HE collectives: the encrypted analog of psum/all-reduce.

Ciphertext-space addition is modular multiplication mod n^2, so an
encrypted all-reduce is a modmul tree over the sharded batch axis:
each device reduces its local shard with the log2 rotate-modmul tree,
then the (tiny) per-device partials are all-gathered over ICI and folded
locally.  This is the HE analog of gradient all-reduce in federated
learning (SURVEY.md §2.4) — the reference can only do this by pickling
ciphertexts between processes.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import montgomery as mg
from ..ops.limb import LIMB_DTYPE
from .mesh import DCN_AXIS, ICI_AXIS, batch_sharding


def _local_tree_reduce(x: jnp.ndarray, one: jnp.ndarray,
                       ctx: mg.MontCtx) -> jnp.ndarray:
    """Reduce a (L, Bloc) block to its HE sum: log2 FOLDING rounds (each
    round modmuls the upper half into the lower half, halving the width
    — same scheme as models.paillier._segment_tree_reduce)."""
    L, Bloc = x.shape
    P2 = 1 << max(0, (Bloc - 1).bit_length())
    if P2 != Bloc:
        pad = jnp.broadcast_to(one, (L, P2 - Bloc))
        x = jnp.concatenate([x, pad], axis=1)
    width = P2
    while width > 1:
        half = width // 2
        x = mg.mont_mul(x[:, :half], x[:, half:], ctx)
        width = half
    return x


def _rep_specs(ctx):
    """Replicated PartitionSpecs matching the MontCtx pytree (rank-aware;
    optional weight leaves may be None)."""
    return jax.tree_util.tree_map(
        lambda a: P(*([None] * jnp.ndim(a))), ctx)


def sharded_he_sum(ct: jnp.ndarray, ctx: mg.MontCtx, mesh: Mesh,
                   b: int | None = None) -> jnp.ndarray:
    """HE sum of a batch-sharded ciphertext array -> replicated (L, 1).

    Strategy: shard_map over the mesh; each device tree-reduces its local
    shard (zero communication, folding tree on the full ctx incl. the
    MXU weights), then partials are all-gathered over (ICI, DCN) and
    folded with log2 modmuls — ~log2(B) local modmuls plus one small
    collective, instead of gathering B ciphertexts.

    Padding columns must hold the Montgomery one (HE zero); callers that
    sliced real data in keep b == B.

    The shard_map program is cached per (mesh, shapes): rebuilding the
    closure every call would defeat jax's jit cache and recompile the
    collective on every invocation (measured: ~27 s/call at 2048-bit).
    """
    key = (mesh, ct.shape, ct.dtype,
           tuple((a.shape, a.dtype) for a in jax.tree_util.tree_leaves(ctx)))
    fn = _HE_SUM_CACHE.get(key)
    if fn is None:
        def local(ct_blk, lctx):
            partial_ = _local_tree_reduce(ct_blk, lctx.one, lctx)  # (L, 1)
            # gather every device's partial over both mesh axes
            allp = jax.lax.all_gather(partial_, ICI_AXIS, axis=1,
                                      tiled=True)
            allp = jax.lax.all_gather(allp, DCN_AXIS, axis=1, tiled=True)
            return _local_tree_reduce(allp, lctx.one, lctx)        # (L, 1)

        spec_ct = P(None, (DCN_AXIS, ICI_AXIS))
        spec_rep = P(None, None)
        fn = jax.jit(jax.shard_map(
            local, mesh=mesh,
            in_specs=(spec_ct, _rep_specs(ctx)),
            out_specs=spec_rep, check_vma=False))
        _HE_SUM_CACHE[key] = fn
    return fn(ct, ctx)


_HE_SUM_CACHE: dict = {}


def sharded_elementwise(fn, mesh: Mesh):
    """Run an elementwise HE op SPMD over the mesh.

    Elementwise ciphertext ops (add_ct = modmul, obfuscate, encrypt_raw)
    need no communication at all; this wrapper makes that sharding real:
    every (L, B) array argument whose batch axis divides the mesh is
    placed with the batch sharding (no copy when already there), and the
    jitted output is CONSTRAINED to stay batch-sharded via out_shardings
    — so XLA partitions the kernel along B and never gathers."""
    sharded = batch_sharding(mesh)
    jfn = jax.jit(fn, out_shardings=sharded)

    def place(a):
        if isinstance(a, jax.Array) and not isinstance(a, jax.core.Tracer) \
                and a.ndim == 2 and a.shape[1] % mesh.size == 0:
            return jax.device_put(a, sharded)
        return a

    def wrapper(*args, **kwargs):
        args = jax.tree_util.tree_map(place, args)
        kwargs = jax.tree_util.tree_map(place, kwargs)
        return jfn(*args, **kwargs)

    return wrapper


def federated_aggregate(cts: list, ctx: mg.MontCtx,
                        mesh: Mesh | None = None) -> jnp.ndarray:
    """Aggregate K parties' encrypted update vectors (the federated-
    learning headline workload): elementwise HE sum across parties of
    batch-sharded (L, B) ciphertext arrays.  Pure elementwise modmuls —
    fully SPMD, no cross-device traffic.

    When a mesh is given, concrete operands are placed with the batch
    sharding first (no copy when already there) so XLA partitions every
    modmul along B; under an outer jit trace, placement is the caller's
    via in_shardings (the dryrun does this through shard_batch)."""
    if mesh is not None:
        sh = batch_sharding(mesh)
        cts = [jax.device_put(c, sh)
               if (isinstance(c, jax.Array)
                   and not isinstance(c, jax.core.Tracer)
                   and c.sharding != sh) else c
               for c in cts]
    acc = cts[0]
    for other in cts[1:]:
        acc = mg.mont_mul(acc, other, ctx)
    return acc
