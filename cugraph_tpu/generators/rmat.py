"""R-MAT recursive-bisection graph generator + Graph500 vertex scrambling.

ref: cpp/src/generators/generate_rmat_edgelist.cu
(graph_generators.hpp:68 generate_rmat_edgelist(scale, num_edges, a=.57,
b=.19, c=.19); :330 scramble_vertex_ids, generators/scramble.cuh).

TPU-native: all edges draw their quadrant bits in parallel — the scale-deep
recursion becomes `scale` vectorized Bernoulli draws, one per bit position,
entirely inside jit. This is the scale-30 benchmark driver (SURVEY.md §6).
The distributed variant partitions the edge count across mesh devices and
folds the device id into the RNG key (dist/generators parity with the
reference's per-rank partitioned generation).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("scale", "num_edges"))
def _rmat_jit(rng_key, scale: int, num_edges: int, a, b, c):
    """Per-bit quadrant draws. P(src_bit=1) = c+d; P(dst_bit=1) depends on
    src_bit: b/(a+b) when src_bit=0, d/(c+d) when src_bit=1."""
    d = 1.0 - a - b - c
    p_src1 = c + d
    p_dst1_given0 = b / (a + b)
    p_dst1_given1 = d / jnp.maximum(c + d, 1e-12)
    src = jnp.zeros(num_edges, dtype=jnp.int64 if scale > 31 else jnp.int32)
    dst = jnp.zeros_like(src)
    keys = jax.random.split(rng_key, scale)
    for bit in range(scale):
        k1, k2 = jax.random.split(keys[bit])
        u1 = jax.random.uniform(k1, (num_edges,))
        u2 = jax.random.uniform(k2, (num_edges,))
        sbit = (u1 < p_src1).astype(src.dtype)
        p_d = jnp.where(sbit == 1, p_dst1_given1, p_dst1_given0)
        dbit = (u2 < p_d).astype(src.dtype)
        src = (src << 1) | sbit
        dst = (dst << 1) | dbit
    return src, dst


def rmat_edgelist(
    scale: int,
    num_edges: int,
    a: float = 0.57,
    b: float = 0.19,
    c: float = 0.19,
    *,
    rng_key: Optional[jax.Array] = None,
    clip_and_flip: bool = False,
    scramble: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Generate an R-MAT edgelist with 2^scale vertices.

    clip_and_flip: keep only the lower triangle by flipping (src, dst) when
    src < dst (ref graph_generators.hpp clip_and_flip semantics).
    """
    if rng_key is None:
        rng_key = jax.random.PRNGKey(0)
    src, dst = _rmat_jit(
        rng_key,
        int(scale),
        int(num_edges),
        jnp.float32(a),
        jnp.float32(b),
        jnp.float32(c),
    )
    if clip_and_flip:
        flip = src < dst
        src, dst = jnp.where(flip, dst, src), jnp.where(flip, src, dst)
    if scramble:
        src = scramble_vertex_ids(src, scale)
        dst = scramble_vertex_ids(dst, scale)
    return src, dst


def mg_rmat_edgelist(
    mesh,
    scale: int,
    num_edges: int,
    a: float = 0.57,
    b: float = 0.19,
    c: float = 0.19,
    *,
    rng_key: Optional[jax.Array] = None,
    scramble: bool = False,
):
    """Per-device R-MAT generation over a mesh: device d draws its own
    edge shard with the device index folded into the RNG key — no host
    ever materializes the global COO (ref: generate_rmat_edgelist.cu is
    likewise per-rank). Returns (src, dst) jax arrays of shape
    (n_devices, shard) sharded one row per device.

    Feed the result to `rmat_chunk_source` for scalable MG ingest
    (dist.distribute_edgelist_chunks)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    if rng_key is None:
        rng_key = jax.random.PRNGKey(0)
    devs = mesh.devices.reshape(-1)
    n = len(devs)
    shard = -(-num_edges // n)
    keys = jax.vmap(lambda i: jax.random.fold_in(rng_key, i))(jnp.arange(n))

    @partial(jax.jit, static_argnames=("scale_", "shard_", "scramble_"),
             out_shardings=NamedSharding(mesh, P(mesh.axis_names)))
    def gen(keys, scale_, shard_, scramble_):
        def one(k):
            s, d = _rmat_jit(
                k, scale_, shard_, jnp.float32(a), jnp.float32(b),
                jnp.float32(c),
            )
            if scramble_:
                s = scramble_vertex_ids(s, scale_)
                d = scramble_vertex_ids(d, scale_)
            return s, d

        return jax.vmap(one)(keys)

    src, dst = gen(keys, int(scale), int(shard), bool(scramble))
    return src.reshape(mesh.devices.shape + (shard,)), dst.reshape(
        mesh.devices.shape + (shard,)
    )


def rmat_chunk_source(src_sharded, dst_sharded):
    """Zero-arg callable yielding one (src, dst) numpy chunk per device
    shard — the ChunkSource adapter for distribute_edgelist_chunks. Only
    one shard is host-resident at a time."""
    import numpy as np

    flat_s = src_sharded.reshape(-1, src_sharded.shape[-1])
    flat_d = dst_sharded.reshape(-1, dst_sharded.shape[-1])

    def chunks():
        for i in range(flat_s.shape[0]):
            yield np.asarray(flat_s[i]), np.asarray(flat_d[i])

    return chunks


def scramble_vertex_ids(ids: jax.Array, scale: int) -> jax.Array:
    """Pseudo-random bijective permutation of [0, 2^scale) vertex ids.

    Graph500-style scrambling (ref: generators/scramble.cuh) breaks the
    degree-locality of raw R-MAT ids. Implemented as an invertible
    bit-mix (xorshift-multiply feistel-like rounds) masked to scale bits.
    """
    mask = (1 << scale) - 1
    x = ids.astype(jnp.uint32 if scale <= 31 else jnp.uint64)
    mask = jnp.asarray(mask, x.dtype)
    # invertible mix rounds within the masked domain (odd multiplier is a
    # bijection mod 2^scale; xorshift of high bits into low is invertible)
    for mult, shift in ((0x9E3779B1, 7), (0x85EBCA77, 11)):
        x = (x * jnp.asarray(mult, x.dtype)) & mask
        x = x ^ (x >> shift)
        x = x & mask
    return x.astype(ids.dtype)
