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
