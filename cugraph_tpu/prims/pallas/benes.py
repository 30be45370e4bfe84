"""Benes network routing for static on-chip permutations.

The SpMV-v2 pipeline (spmv2.py) realizes arbitrary STATIC permutations of
VMEM-resident blocks as a Benes butterfly network: 2*log2(n)-1 stages of
pairwise conditional exchanges at power-of-two distances. Each stage is
two `pltpu.roll`s + selects (measured ~50 Gelem/s for the 13 lane stages
on v5e — benchmarks/microbench3_tpu.py), and the per-position switch bits
are precomputed host-side here, once per graph.

Stage order (distance per stage) for n = 2^k:
    [n/2, n/4, ..., 2, 1, 2, ..., n/4, n/2]     (2k-1 stages)
Stage s pairs positions (i, i XOR d). Both positions of a pair store the
same swap bit; the kernel computes
    y[i] = swap[i] ? x[i XOR d] : x[i].

Routing uses the classic recursive 2-coloring (Waksman looping): the
outermost stages split elements into two half-size subnetworks such that
each input pair and each output pair is split across subnets; cycles of
the pairing graph alternate colors.

The C++ fast path (native/src/graph_build.cpp ct_benes_route) runs the
same algorithm at ~10-20M elem/s; this numpy/python version is the
reference and small-size fallback.

ref analog: there is no Benes network in cuGraph — its CUDA kernels
scatter arbitrarily through global memory. On TPU, Mosaic exposes no
multi-vreg gather/scatter (see docs/PERFORMANCE.md), so static data
movement is restructured into roll/select stages instead.
"""

from __future__ import annotations

import numpy as np


def stage_distances(n: int):
    """Distances of the 2*log2(n)-1 butterfly stages."""
    k = n.bit_length() - 1
    assert 1 << k == n and k >= 1
    down = [n >> (i + 1) for i in range(k)]  # n/2 ... 1
    return down + [2 << i for i in range(k - 1)]  # + 2 ... n/2


def route_benes_py(perm: np.ndarray) -> np.ndarray:
    """Switch bits for a permutation: element at input position i must end
    at output position perm[i]. Returns (n_stages, n) uint8 bits (both
    positions of a pair carry the pair's bit). Pure python recursion —
    use for n <= ~64K (tests); the C++ path handles large n."""
    n = len(perm)
    k = n.bit_length() - 1
    assert 1 << k == n
    n_stages = 2 * k - 1
    bits = np.zeros((n_stages, n), dtype=np.uint8)

    def rec(dest, stage_in, stage_out, pos0):
        nloc = len(dest)
        if nloc == 2:
            b = 1 if dest[0] == 1 else 0
            bits[stage_in, pos0] = b
            bits[stage_in, pos0 + 1] = b
            return
        m = nloc // 2
        inv = np.empty(nloc, dtype=np.int64)
        inv[dest] = np.arange(nloc)
        color = np.full(nloc, -1, dtype=np.int8)
        for e0 in range(nloc):
            if color[e0] >= 0:
                continue
            e, c = e0, 0
            while color[e] < 0:
                color[e] = c
                pin = e ^ m  # input partner: must take the other subnet
                if color[pin] < 0:
                    color[pin] = 1 - c
                # output partner of pin: element exiting at dest[pin]^m
                e = int(inv[dest[pin] ^ m])
                c = 1 - color[pin]
                # continue until the cycle closes
        # input stage bits: position i holds element i; swap iff element at
        # the TOP position (i) is bottom-bound (color 1)
        top_dest = np.empty(m, dtype=np.int64)
        bot_dest = np.empty(m, dtype=np.int64)
        for i in range(m):
            b = int(color[i] == 1)
            bits[stage_in, pos0 + i] = b
            bits[stage_in, pos0 + i + m] = b
            top_e = i + m if b else i
            bot_e = i if b else i + m
            top_dest[i] = dest[top_e] & (m - 1)
            bot_dest[i] = dest[bot_e] & (m - 1)
            # output stage: pair p = dest&(m-1); swap iff the top subnet's
            # element exiting at local p is destined for the bottom output
        for i in range(m):
            p = top_dest[i]
            top_e = i + m if color[i] == 1 else i
            bo = int(dest[top_e] >= m)
            bits[stage_out, pos0 + p] = bo
            bits[stage_out, pos0 + p + m] = bo
        rec(top_dest, stage_in + 1, stage_out - 1, pos0)
        rec(bot_dest, stage_in + 1, stage_out - 1, pos0 + m)

    rec(np.asarray(perm, dtype=np.int64).copy(), 0, n_stages - 1, 0)
    return bits


def route_benes(perm: np.ndarray) -> np.ndarray:
    """(n_stages, n) uint8 switch bits; C++ fast path with python fallback."""
    from ... import native

    out = native.benes_route(np.asarray(perm, dtype=np.int64))
    if out is not None:
        return out
    return route_benes_py(perm)


def pack_bits(bits: np.ndarray) -> np.ndarray:
    """(n_stages, n) uint8 -> (ceil(stages/32), n) int32 packed words."""
    n_stages, n = bits.shape
    n_words = -(-n_stages // 32)
    out = np.zeros((n_words, n), dtype=np.uint32)
    for s in range(n_stages):
        out[s // 32] |= bits[s].astype(np.uint32) << (s % 32)
    return out.astype(np.int32)


def apply_benes_np(x: np.ndarray, bits: np.ndarray) -> np.ndarray:
    """Reference applier (numpy) for validation."""
    n = x.shape[0]
    y = x.copy()
    for s, d in enumerate(stage_distances(n)):
        partner = y[np.arange(n) ^ d]
        y = np.where(bits[s].astype(bool), partner, y)
    return y
