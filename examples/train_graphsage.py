"""End-to-end GraphSAGE training with neighbor sampling.

The BASELINE.json GraphSAGE config (uniform_neighbor_sample + 2-layer
mean-aggregate SAGE; ogbn-products stands in as an RMAT synthetic here —
zero-egress environment). Run:

    python examples/train_graphsage.py --scale 14 --steps 20
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, default=14)
    ap.add_argument("--edgefactor", type=int, default=16)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--batch-size", type=int, default=512)
    ap.add_argument("--fanout", type=int, nargs="+", default=[10, 10])
    ap.add_argument("--features", type=int, default=64)
    ap.add_argument("--classes", type=int, default=16)
    args = ap.parse_args()

    import cugraph_tpu as cg
    from cugraph_tpu.gnn import GraphSAGE, NeighborLoader

    v = 1 << args.scale
    src, dst = cg.rmat_edgelist(
        scale=args.scale, num_edges=v * args.edgefactor, scramble=True
    )
    g = cg.from_edgelist(np.asarray(src), np.asarray(dst), num_vertices=v)
    rng = np.random.default_rng(0)
    feats = rng.normal(size=(v, args.features)).astype(np.float32)
    labels = rng.integers(0, args.classes, size=v).astype(np.int32)

    model = GraphSAGE(
        hidden_features=128, out_features=args.classes, num_layers=2
    )
    loader = NeighborLoader(
        g,
        np.arange(v, dtype=np.int32),
        args.fanout,
        batch_size=args.batch_size,
        shuffle=True,
    )

    # init on the first block
    block = next(iter(loader))
    x0 = jnp.asarray(feats[block.n_ids])
    params = model.init(jax.random.PRNGKey(0), block.graph, x0)
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    def loss_fn(params, block_graph, x, y, n_seeds):
        out = model.apply(params, block_graph, x)
        # seeds occupy compact ids [0, n_seeds); mask the rest out
        seed_mask = (
            jnp.arange(out.shape[0]) < n_seeds
        ).astype(jnp.float32)
        per_node = optax.softmax_cross_entropy_with_integer_labels(out, y)
        return jnp.sum(per_node * seed_mask) / jnp.maximum(
            jnp.sum(seed_mask), 1.0
        )

    @jax.jit
    def train_step(params, opt_state, block_graph, x, y, n_seeds):
        loss, grads = jax.value_and_grad(loss_fn)(
            params, block_graph, x, y, n_seeds
        )
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    step = 0
    t0 = time.perf_counter()
    for epoch in range(100):
        for block in loader:
            x = jnp.asarray(feats[block.n_ids])
            y = jnp.asarray(labels[block.n_ids])
            params, opt_state, loss = train_step(
                params, opt_state, block.graph, x, y, block.num_seeds
            )
            step += 1
            if step % 5 == 0:
                print(f"step {step}: loss {float(loss):.4f}")
            if step >= args.steps:
                dt = time.perf_counter() - t0
                print(
                    f"done: {step} steps in {dt:.1f}s "
                    f"({step * args.batch_size / dt:.0f} seeds/s)"
                )
                return


if __name__ == "__main__":
    main()
