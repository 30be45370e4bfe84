"""Two-process CPU-mesh worker (driven by test_multiprocess.py).

Exercises the REAL multi-host branches — jax.distributed bootstrap, the
per-process ingest of distribute_edgelist_chunks (each host materializes
only its addressable devices' slabs), the process_allgather padding
agreement of mg_sorted.build_device_layouts, and mg_pagerank over a mesh
spanning two processes — the analog of the reference's MPI-on-one-node MG
tests (cpp/tests/utilities/mg_utilities.cpp:29-69).

Usage: python _mp_worker.py <process_id> <coordinator_port>
Prints "MP OK <pid>" on success.
"""
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)

import numpy as np  # noqa: E402


def main():
    pid = int(sys.argv[1])
    port = sys.argv[2]
    from cugraph_tpu.dist import initialize_distributed, mg_algos
    from cugraph_tpu.dist.mesh import make_global_mesh

    initialize_distributed(f"localhost:{port}", num_processes=2, process_id=pid)
    assert jax.process_count() == 2, "distributed bootstrap failed"
    assert len(jax.devices()) == 8

    import cugraph_tpu as cg
    from cugraph_tpu.dist.mg_graph import distribute_edgelist_chunks
    from cugraph_tpu.dist.mg_sorted import build_device_layouts
    from cugraph_tpu.prims.pallas.spmv2 import TINY

    # deterministic stream: every process generates the SAME chunks (the
    # documented multi-host ingest contract) and keeps only its devices'
    rng = np.random.default_rng(77)
    v = 200
    chunks = [
        (rng.integers(0, v, 500), rng.integers(0, v, 500),
         rng.random(500).astype(np.float32))
        for _ in range(3)
    ]
    mesh = make_global_mesh()
    r, c = mesh.devices.shape
    mgg = distribute_edgelist_chunks(mesh, chunks, num_vertices=v)

    # per-process ingest: this host materialized only its own devices
    n_addr = sum(
        1 for d in np.asarray(mesh.devices).ravel()
        if d.process_index == jax.process_index()
    )
    assert n_addr == 4
    assert len(mgg.srcs.addressable_shards) == 4

    # sorted layouts across processes: _allgather_max agrees the pads
    stacked = build_device_layouts(mesh, mgg, cfg=TINY)
    pr_s, _ = mg_algos.mg_pagerank(
        mesh, mgg, max_iterations=30, sorted_layouts=stacked,
        sorted_interpret=True,
    )
    pr_x, _ = mg_algos.mg_pagerank(mesh, mgg, max_iterations=30)

    # SG oracle recomputed locally from the same stream
    src = np.concatenate([ch[0] for ch in chunks])
    dst = np.concatenate([ch[1] for ch in chunks])
    w = np.concatenate([ch[2] for ch in chunks])
    g = cg.from_edgelist(src, dst, w, num_vertices=v)
    pr_sg = np.asarray(cg.pagerank(g, max_iterations=30, tol=1e-6)[0])

    # each process checks ITS OWN addressable shards against the oracle
    vp = mgg.vp
    for arr, tag in ((pr_s, "sorted"), (pr_x, "xla")):
        for sh in arr.addressable_shards:
            i = sh.index[0].start or 0
            j = sh.index[1].start or 0
            q = j * r + i
            ref = np.zeros(vp, np.float32)
            lo = q * vp
            hi = min((q + 1) * vp, v)
            if lo < v:
                ref[: hi - lo] = pr_sg[lo:hi]
            got = np.asarray(sh.data).reshape(vp)
            np.testing.assert_allclose(
                got, ref, rtol=1e-4, atol=1e-7,
                err_msg=f"{tag} shard ({i},{j})",
            )
    print(f"MP OK {pid}", flush=True)


if __name__ == "__main__":
    main()
