"""MG sorted engine on the real chip: mesh (1,1), compiled Pallas inside
shard_map; sorted result must match the XLA-reduce result."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax
from cugraph_tpu.utils.compile_cache import enable_compilation_cache
enable_compilation_cache()
from bench import build_graph
from cugraph_tpu.dist import make_mesh
from cugraph_tpu.dist.mg_graph import distribute_graph, unshard_vertex_values
from cugraph_tpu.dist.mg_sorted import build_device_layouts
from cugraph_tpu.dist import mg_algos

g, E = build_graph(18, 16)
mesh = make_mesh((1, 1), jax.devices()[:1])
mgg = distribute_graph(mesh, g)
t0 = time.perf_counter()
stacked = build_device_layouts(mesh, mgg)
print(f"device layouts built: {time.perf_counter()-t0:.0f}s", flush=True)

t0 = time.perf_counter()
pr_s, _ = mg_algos.mg_pagerank(mesh, mgg, tol=0.0, max_iterations=10, sorted_layouts=stacked)
jax.block_until_ready(pr_s)
print(f"sorted path compile+run: {time.perf_counter()-t0:.0f}s", flush=True)
t0 = time.perf_counter()
pr_s, _ = mg_algos.mg_pagerank(mesh, mgg, tol=0.0, max_iterations=10, sorted_layouts=stacked)
jax.block_until_ready(pr_s)
ts = time.perf_counter() - t0
pr_x, _ = mg_algos.mg_pagerank(mesh, mgg, tol=0.0, max_iterations=10)
jax.block_until_ready(pr_x)
t0 = time.perf_counter()
pr_x, _ = mg_algos.mg_pagerank(mesh, mgg, tol=0.0, max_iterations=10)
jax.block_until_ready(pr_x)
tx = time.perf_counter() - t0
a = unshard_vertex_values(mgg, pr_s)
b = unshard_vertex_values(mgg, pr_x)
err = np.abs(a - b).max() / max(np.abs(b).max(), 1e-30)
print(f"sorted {ts*1e3:.0f} ms vs xla {tx*1e3:.0f} ms (10 it) | max rel diff {err:.2e}", flush=True)

# --- optional: WCC on the sorted engine (VERDICT r4 #4 on-chip timing) ---
if "--wcc" in sys.argv:
    t0 = time.perf_counter()
    st_in = build_device_layouts(
        mesh, mgg, variant="min", use_weights=False, direction="in"
    )
    st_out = build_device_layouts(
        mesh, mgg, variant="min", use_weights=False, direction="out"
    )
    print(f"wcc layouts built: {time.perf_counter()-t0:.0f}s", flush=True)
    lab_s = mg_algos.mg_wcc(mesh, mgg, sorted_layouts=(st_in, st_out))
    jax.block_until_ready(lab_s)
    t0 = time.perf_counter()
    lab_s = mg_algos.mg_wcc(mesh, mgg, sorted_layouts=(st_in, st_out))
    jax.block_until_ready(lab_s)
    ts = time.perf_counter() - t0
    lab_x = mg_algos.mg_wcc(mesh, mgg)
    jax.block_until_ready(lab_x)
    t0 = time.perf_counter()
    lab_x = mg_algos.mg_wcc(mesh, mgg)
    jax.block_until_ready(lab_x)
    tx = time.perf_counter() - t0
    same = np.array_equal(
        unshard_vertex_values(mgg, lab_s), unshard_vertex_values(mgg, lab_x)
    )
    print(
        f"wcc sorted {ts*1e3:.0f} ms vs xla {tx*1e3:.0f} ms "
        f"({tx/max(ts,1e-9):.1f}x) | equal {same}",
        flush=True,
    )
