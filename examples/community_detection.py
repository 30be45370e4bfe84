"""Community detection walkthrough: Louvain/Leiden/ECG + spectral on
netscience (the BASELINE.json Louvain config).

    python examples/community_detection.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import cugraph_tpu as cg
    from cugraph_tpu.testing import netscience_edgelist, karate_edgelist

    try:
        src, dst, w = netscience_edgelist()
        name = "netscience"
    except BaseException:
        src, dst, w = karate_edgelist()
        name = "karate"
    g = cg.from_edgelist(src, dst, w, symmetrize=True)
    print(f"{name}: V={g.num_vertices} E={g.num_edges}")

    labels, q = cg.louvain(g)
    n = len(set(np.asarray(labels).tolist()))
    print(f"louvain: Q={q:.4f} communities={n}")

    labels, q = cg.leiden(g)
    print(f"leiden:  Q={q:.4f}")

    labels, q = cg.ecg(g, ensemble_size=8)
    print(f"ecg:     Q={q:.4f}")

    tri = cg.triangle_count(g)
    print(f"triangles total: {int(np.asarray(tri).sum()) // 3}")


if __name__ == "__main__":
    main()
