"""Pallas two-level cumsum (interpret mode on CPU)."""

import numpy as np
import pytest

from cugraph_tpu.prims.pallas.scan import cumsum_flat, segment_sums_from_cumsum


@pytest.mark.parametrize("n", [1, 100, 128 * 512, 128 * 512 * 3 + 77])
def test_cumsum_matches_numpy(n):
    import jax.numpy as jnp

    x = np.random.default_rng(n).random(n).astype(np.float32)
    got = np.asarray(cumsum_flat(jnp.asarray(x), interpret=True))
    exp = np.cumsum(x.astype(np.float64)).astype(np.float32)
    np.testing.assert_allclose(got, exp, rtol=1e-4)


def test_segment_sums_from_cumsum():
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    v, e = 50, 4000
    seg = np.sort(rng.integers(0, v, e))
    vals = rng.random(e).astype(np.float32)
    offsets = np.zeros(v + 1, np.int32)
    np.cumsum(np.bincount(seg, minlength=v), out=offsets[1:])
    cum = cumsum_flat(jnp.asarray(vals), interpret=True)
    got = np.asarray(
        segment_sums_from_cumsum(cum, jnp.asarray(offsets), v)
    )
    exp = np.zeros(v)
    np.add.at(exp, seg, vals)
    np.testing.assert_allclose(got, exp.astype(np.float32), rtol=1e-3, atol=1e-4)
