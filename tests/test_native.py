"""Native C++ QEM decimater: build, correctness, and pipeline fallback."""

import numpy as np
import pytest

from invesalius3_tpu import native
from invesalius3_tpu.ops import marching, mesh as mesh_ops


def _sphere_mesh(n=32, r=12.0):
    zz, yy, xx = np.mgrid[:n, :n, :n].astype(float)
    c = (n - 1) / 2
    d = np.sqrt((zz - c) ** 2 + (yy - c) ** 2 + (xx - c) ** 2)
    mask = np.where(d <= r, 255, 0).astype(np.uint8)
    return marching.mask_to_surface(mask)


@pytest.mark.skipif(not native.available(), reason="no g++ toolchain")
def test_qem_decimate_preserves_volume_watertight():
    import jax.numpy as jnp

    verts, faces = _sphere_mesh()
    v0, a0 = mesh_ops.mass_properties(jnp.asarray(verts), jnp.asarray(faces))
    dv, df = native.decimate_qem(verts, faces, 0.7)
    # flip rejection can stop short of the exact target on small meshes;
    # require a substantial reduction
    assert len(df) <= int(len(faces) * 0.6)
    v1, a1 = mesh_ops.mass_properties(jnp.asarray(dv), jnp.asarray(df))
    assert abs(float(v1) - float(v0)) / float(v0) < 0.02
    assert abs(float(a1) - float(a0)) / float(a0) < 0.10
    # watertight after collapse
    from collections import Counter

    cnt = Counter()
    for a, b, c in df:
        for e in ((a, b), (b, c), (c, a)):
            cnt[tuple(sorted(e))] += 1
    assert set(cnt.values()) == {2}


def test_surface_pipeline_decimation_path():
    """create_surface_from_mask with decimate_reduction routes through the
    native decimater (or the clustering fallback) and stays consistent."""
    from invesalius3_tpu.core.mask import Mask
    from invesalius3_tpu.core.surface import create_surface_from_mask
    import jax.numpy as jnp

    zz, yy, xx = np.mgrid[:24, :24, :24].astype(float)
    d = np.sqrt((zz - 11.5) ** 2 + (yy - 11.5) ** 2 + (xx - 11.5) ** 2)
    m = Mask()
    m.data = jnp.asarray(np.where(d <= 9, 255, 0).astype(np.uint8))
    full = create_surface_from_mask(m, (1.0, 1.0, 1.0))
    dec = create_surface_from_mask(m, (1.0, 1.0, 1.0), decimate_reduction=0.5)
    assert len(dec.faces) < len(full.faces)
    assert abs(dec.volume - full.volume) / full.volume < 0.05
