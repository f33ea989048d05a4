"""PatchCloud append/overflow semantics."""
import jax.numpy as jnp
import numpy as np

from cmvs_pmvs_tpu.models.patches import (
    append_patches, empty_cloud, remove_patches)


def _filled(n, t, start=0.0):
    c = empty_cloud(n, t)
    from dataclasses import replace
    return replace(
        c, coord=jnp.arange(n * 4, dtype=jnp.float32).reshape(n, 4)
        + start, alive=jnp.ones(n, bool))


def test_append_fills_free_slots_in_order():
    cloud = empty_cloud(6, 2)
    new = _filled(3, 2, start=100.0)
    out, dropped = append_patches(cloud, new, jnp.ones(3, bool))
    assert int(dropped) == 0
    assert int(out.count()) == 3
    assert bool(out.alive[0]) and bool(out.alive[2])


def test_append_overflow_is_counted_not_silent():
    cloud = _filled(4, 2)
    cloud = remove_patches(cloud, jnp.asarray([False, True, False, False]))
    new = _filled(3, 2, start=100.0)
    out, dropped = append_patches(cloud, new, jnp.ones(3, bool))
    # one free slot, three incoming -> 2 dropped and reported
    assert int(dropped) == 2
    assert int(out.count()) == 4
    # the survivor landed in the free slot
    assert np.allclose(np.asarray(out.coord[1]), np.asarray(new.coord[0]))
