import numpy as np
import pytest

from eigenexa_tpu.parallel import layout
from eigenexa_tpu.parallel.mesh import build_mesh, factor_grid, mesh_shape


@pytest.mark.parametrize(
    "p,expect",
    [(1, (1, 1)), (2, (1, 2)), (4, (2, 2)), (6, (2, 3)), (8, (2, 4)),
     (7, (1, 7)), (12, (3, 4)), (16, (4, 4)), (24, (4, 6))],
)
def test_factor_grid(p, expect):
    # largest divisor <= sqrt(P), matching eigen_init0 (eigen_libs0.F:477)
    assert factor_grid(p) == expect


def test_build_mesh_default(devices):
    m = build_mesh()
    x, y = mesh_shape(m)
    assert x * y == len(devices)
    assert m.axis_names == ("x", "y")


def test_build_mesh_shapes(devices):
    for shape in [(1, 8), (8, 1), (2, 4), (4, 2)]:
        m = build_mesh(shape=shape)
        assert mesh_shape(m) == shape
    with pytest.raises(ValueError):
        build_mesh(shape=(3, 3))


def test_build_mesh_order(devices):
    mc = build_mesh(shape=(2, 4), order="C")
    mr = build_mesh(shape=(2, 4), order="R")
    # column-major: rank 1 at grid position (1, 0); row-major: at (0, 1)
    assert mc.devices[1, 0].id == 1
    assert mr.devices[0, 1].id == 1


@pytest.mark.parametrize("b", [1, 4])
@pytest.mark.parametrize("p", [1, 3, 4])
def test_cyclic_roundtrip(p, b):
    n = 37
    g = np.arange(n)
    owner = layout.cyclic_owner(g, p, b)
    loc = layout.cyclic_g2l(g, p, b)
    back = layout.cyclic_l2g(loc, owner, p, b)
    np.testing.assert_array_equal(np.asarray(back), g)
    # local counts partition n
    total = sum(layout.cyclic_local_count(n, r, p, b) for r in range(p))
    assert total == n
    # every local index < local count of its owner
    for r in range(p):
        sel = np.asarray(owner) == r
        if sel.any():
            assert np.asarray(loc)[sel].max() < layout.cyclic_local_count(
                n, r, p, b
            )


def test_cyclic_matches_reference_convention():
    # reference: A(j,i) owner x = mod(j-1, x_nnod)+1 (1-based) — 0-based:
    # owner = j % p for cyclic(1)
    p = 4
    g = np.arange(20)
    np.testing.assert_array_equal(
        np.asarray(layout.cyclic_owner(g, p, 1)), g % p
    )
    np.testing.assert_array_equal(
        np.asarray(layout.cyclic_g2l(g, p, 1)), g // p
    )


def test_padded_local_dims():
    lr, lc = layout.padded_local_dims(1000, 2, 4)
    assert lr % layout.SUBLANE == 0 and lc % layout.LANE == 0
    assert lr >= layout.cyclic_local_size(1000, 2)
    assert lc >= layout.cyclic_local_size(1000, 4)
