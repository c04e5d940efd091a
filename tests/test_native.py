"""Native C++ component tests: topology builder == NumPy reference,
binary VTU writer round-trip."""

import os
import xml.etree.ElementTree as ET

import numpy as np
import pytest

from dealii_slod_tpu.grid import GridSpec, cartesian_coords, ravel
from dealii_slod_tpu.utils import native


needs_native = pytest.mark.skipif(native.load() is None,
                                  reason="native library unavailable")


@needs_native
@pytest.mark.parametrize("dim,N,ell", [(2, 8, 2), (2, 32, 4), (3, 8, 2)])
def test_native_build_patches_matches_numpy(dim, N, ell):
    lo, shape, central, sides = native.build_patches(dim, N, ell)
    centers = cartesian_coords(np.full(dim, N))
    lo_ref = np.clip(centers - ell, 0, None)
    hi_ref = np.clip(centers + ell, None, N - 1)
    shape_ref = hi_ref - lo_ref + 1
    assert np.array_equal(lo, lo_ref)
    assert np.array_equal(shape, shape_ref)
    assert np.array_equal(central, ravel(centers - lo_ref, shape_ref))
    for k in range(dim):
        assert np.array_equal(sides[:, 2 * k], lo_ref[:, k] == 0)
        assert np.array_equal(sides[:, 2 * k + 1], hi_ref[:, k] == N - 1)


@needs_native
def test_native_vtu_roundtrip(tmp_path):
    g = GridSpec(dim=2, n_coarse=2, n_sub=2)
    from dealii_slod_tpu.grid import global_connectivity
    pts = g.node_coords()
    pts3 = np.concatenate([pts, np.zeros((len(pts), 1))], axis=1)
    cells = global_connectivity(g)[:, [0, 1, 3, 2]].astype(np.int64)
    field = np.arange(len(pts), dtype=np.float64)
    path = str(tmp_path / "t.vtu")
    ok = native.write_vtu_binary(path, pts3, cells, 9,
                                 {"u": field}, {"c": np.ones(len(cells))})
    assert ok
    raw = open(path, "rb").read()
    header = raw.split(b"<AppendedData", 1)[0].decode()
    root = ET.fromstring(header + "</VTKFile>")
    piece = root.find(".//Piece")
    assert piece.get("NumberOfPoints") == str(len(pts))
    assert piece.get("NumberOfCells") == str(len(cells))
    # check the appended payload: first block is the points
    blob = raw.split(b'encoding="raw">', 1)[1]
    blob = blob[blob.index(b"_") + 1:]
    nbytes = np.frombuffer(blob[:8], dtype=np.uint64)[0]
    assert nbytes == len(pts) * 3 * 8
    pts_read = np.frombuffer(blob[8:8 + int(nbytes)],
                             dtype=np.float64).reshape(-1, 3)
    np.testing.assert_array_equal(pts_read, pts3)


def test_vtu_writer_uses_native_or_falls_back(tmp_path):
    # write through the io layer; must produce a parseable file either way
    from dealii_slod_tpu.utils.io import write_fine_grid_vtu
    g = GridSpec(dim=2, n_coarse=2, n_sub=2)
    path = str(tmp_path / "f.vtu")
    write_fine_grid_vtu(path, g, {"u": np.zeros(g.n_nodes)})
    raw = open(path, "rb").read()
    assert raw.startswith(b"<?xml")
    assert b"UnstructuredGrid" in raw
