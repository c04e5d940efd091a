"""Golden diff of the triple-product sparsity/overlap combinatorics against
the reference's parallel_assembly test (tests/parallel_assembly.cc +
.output): 4x4 coarse cells (refine=2), n_subdivisions=2, oversampling=1,
spacedim=2, basis functions identically 1 on each patch's sub-mesh.

With B(i, 2p+d) = 1 for every fine vector dof i in patch p (the test's
dummy basis, parallel_assembly.cc:298-317 + :440-487), the assembled
A_LOD = B^T B has entries

    A(2p+d, 2q+e) = #(fine vector dofs in window(p) ∩ window(q))
                  = spacedim * prod_axis overlap_nodes(p, q)

— i.e. the full pairwise overlap-count table of the clipped patch windows.
The reference prints all 1024 entries (patches in deal.II active-cell
Morton order); this checks `grid.PatchTopology`'s window geometry (lo /
shape clipping) pair-by-pair against every printed value.
"""
import os

import numpy as np
import pytest

from dealii_slod_tpu.grid import GridSpec, PatchTopology

GOLDEN = "/root/reference/tests/parallel_assembly.output"


def _morton_to_lex(n_levels):
    n = 2 ** n_levels
    idx = np.arange(n * n)
    x = np.zeros(n * n, dtype=int)
    y = np.zeros(n * n, dtype=int)
    for b in range(n_levels):
        x |= ((idx >> (2 * b)) & 1) << b
        y |= ((idx >> (2 * b + 1)) & 1) << b
    return x + n * y


@pytest.mark.skipif(not os.path.exists(GOLDEN),
                    reason="reference tree not present")
def test_parallel_assembly_overlap_table_golden():
    entries = {}
    for ln in open(GOLDEN).read().splitlines():
        if not ln.strip():
            continue
        rc, v = ln.split()
        r, c = rc.strip("()").split(",")
        entries[(int(r), int(c))] = float(v)
    assert len(entries) == 1024                 # (16 patches x 2 comps)^2

    sub, spacedim = 2, 2
    g = GridSpec(dim=2, n_coarse=4, n_sub=sub)
    topo = PatchTopology(g, oversampling=1)
    m2l = _morton_to_lex(2)                     # reference patch id -> lex

    # fine-node windows (inclusive): [lo*sub, (lo+shape)*sub]
    lo = topo.patch_lo * sub
    hi = (topo.patch_lo + topo.patch_shape) * sub

    for (r, c), v in entries.items():
        p = m2l[r // spacedim]
        q = m2l[c // spacedim]
        ov = np.maximum(
            0, np.minimum(hi[p], hi[q]) - np.maximum(lo[p], lo[q]) + 1)
        assert spacedim * int(np.prod(ov)) == int(v), (r, c, v)
