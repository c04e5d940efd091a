"""Property test: the stencil coarse operator equals the explicit scipy
C^T (A C) triple product across a seeded random sweep of configurations
(dim, refinement, subdivisions, oversampling, components, stabilization,
coefficient contrast) — breadth beyond the hand-picked shapes of
tests/test_pipeline.py (mirrors the reference's assembly identity ladder,
tests/assembly_01.cc:1-13, at many geometries)."""

import numpy as np
import pytest

from dealii_slod_tpu.config import SLODConfig
from dealii_slod_tpu.models import (DiffusionProblem, ElasticityProblem,
                                    LODSolver, ReactionDiffusionProblem)

from tests.test_pipeline import _explicit_C_matrices

RNG = np.random.default_rng(20260818)
CONFIGS = []
for _ in range(8):
    dim = int(RNG.choice([2, 2, 3]))
    refine = int(RNG.choice([2, 3] if dim == 2 else [2]))
    CONFIGS.append(dict(
        dim=dim,
        n_global_refinements=refine,
        n_subdivisions=int(RNG.choice([2, 3])),
        oversampling=int(RNG.choice([1, 2])),
        kind=str(RNG.choice(["diffusion", "diffusion", "elasticity",
                             "reaction"])),
        lod_stabilization=bool(RNG.choice([True, False])),
        coef_max=float(RNG.choice([1.0, 100.0])),
    ))


@pytest.mark.parametrize("spec", CONFIGS,
                         ids=[f"d{c['dim']}r{c['n_global_refinements']}"
                              f"s{c['n_subdivisions']}l{c['oversampling']}"
                              f"{c['kind'][:4]}"
                              f"{'S' if c['lod_stabilization'] else 'L'}"
                              f"k{int(c['coef_max'])}"
                              for c in CONFIGS])
def test_stencil_triple_product_random_config(spec):
    spec = dict(spec)
    kind = spec.pop("kind")
    coef_max = spec.pop("coef_max")
    n_comp = spec["dim"] if kind == "elasticity" else 1
    cfg = SLODConfig(rhs="1" if n_comp == 1 else "; ".join(["1"] * n_comp),
                     bc="0", constant_coefficients=coef_max == 1.0,
                     coef_seed=7, coef_refinement=3, coef_min=1.0,
                     coef_max=coef_max, reaction="1 + x",
                     **spec)
    prob = {"diffusion": DiffusionProblem, "elasticity": ElasticityProblem,
            "reaction": ReactionDiffusionProblem}[kind](cfg)
    sol = LODSolver(cfg, prob, verbose=False)
    sol.compute_basis()
    sol.assemble_coarse_operator()

    Cmat, ACmat = _explicit_C_matrices(sol)
    A_ref = (Cmat.T @ ACmat).toarray()
    P, C = sol.topo.n_patches, sol.C
    A_st = np.asarray(sol.A_stencil)
    nbr = np.asarray(sol.stencil_nbr)
    valid = np.asarray(sol.stencil_valid)
    A_full = np.zeros((P * C, P * C))
    for q in range(P):
        for k in range(sol.n_stencil):
            if valid[q, k]:
                p = nbr[q, k]
                A_full[q * C:(q + 1) * C, p * C:(p + 1) * C] = A_st[q, k]
    np.testing.assert_allclose(A_full, A_ref, rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(A_full, A_full.T, rtol=1e-9, atol=1e-11)
