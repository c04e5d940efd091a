"""Scalar diffusion problem -div(alpha grad u) = f.

Mirrors the reference ``DiffusionProblem<dim, spacedim>``
(include/Diffusion.h:56-306): one solution component, coefficient field
``Alpha`` (hard-coded to problem_parameter(1, 100, 8) in the reference,
Diffusion.h:62 — configurable here per the reference README's TODO list)."""

from __future__ import annotations

import numpy as np

from dealii_slod_tpu.config import SLODConfig
from dealii_slod_tpu.models.coefficients import make_field


class DiffusionProblem:
    name = "Diffusion"

    def __init__(self, cfg: SLODConfig):
        self.cfg = cfg
        self.n_components = 1
        self.alpha = make_field(cfg, cfg.dim)

    def coefficients(self, points: np.ndarray) -> dict:
        """Coefficient values at quadrature points (..., dim) -> {..., }."""
        return {"alpha": self.alpha(points)}

    def is_constant(self) -> bool:
        return getattr(self.alpha, "values", 0) is None
