from dealii_slod_tpu.ops import element, assembly, solvers, eig  # noqa: F401
