from dealii_slod_tpu.parallel.mesh import make_mesh, shard_patches  # noqa: F401
from dealii_slod_tpu.parallel.sweep import stack_fields, sweep_step  # noqa: F401
