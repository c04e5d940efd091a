from dealii_slod_tpu.parallel.mesh import make_mesh, shard_patches  # noqa: F401
