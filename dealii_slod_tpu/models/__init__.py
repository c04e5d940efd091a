from dealii_slod_tpu.models.lod import LODSolver  # noqa: F401
from dealii_slod_tpu.models.diffusion import DiffusionProblem  # noqa: F401
from dealii_slod_tpu.models.elasticity import ElasticityProblem  # noqa: F401
from dealii_slod_tpu.models.reaction import ReactionDiffusionProblem  # noqa: F401
