from .kernels import (
    acosker, gram_matrices, materialize_C, local_envelope, smooth_factor,
    pixel_coords, acos_J,
)
from .stabilize import (
    Eigenspace, compute_eigenspace, project_gram, reproject,
    logdet_with_fallback, masked_inverse, block_matrix_inverse,
)
