"""gaussian_processes_tpu — a TPU-native spatial Gaussian-Process framework.

Re-architecture of the retinal-information-processing-lab/gaussian_processes
capabilities (sparse variational GP inference of retinal-ganglion-cell
receptive fields with Poisson observations, closed-loop active stimulus
selection, reliability-corrected evaluation) as idiomatic JAX/XLA/Pallas for
TPU: Kronecker-factored kernel construction on the MXU, static-shape
eigenspace stabilization, one-program jit'd EM fits, vmap population fits and
mesh-sharded Gram/solve paths for scale-out.
"""

from . import config, params
from .config import FitConfig
from .params import (
    generate_theta, default_f_params, theta_bounds,
    logbetaexpr_to_beta, logrhoexpr_to_rho,
    fromlogbetasam_to_logbetaexpr, fromlogrhosam_to_logrhoexpr,
    get_sta,
)

__version__ = "0.1.0"
