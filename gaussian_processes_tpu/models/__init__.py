from .moments import (
    lambda_moments, mean_f_given_lambda_moments, lambda0_given_logA,
    poisson_ell, kl_divergence, lambda_moments_star,
)
from .estep import estep_update
