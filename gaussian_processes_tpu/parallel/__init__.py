from .mesh import make_mesh, population_shardings
from .population import (fit_population, fit_cells_sequential,
                         population_em_program)
from .large import large_cholesky, large_gram, large_posterior_mean
