from .mesh import make_mesh, population_shardings
from .population import fit_population, population_em_program
