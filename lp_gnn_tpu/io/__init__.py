from .mps import read_mps, write_mps, LPData
from .bas import (
    read_bas, read_bas_highs, write_bas_highs, write_bas_cplex,
    check_lb, check_ub,
)
