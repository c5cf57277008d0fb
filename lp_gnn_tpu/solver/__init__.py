from .highs_bridge import solve_mps, solve_lp, SolveResult, HAVE_HIGHS
from .crash import bixby_crash_basis
