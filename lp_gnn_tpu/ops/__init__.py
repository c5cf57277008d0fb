from .spmm import (
    segment_spmm, spmm_cons_to_vars, spmm_vars_to_cons, sddmm,
    bidir_spmm,
)
