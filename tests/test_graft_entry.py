"""Driver-contract regression tests: entry() compiles single-device;
dryrun_multichip runs a full dp x edge step on the virtual mesh."""
import numpy as np
import jax

import __graft_entry__ as ge


def test_entry_compiles():
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    lc, lv = out
    assert lc.shape[-1] == 3 and lv.shape[-1] == 3
    assert np.isfinite(np.asarray(lc)).all()


def test_dryrun_multichip_8():
    ge.dryrun_multichip(8)


def test_dryrun_multichip_odd():
    ge.dryrun_multichip(3)
