"""Guard the driver contract in __graft_entry__.py.

The round driver compile-checks entry() on one chip and executes
dryrun_multichip(N) on a virtual N-device CPU mesh; a regression there
fails the round's artifacts outside the test suite. Exercise both here
under the same conditions (tests/conftest.py provides the 8-device CPU
mesh) so breakage is caught by `pytest` first.
"""

import pathlib
import sys

import jax

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import __graft_entry__ as graft  # noqa: E402


def test_entry_compiles_and_runs():
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    # [B, iq_buff_size, 2] int16 samples, not all zero.
    assert out.ndim == 3 and out.shape[2] == 2
    assert out.dtype == jax.numpy.int16
    assert int(jax.numpy.abs(out).max()) > 0


def test_dryrun_multichip_8():
    graft.dryrun_multichip(8)
