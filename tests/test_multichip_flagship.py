"""Flagship multi-chip coverage as a checkable pytest (r2 VERDICT item #1):
the FULL production graph — DaNet HRNet-W48, 224px, all losses, backward,
Adam — must lower+compile for an 8-device data-parallel mesh. The driver's
dryrun (__graft_entry__.dryrun_multichip) runs the same check under a time
budget; this test is the unbudgeted slow-tier anchor (~75 s with a warm
.jax_cache, ~17 min cold on a 1-core host).
"""

import sys
import os

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.mark.slow
@pytest.mark.parametrize("graph", ["toy", "flagship"])
def test_compile_full_mesh(graph):
    import __graft_entry__ as ge

    # conftest already forced 8 virtual CPU devices; _compile_only's own
    # _force_host_devices call is then a no-op that just validates the count
    ge._compile_only(8, flagship=(graph == "flagship"))
