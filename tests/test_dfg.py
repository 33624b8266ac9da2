"""DFG benchmark validation (coarse meshes; accuracy bars widen with h).

Reference literature values: 2D-1 Cd=5.57953523384, Cl=0.010618948146
(DFG_2D_Validation.py:202-203); 3D-1Z Cd ~ 6.18.
"""

import numpy as np
import pytest

from stabilized_navier_stokes_flow_fenicsx_tpu.apps.dfg2d import (
    CD_REF, solve_dfg2d)


def test_dfg2d_drag():
    r1 = solve_dfg2d(1.0)
    assert r1.converged
    assert abs(r1.cd - CD_REF) / CD_REF < 0.12
    r2 = solve_dfg2d(0.5)
    assert r2.converged
    assert abs(r2.cd - CD_REF) < abs(r1.cd - CD_REF)
    assert abs(r2.cd - CD_REF) / CD_REF < 0.08
    # lift is tiny and mesh-sensitive; assert order of magnitude only
    assert abs(r2.cl) < 0.1


@pytest.mark.slow
def test_dfg3d_drag():
    from stabilized_navier_stokes_flow_fenicsx_tpu.apps.dfg3d import (
        solve_dfg3d)

    r = solve_dfg3d(2.0)
    assert r.converged
    assert 2.5 < r.cd < 7.5
