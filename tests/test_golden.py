"""Golden-value regression pinned to the reference's committed run logs.

The reference's Slurm log for 2D MBB 300x100 (logs/slurm/gt/
2dMbb300x100.log) records the full OC objective trace; in float64 our
pipeline reproduces it step for step. This test runs the first OC steps
at the full production resolution and asserts the doubled objectives
against the log (SURVEY.md §4 item (e)).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ndr_tpu.io.problem import load_problem
from ndr_tpu.training.classic import ground_truth_topopt

# 2 * objective after OC steps 1..8, transcribed from the reference log
# ("objective, constraint, lambda estimate:" lines, doubled)
REFERENCE_TRACE = [2661.300, 1701.628, 1298.092, 1080.876,
                   933.508, 842.956, 746.392, 647.912]


@pytest.mark.slow
def test_mbb_300x100_oc_trace_matches_reference_log():
    cfg = load_problem("problems/2d/mbb_beam.json")
    result = ground_truth_topopt(
        cfg, max_iter=len(REFERENCE_TRACE) + 1, multigrid_levels=2,
        smoother="gs", dtype=jnp.float64, log=lambda s: None,
    )
    # history[i] is the compliance *before* step i; step-k objective of the
    # reference log corresponds to history[k]
    ours = result.history[1:len(REFERENCE_TRACE) + 1]
    np.testing.assert_allclose(ours, REFERENCE_TRACE, rtol=2e-4)
