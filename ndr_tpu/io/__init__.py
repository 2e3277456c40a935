"""Problem / boundary-condition / material file IO."""

from ndr_tpu.io.problem import (  # noqa: F401
    BoundaryConditions,
    load_bcs,
    load_material,
    load_problem,
    ProblemConfig,
)
