"""FEMProblem: the assembled, jit-ready description of an elasticity problem.

This is the TPU-native analogue of the reference's
``TensorProductSimulator`` (TensorProductSimulator.hh:220-1421): grid
geometry + material + boundary conditions + SIMP parameters, but expressed
as a frozen pytree of arrays so the whole optimization step can live under
one ``jax.jit``.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ndr_tpu.fem import element as el
from ndr_tpu.fem import operators as ops
from ndr_tpu.grid import Grid, make_grid
from ndr_tpu.io.problem import BoundaryConditions, ProblemConfig, load_bcs, load_material


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class FEMProblem:
    """Static elasticity problem on a voxel grid.

    Array fields are pytree leaves; `grid` and SIMP scalars are static
    metadata (they determine trace shapes / compiled constants).
    """

    # --- pytree leaves ---
    K0: jnp.ndarray                 # (dofs_pe, dofs_pe) full-density element K
    dirichlet_mask: jnp.ndarray     # bool, nodes_per_dim + (N,)
    force: jnp.ndarray              # nodes_per_dim + (N,)

    # --- static metadata ---
    grid: Grid = dataclasses.field(metadata=dict(static=True))
    E0: float = dataclasses.field(metadata=dict(static=True), default=1.0)
    Emin: float = dataclasses.field(metadata=dict(static=True), default=1e-4)
    gamma: float = dataclasses.field(metadata=dict(static=True), default=3.0)

    # ---- operators -------------------------------------------------------

    def young(self, rho: jnp.ndarray) -> jnp.ndarray:
        return ops.element_young_modulus(rho, self.E0, self.Emin, self.gamma)

    def apply_k(self, u: jnp.ndarray, rho: jnp.ndarray) -> jnp.ndarray:
        return ops.apply_k(u, self.young(rho), self.K0, self.grid)

    def zero_dirichlet(self, u: jnp.ndarray) -> jnp.ndarray:
        return ops.zero_dirichlet(u, self.dirichlet_mask)

    def compliance_gradient(self, u: jnp.ndarray, rho: jnp.ndarray) -> jnp.ndarray:
        return ops.compliance_gradient(
            u, rho, self.K0, self.grid, self.E0, self.Emin, self.gamma
        )

    def num_dofs(self) -> int:
        return self.grid.num_nodes * self.grid.ndim

def build_problem(
    grid: Grid,
    material: el.IsotropicMaterial,
    bcs: BoundaryConditions,
    E0: float = 1.0,
    Emin: float = 1e-4,
    gamma: float = 3.0,
    dtype=None,
) -> FEMProblem:
    """Assemble a FEMProblem from geometry, material, and nodal BCs.

    NOTE: K0 is always kept in float64 (when x64 is enabled). Rounding
    K0 to float32 perturbs away the element matrix's exact rigid-body
    null space, and smooth deformation modes amplify that ~5e-8
    perturbation by ~1e5x into percent-level compliance errors; every
    consumer casts K0 down to its working dtype itself, and the
    mixed-precision refinement measures residuals against the true
    float64 operator.
    """
    dtype = dtype or jnp.zeros(0).dtype  # respect x64 setting by default
    K0 = el.element_stiffness_matrix(
        tuple([grid.degree] * grid.ndim), grid.stretchings, material
    )
    return FEMProblem(
        K0=jnp.asarray(K0),
        dirichlet_mask=jnp.asarray(bcs.dirichlet_mask),
        force=jnp.asarray(bcs.force, dtype=dtype),
        grid=grid,
        E0=E0,
        Emin=Emin,
        gamma=gamma,
    )


def problem_from_config(
    cfg: ProblemConfig, dims=None, dtype=None
) -> Tuple[FEMProblem, Grid]:
    """Build a FEMProblem from a problem-JSON config.

    Mirrors ``initializeTensorProductSimulator``
    (reference: VoxelFEM/python/helpers/ipopt_helpers.py:7-15).
    """
    grid = cfg.make_grid(dims)
    material = load_material(cfg.material_path, grid.ndim)
    bcs = load_bcs(cfg.bc_path, grid)
    prob = build_problem(
        grid, material, bcs,
        E0=cfg.E0, Emin=cfg.Emin, gamma=cfg.simp_exponent, dtype=dtype,
    )
    return prob, grid
