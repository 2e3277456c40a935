"""Microstructure design: match a target homogenized elasticity tensor.

Replaces the reference's optional Knitro-based designer
(VoxelFEM/knitro_optimization.hh — objective ||Eh - E*||^2 with
integrality/smoothness/volume regularizers) and its toy gradient-descent
driver (TPPeriodicHomogenization.hh:169-213 gradientDescent) with an
optax/Adam loop on sigmoid-parameterized densities, using the
*closed-form* dEh/drho (no differentiation through the cell solves).
"""

from __future__ import annotations

import dataclasses
import sys
from typing import Callable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ndr_tpu.fem import element as el
from ndr_tpu.fem import homogenization as hom
from ndr_tpu.grid import Grid


@dataclasses.dataclass
class MicrostructureResult:
    rho: np.ndarray
    Eh: np.ndarray
    history: List[float]


def tensor_distance(Eh, target):
    """Squared relative Frobenius distance (reference:
    TPPeriodicHomogenization.hh:178 and knitro objective)."""
    t = jnp.asarray(target, Eh.dtype)
    return jnp.sum((Eh - t) ** 2) / jnp.sum(t ** 2)


def design_microstructure(
    target_voigt,
    grid: Grid,
    material: el.IsotropicMaterial,
    rho0: Optional[jnp.ndarray] = None,
    steps: int = 100,
    learning_rate: float = 0.05,
    rho_min: float = 1e-3,
    smoothness_weight: float = 0.0,
    binary_weight: float = 0.0,
    volume_target: Optional[float] = None,
    volume_weight: float = 0.0,
    cg_tol: float = 1e-9,
    log: Callable[[str], None] = lambda s: sys.stderr.write(s),
    log_every: int = 10,
) -> MicrostructureResult:
    """Adam on logits of rho to match `target_voigt` (engineering Voigt).

    The gradient of the tensor-matching term is assembled from the
    closed-form dEh/drho; regularizers (smoothness via neighbor
    differences, integrality 4 rho (1-rho), volume) differentiate
    natively, mirroring the knitro regularizer set.
    """
    degrees = tuple([grid.degree] * grid.ndim)
    K0 = jnp.asarray(el.element_stiffness_matrix(degrees, grid.stretchings, material))
    target = jnp.asarray(target_voigt)

    if rho0 is None:
        rho0 = jnp.full(grid.dims, 0.5)
    logits0 = jnp.log(rho0 / (1.0 - rho0 + 1e-12))

    optimizer = optax.adam(learning_rate)

    def rho_of(logits):
        return rho_min + (1.0 - rho_min) * jax.nn.sigmoid(logits)

    @jax.jit
    def step(logits, opt_state):
        rho = rho_of(logits)
        w = hom.solve_cell_problems(rho, grid, material, K0, tol=cg_tol)
        Eh = hom.homogenized_elasticity_tensor(w, rho, grid, material, K0)
        dist = tensor_distance(Eh, target)
        dEh = hom.homogenized_tensor_gradient(w, grid, material, K0)
        g_match = jnp.einsum(
            "st,...st->...", 2.0 * (Eh - target) / jnp.sum(target ** 2), dEh
        )

        def reg(rho):
            r = 0.0
            if smoothness_weight:
                for ax in range(grid.ndim):
                    d = jnp.diff(rho, axis=ax)
                    r = r + smoothness_weight * jnp.sum(d * d) / rho.size
            if binary_weight:
                r = r + binary_weight * jnp.mean(4.0 * rho * (1.0 - rho))
            if volume_weight and volume_target is not None:
                r = r + volume_weight * (jnp.mean(rho) - volume_target) ** 2
            return r

        g_reg = jax.grad(reg)(rho) if (smoothness_weight or binary_weight or volume_weight) else 0.0
        drho_dlogits = (1.0 - rho_min) * jax.nn.sigmoid(logits) * (1 - jax.nn.sigmoid(logits))
        grads = (g_match + g_reg) * drho_dlogits
        updates, opt_state = optimizer.update(grads, opt_state)
        return optax.apply_updates(logits, updates), opt_state, dist, Eh

    logits = logits0
    opt_state = optimizer.init(logits)
    history = []
    Eh = None
    for i in range(steps):
        logits, opt_state, dist, Eh = step(logits, opt_state)
        history.append(float(dist))
        if i % log_every == 0 or i == steps - 1:
            log(f"microstructure step {i}: sq rel Frobenius distance {float(dist):.3e}\n")
    return MicrostructureResult(
        rho=np.asarray(rho_of(logits)), Eh=np.asarray(Eh), history=history
    )
