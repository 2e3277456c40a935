"""ndr_tpu — a TPU-native neural topology-optimization framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of the reference
"Neural Design Representations" stack (Python research layer + C++ VoxelFEM
core): coordinate-network density fields, a matrix-free voxel-grid linear
elasticity solver with geometric-multigrid-preconditioned CG, differentiable
SIMP compliance objectives with closed-form adjoint gradients, density
filters, volume-constraint satisfiers, OC/gradient optimizers, periodic
homogenization, and multiresolution / frequency-tuning training curricula.

Layer map (bottom → top), mirroring the reference's layer structure
(see SURVEY.md §1) but designed TPU-first:

  ndr_tpu.grid          regular voxel-grid geometry and index conventions
  ndr_tpu.fem           element matrices, boundary conditions, stiffness
                        apply (XLA + Pallas), multigrid, MGPCG, compliance
  ndr_tpu.ops           filters, volume constraint satisfiers, OC optimizer
  ndr_tpu.models        Fourier-feature MLP, SIREN, multi-head MLP, CNN
  ndr_tpu.parallel      device-mesh domain decomposition (shard_map)
  ndr_tpu.training      end-to-end drivers (neural TO + classic SIMP)
  ndr_tpu.eval          resolution-transfer evaluation
  ndr_tpu.utils         timers/benchmark facade, checkpointing, misc
  ndr_tpu.io            problem/BC/material JSON, density/mesh export
"""

__version__ = "0.1.0"

from ndr_tpu import grid  # noqa: F401
