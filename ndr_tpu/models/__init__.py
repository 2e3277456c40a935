"""Neural design-representation models.

The model zoo of the reference's `networks.py`, re-implemented as pure-JAX
parameter pytrees + apply functions (no framework classes — everything
composes under jit/grad/vmap and checkpoints as plain arrays):

  * :mod:`mlp` — the paper's Fourier-feature MLP (frequency-tuned density
    field) + homogeneous init + multi-headed continual-learning variant.
  * :mod:`siren` — SIREN alternative.
  * :mod:`cnn` — the Google neural-structural-optimization CNN generator
    and the deconv GAN-style generator.
"""

from ndr_tpu.models.mlp import (  # noqa: F401
    MLPConfig,
    init_mlp,
    mlp_apply,
    mlp_apply_chunked,
    homogeneous_init,
    init_multihead_mlp,
    multihead_apply,
    change_scale_value,
)
from ndr_tpu.models.siren import SirenConfig, init_siren, siren_apply  # noqa: F401
from ndr_tpu.models.cnn import CNNConfig, init_cnn, cnn_apply  # noqa: F401
