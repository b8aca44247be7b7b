"""helmnet-tpu: a TPU-native framework for learned iterative Helmholtz solvers.

Built from scratch against the capabilities of ucl-bug/helmnet (JCP 2021):
an unsupervised, fully-learned iterative solver for the heterogeneous 2D
Helmholtz equation with PML, plus classical GMRES baselines — redesigned for
TPU (JAX/XLA/Pallas): functional pytree models, lax.scan rollouts, dense
MXU formulations of the spectral operator, and mesh-sharded training.
"""

__version__ = "0.1.0"

from .core.config import Config, load_settings  # noqa: F401
