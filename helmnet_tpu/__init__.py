"""helmnet-tpu: a TPU-native framework for learned iterative Helmholtz solvers.

Built from scratch against the capabilities of ucl-bug/helmnet (JCP 2021):
an unsupervised, fully-learned iterative solver for the heterogeneous 2D
Helmholtz equation with PML, plus first-class classical baselines (restarted
GMRES, pseudospectral time-domain) — redesigned for TPU (JAX/XLA/Pallas):
functional pytree models, lax.scan rollouts, MXU matmul formulations of the
spectral operator, Pallas stencil kernels, and mesh-sharded training.

Public API mirrors the reference package surface (helmnet/__init__.py) plus
the new first-class components.
"""

__version__ = "0.1.0"

from .core.config import (  # noqa: F401
    Config,
    GeometryConfig,
    MediumConfig,
    ModelConfig,
    ParallelConfig,
    SourceConfig,
    TrainingConfig,
    load_settings,
)
from .core.meshes import make_mesh  # noqa: F401
from .data.ellipses import make_dataset as make_ellipses_dataset  # noqa: F401
from .models import hybridnet, hybridnet3d, resnet  # noqa: F401
from .models.activations import get_activation  # noqa: F401
from .models.blocks import conv2d, conv_transpose2d, double_conv  # noqa: F401
from .models.convgru import convgru, init_convgru  # noqa: F401
from .models.registry import get_architecture  # noqa: F401
from .ops.source import point_source_map, source_batch_from_locations  # noqa: F401
from .ops.spectral import (  # noqa: F401
    SpectralPML,
    helmholtz_residual,
    laplacian,
    make_operator,
)
from .ops.spectral3d import (  # noqa: F401
    SpectralPML3D,
    helmholtz_residual3d,
    laplacian3d,
    make_operator3d,
    point_source_map3d,
)
from .ops.stencil import (  # noqa: F401
    StencilPML,
    helmholtz_residual_stencil,
    make_stencil_operator,
)
from .solvers.gmres import (  # noqa: F401
    solve_helmholtz,
    solve_helmholtz_batch,
    solve_helmholtz_checked,
    solve_helmholtz_chunked,
)
from .solvers.auto import (  # noqa: F401
    SolverPlan,
    choose_solver,
    solve_auto,
)
from .core.sanitize import checked, check_finite, debug_nans  # noqa: F401
from .solvers.helm3d import (  # noqa: F401
    solve_helmholtz3d,
    solve_helmholtz3d_batch,
)
from .solvers.fgmres import solve_fgmres, solve_fgmres_learned  # noqa: F401
from .solvers.twolevel import (  # noqa: F401
    solve_fgmres_multilevel,
    solve_fgmres_two_level,
)
from .solvers.twolevel3d import solve_fgmres_two_level3d  # noqa: F401
from .solvers.deflation import (  # noqa: F401
    gmres_deflated,
    solve_helmholtz_deflated,
)
from .solvers.hybrid import solve_hybrid  # noqa: F401
from .serve import ServeConfig, SolverService  # noqa: F401
from .solvers.iterative import IterativeSolver, rollout  # noqa: F401
from .solvers.iterative3d import IterativeSolver3D, rollout3d  # noqa: F401
from .solvers.timedomain import (  # noqa: F401
    solve_cw, solve_cw3d, solve_cw3d_chunked,
)
from .train.checkpoint import load_reference_checkpoint  # noqa: F401
from .train.loop import Trainer  # noqa: F401
from .train.replay import ExperienceBatch, ReplayBuffer  # noqa: F401

__all__ = [
    "Config",
    "GeometryConfig",
    "MediumConfig",
    "ModelConfig",
    "ParallelConfig",
    "SourceConfig",
    "TrainingConfig",
    "load_settings",
    "make_mesh",
    "make_ellipses_dataset",
    "hybridnet",
    "hybridnet3d",
    "resnet",
    "get_activation",
    "get_architecture",
    "conv2d",
    "conv_transpose2d",
    "double_conv",
    "convgru",
    "init_convgru",
    "point_source_map",
    "source_batch_from_locations",
    "SpectralPML",
    "SpectralPML3D",
    "StencilPML",
    "laplacian",
    "laplacian3d",
    "helmholtz_residual",
    "helmholtz_residual3d",
    "helmholtz_residual_stencil",
    "make_operator",
    "make_operator3d",
    "make_stencil_operator",
    "point_source_map3d",
    "solve_helmholtz",
    "solve_helmholtz_checked",
    "checked",
    "check_finite",
    "debug_nans",
    "solve_helmholtz_batch",
    "solve_helmholtz3d",
    "solve_helmholtz3d_batch",
    "solve_fgmres",
    "solve_fgmres_learned",
    "solve_fgmres_multilevel",
    "solve_fgmres_two_level",
    "solve_fgmres_two_level3d",
    "gmres_deflated",
    "solve_helmholtz_deflated",
    "solve_hybrid",
    "solve_cw",
    "solve_cw3d",
    "solve_cw3d_chunked",
    "IterativeSolver",
    "IterativeSolver3D",
    "ServeConfig",
    "SolverService",
    "rollout",
    "rollout3d",
    "Trainer",
    "ReplayBuffer",
    "ExperienceBatch",
    "load_reference_checkpoint",
]
