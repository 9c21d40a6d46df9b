"""gtsam_tpu: a TPU-native factor-graph smoothing-and-mapping engine.

Brand-new JAX/XLA/Pallas design with the capabilities of borglab/gtsam
(see SURVEY.md for the blueprint).  Core ideas:
  - typed factor batches (struct-of-arrays) + vmapped autodiff linearization
  - batched Lie-group geometry (SO3/SE3/SE2/...) with AD-safe kernels
  - host-side symbolic analysis (orderings, elimination trees) compiled into
    static, level-scheduled device solves
  - multi-chip scaling via jax.sharding meshes and XLA collectives
"""

from . import config  # noqa: F401  (enables x64 before anything else)

from .base import keys, losses, noise  # noqa: E402,F401
from .base.keys import format_key, shorthand, symbol, symbol_chr, symbol_index  # noqa: E402,F401
from .geometry import se2, se3, so3  # noqa: E402,F401
from .geometry.se3 import SE3  # noqa: E402,F401
from .graph import factors, manifolds  # noqa: E402,F401
from .graph.factors import (  # noqa: E402,F401
    FactorBatch,
    between_factors,
    custom_factors,
    prior_factors,
)
from .graph.graph import BoundGraph, FactorGraph  # noqa: E402,F401
from .graph.values import Values  # noqa: E402,F401
from .optimize.optimizers import (  # noqa: E402,F401
    DenseQRSolver,
    DenseSolver,
    DoglegParams,
    LMParams,
    OptimizerParams,
    SparseSolver,
    dogleg,
    gauss_newton,
    levenberg_marquardt,
    levenberg_marquardt_fused,
    nonlinear_conjugate_gradient,
)

from .nonlinear.isam2 import ISAM2, ISAM2Params  # noqa: E402,F401
from .nonlinear.marginals import Marginals  # noqa: E402,F401
from .nonlinear.fixed_lag import (  # noqa: E402,F401
    BatchFixedLagSmoother, FixedLagParams, IncrementalFixedLagSmoother,
    marginalize,
)
from .graph.factors import slice_batch  # noqa: E402,F401
from .slam import extras as slam_extras  # noqa: E402,F401
from .navigation import ahrs  # noqa: E402,F401
from .hybrid import elimination as hybrid_elimination  # noqa: E402,F401
from .optimize.gnc import GncParams, gnc_optimize  # noqa: E402,F401
from .linear.pcg import PCGSolver, SubgraphPCGSolver  # noqa: E402,F401

__version__ = "0.1.0"
