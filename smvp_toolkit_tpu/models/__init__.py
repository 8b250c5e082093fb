"""Iterative sparse solvers built on the SpMV kernels.

The reference toolkit's only "workload" is the timed y = A·x loop
(main-cli.c:402-420); these solvers are the framework's flagship models —
the realistic production consumers of iterated SpMV (power iteration,
PageRank, conjugate gradients, Jacobi), each a jit-compiled
``lax.while_loop``/``lax.scan`` with no host round-trips per step.
"""

from smvp_toolkit_tpu.models.solvers import (
    power_iteration,
    pagerank,
    conjugate_gradient,
    bicgstab,
    jacobi,
    lanczos,
    cgls,
    gmres,
    pcg,
    pcg_precond,
    jacobi_preconditioner,
    chebyshev_preconditioner,
    ic0_preconditioner,
    ilu_preconditioner,
    ssor_preconditioner,
    block_jacobi_preconditioner,
    chebyshev,
    minres,
    lanczos_eigsh,
    lobpcg,
    block_cg,
    refine_solve,
)
from smvp_toolkit_tpu.models.amg import (
    AMGLevel,
    amg_preconditioner,
    amg_setup,
)
from smvp_toolkit_tpu.models.graph import (
    gcn_norm,
    gcn_layer,
    gcn_forward,
    gcn_train_step,
    gcn_train_step_edges,
    gcn_init,
)

__all__ = [
    "AMGLevel",
    "amg_preconditioner",
    "amg_setup",
    "power_iteration",
    "pagerank",
    "conjugate_gradient",
    "bicgstab",
    "jacobi",
    "lanczos",
    "cgls",
    "gmres",
    "pcg",
    "pcg_precond",
    "jacobi_preconditioner",
    "chebyshev_preconditioner",
    "ic0_preconditioner",
    "ilu_preconditioner",
    "ssor_preconditioner",
    "block_jacobi_preconditioner",
    "chebyshev",
    "minres",
    "lanczos_eigsh",
    "lobpcg",
    "block_cg",
    "refine_solve",
    "gcn_norm",
    "gcn_layer",
    "gcn_forward",
    "gcn_train_step",
    "gcn_train_step_edges",
    "gcn_init",
]
