from .coefficients import build_coefficients, evaluate_spline_np
from .eval import eval_dense, eval_sparse, find_segments
from .monolith import (
    DenseSplineTable,
    SparseSplineTable,
    SplineParamSpec,
    build_dense_table,
    build_sparse_table,
    load_table,
    save_table,
)

__all__ = [
    "load_table",
    "save_table",
    "build_coefficients",
    "evaluate_spline_np",
    "eval_dense",
    "eval_sparse",
    "find_segments",
    "DenseSplineTable",
    "SparseSplineTable",
    "SplineParamSpec",
    "build_dense_table",
    "build_sparse_table",
]
