"""Compute core: dense LA, Student-t primitives, MC estimators, Pallas kernels."""

from snngp.ops.linalg import (
    jitter, add_jitter, add_diag_reg, logdet, trace, split_kernel,
    cholesky, chol_solve, chol_logdet, chol_quad_form,
    solve_psd, inv_psd, gp_predict, mvn_logpdf,
)
from snngp.ops.mvt import multivariate_t, multivariate_t_logpdf
from snngp.ops.softmax import (
    get_true_values, log_likelihood, test_log_likelihood, get_correct_count,
)

__all__ = [
    "jitter", "add_jitter", "add_diag_reg", "logdet", "trace", "split_kernel",
    "cholesky", "chol_solve", "chol_logdet", "chol_quad_form",
    "solve_psd", "inv_psd", "gp_predict", "mvn_logpdf",
    "multivariate_t", "multivariate_t_logpdf",
    "get_true_values", "log_likelihood", "test_log_likelihood", "get_correct_count",
]
