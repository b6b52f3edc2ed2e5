"""Statistical tail of the reference pipeline, in-engine
(SURVEY.md §2.10)."""

from .clustering import kmeans_assign  # noqa: F401
from .regression import loglog_ols_exact, loglog_ols_ml  # noqa: F401
