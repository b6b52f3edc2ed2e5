"""Query modules — importing this package registers every query.

Each module covers one band of SURVEY.md §2's operator inventory.
Imports are explicit so a syntax error in one module is loud, not
silently skipped.
"""

from . import (  # noqa: F401
    aggregates,
    analytics,
    behavior,
    functions,
    joins,
    llmdata,
    multimodal,
    pipeline,
    relational,
    sorts_sets,
    sources,
    streaming,
    tpch,
    windows,
)

ALL_MODULES = [
    aggregates,
    analytics,
    behavior,
    functions,
    joins,
    llmdata,
    multimodal,
    pipeline,
    relational,
    sorts_sets,
    sources,
    streaming,
    tpch,
    windows,
]
