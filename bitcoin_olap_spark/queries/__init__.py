"""Query modules — importing this package registers every query.

Each module covers one band of SURVEY.md §2's operator inventory.
"""

from . import aggregates  # noqa: F401

ALL_MODULES = [aggregates]

# Extended incrementally; keep imports explicit so a syntax error in one
# module is loud, not silently skipped.
try:
    from . import sources  # noqa: F401

    ALL_MODULES.append(sources)
except ImportError:
    pass
