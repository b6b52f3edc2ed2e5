"""Query modules — importing this package registers every query.

Each module covers one band of SURVEY.md §2's operator inventory.
Imports are explicit so a syntax error in one module is loud, not
silently skipped.
"""

from . import aggregates, relational, sources  # noqa: F401

ALL_MODULES = [aggregates, relational, sources]
