"""Sources: the engine's table surface.

``catalog`` loads the driver-generated base tables; ``fixtures``
derives the reference-shaped source tables (SURVEY.md §1.4 / FIXTURES.md §B)
deterministically from them, in both Spark and DuckDB dialects, so
every domain operator is verifiable against the DuckDB oracle.
"""
