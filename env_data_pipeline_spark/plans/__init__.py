"""Named query plans — the engine's public query surface.

Each module registers queries via :mod:`plans.registry`; the driver
contract (``__spark_entry__.py``) exposes the registry verbatim.
"""
