"""Relational operators of the engine (SURVEY.md §2.3-§2.7).

Filters, joins, windows, aggregations and raster operators — each a
function DataFrame -> DataFrame built from Catalyst-optimizable
primitives.
"""
