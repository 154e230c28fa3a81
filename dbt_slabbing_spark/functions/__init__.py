"""User-defined-function surface: pandas UDFs, grouped-map UDAFs,
Python UDTFs, and (as a documented anti-pattern) row-at-a-time UDFs.
"""
