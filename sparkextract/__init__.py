"""sparkextract — a from-scratch PySpark-native re-expression of
opendatalab/PDF-Extract-Kit's extraction semantics over transcript tables.

See /root/repo/DESIGN.md for the exact deterministic contract and
SURVEY.md §2 for the operator inventory this package covers.
"""

__version__ = "0.1.0"
