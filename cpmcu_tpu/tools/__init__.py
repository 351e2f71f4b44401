"""Developer tooling: parity harness, FR-Spec index generation, analyzers.

Counterpart of the reference's scripts/ + examples/ + benchmark/ tooling
(SURVEY.md §2.8).
"""
