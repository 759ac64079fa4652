"""Composed operators: text analysis, dedup, similarity, as-of join.

These are the driver-mandated training-data-pipeline operators
(SURVEY.md §2 B51-B54) plus the CDC time-travel join (B19), each built
as a composition of DataFrame primitives — custom physical operators are
never needed (SURVEY.md §4)."""
