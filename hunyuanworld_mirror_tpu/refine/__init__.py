"""Camera refinement: pose-graph / Schur-complement bundle adjustment.

Greenfield TPU design (the reference has NO refinement stage — SURVEY.md §0:
"distributed Schur-complement bundle-adjustment refinement" is a BASELINE.json
north-star addition, not a port).
"""

from . import ba  # noqa: F401
