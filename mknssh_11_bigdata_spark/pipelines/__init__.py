"""End-to-end pipelines: the reference's IMDb feature/analysis/ML flow
recomposed from the operator library (SURVEY.md §7.4-7.6)."""

from .imdb_features import generate_dataset  # noqa: F401
