"""Input validation for sources (reference scanner guards,
scanner/__init__.py:60-87: refuse paths outside the sanctioned roots)."""

from codeclone_spark.sources.readers import (  # noqa: F401
    validate_clips_schema,
    validate_data_dir,
)
