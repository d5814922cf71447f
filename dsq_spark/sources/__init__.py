"""Input-format registry (SURVEY.md §2.1 S1-S15).

Every reference format maps to a reader returning a DataFrame. Dispatch is
by extension (or an explicit mimetype override, mirroring `dsq -s <type>` —
reference main.go:29-46). Unknown extensions raise, matching the reference's
"unknown file type" error (main.go:44-46).
"""

from __future__ import annotations

from dsq_spark.sources.readers import (  # noqa: F401
    EXT_READERS,
    UnknownFileType,
    read_file,
)
