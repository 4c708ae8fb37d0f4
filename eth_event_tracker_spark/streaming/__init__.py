from .pipeline import (
    append_changelog,
    current_view,
    maintain_changelog,
    prune_changelog,
    start_finalized_ingest,
)
from .tracker import ChangelogEvent, FingerprintMismatchError, Tracker, resume_all

__all__ = [
    "Tracker",
    "ChangelogEvent",
    "FingerprintMismatchError",
    "resume_all",
    "append_changelog",
    "current_view",
    "maintain_changelog",
    "prune_changelog",
    "start_finalized_ingest",
]
