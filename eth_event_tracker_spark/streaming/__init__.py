from .tracker import ChangelogEvent, FingerprintMismatchError, Tracker, resume_all

__all__ = ["Tracker", "ChangelogEvent", "FingerprintMismatchError", "resume_all"]
