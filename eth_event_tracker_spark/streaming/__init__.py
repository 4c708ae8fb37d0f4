from .tracker import ChangelogEvent, FingerprintMismatchError, Tracker

__all__ = ["Tracker", "ChangelogEvent", "FingerprintMismatchError"]
