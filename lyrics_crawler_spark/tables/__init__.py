from .store import SnapshotStore  # noqa: F401
