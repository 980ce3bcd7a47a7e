"""REST service layer (reference api/ parity, stdlib HTTP + sqlite3)."""

from .server import make_server, start_background
from .store import ApiError, DetectorStore

__all__ = ["ApiError", "DetectorStore", "make_server", "start_background"]
