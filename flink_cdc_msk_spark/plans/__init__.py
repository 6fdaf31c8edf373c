from .registry import ORACLES, QUERIES, ensure_loaded, register

__all__ = ["QUERIES", "ORACLES", "register", "ensure_loaded"]
