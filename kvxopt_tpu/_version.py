"""Version module (reference src/python/_version.py)."""

__version__ = version = "0.1.0"
