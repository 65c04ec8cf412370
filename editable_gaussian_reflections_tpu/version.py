"""Package version (reference editable_gauss_refl/version.py analog)."""

__version__ = "0.3.0"
